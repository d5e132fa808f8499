"""Why is featureless fwd ~2x its parts? Compose/gather interaction test.

Parts at bench scale measure compose 1.3 + gather+select 6.5 + scatter
3.0 ~= 10.8 ms, yet _identity_planned measures ~21 ms. Suspects: XLA
scheduling/layout of the composed-table intermediate feeding the gather.

Variants:
  * whole      — _identity_planned as the model runs it
  * barrier    — optimization_barrier between compose and the gather
  * precomposed— compose outside the timed function (table as input)

Run:  python benchmarks/micro_compose_fusion.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.torch_baseline import build_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden = w["hidden"]
    src = np.asarray(w["src"], dtype=np.int32)
    dst = np.asarray(w["dst"], dtype=np.int32)
    rel = np.asarray(w["rel"], dtype=np.int32)
    norm = np.asarray(w["norm"], dtype=np.float32)
    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, hidden)])
    plan = plans[f"{rspmm.packing_factor(hidden)}:" +
                 f"{rspmm.packing_factor(hidden)}:id"]

    rng = np.random.default_rng(0)
    shape, k = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    from mrgcn_tpu.models.rgcn import _identity_planned
    report("whole_ms", per_iter_time(
        lambda pk, c: _identity_planned(pk, c, plan, hidden),
        packed, comp, iters=10))

    S, n_rows, lw = packed.shape

    def with_barrier(pk, c):
        flat = jnp.dot(c, pk.reshape(S, -1),
                       preferred_element_type=jnp.float32)
        flat = jax.lax.optimization_barrier(flat)
        return rl.featureless_aggregate(flat.reshape(-1, lw), plan,
                                        hidden)
    report("barrier_ms", per_iter_time(with_barrier, packed, comp,
                                       iters=10))

    flat0 = jnp.dot(comp, packed.reshape(S, -1),
                    preferred_element_type=jnp.float32).reshape(-1, lw)
    flat0 = jax.block_until_ready(flat0)
    report("precomposed_ms", per_iter_time(
        lambda t: rl.featureless_aggregate(t, plan, hidden),
        flat0, iters=10))

    # force the composed table through a Pallas passthrough: materialises
    # a fresh buffer in the canonical tiled layout before the gather
    from jax.experimental import pallas as pl

    def _copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    def canonical(x):
        rows = x.shape[0]
        blk = min(rows, 4096)   # (blk, 128) f32 x2 must fit VMEM
        while rows % blk:
            blk -= 1
        return pl.pallas_call(
            _copy_kernel,
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, x.shape[1]),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    def with_copy(pk, c):
        flat = jnp.dot(c, pk.reshape(S, -1),
                       preferred_element_type=jnp.float32)
        return rl.featureless_aggregate(
            canonical(flat.reshape(-1, lw)), plan, hidden)
    report("pallas_copy_ms", per_iter_time(with_copy, packed, comp,
                                           iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
