"""Compose-dot precision: DEFAULT lowers to one-pass bf16 WITH a strided
layout-permuting copy of the 262 MB table (HLO: copy f32{3,2,1,0} ->
bf16{3,1,2,0:(2,1)}) — both a precision hazard and the +9-10 ms
featureless-forward gap. Measure HIGHEST / explicit-f32 variants.

Run:  python benchmarks/micro_compose_prec.py
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
    plans = rl.plans_for_layers(
        np.asarray(w["src"], np.int32), np.asarray(w["dst"], np.int32),
        np.asarray(w["rel"], np.int32), np.asarray(w["norm"], np.float32),
        n, [(None, hidden)])
    plan = plans[f"{rspmm.packing_factor(hidden)}:"
                 f"{rspmm.packing_factor(hidden)}:id"]

    rng = np.random.default_rng(0)
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(
        rng.standard_normal((shape[0], plan.n_in_rows, shape[2]))
        .astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    S, _, lw = packed.shape
    HI = jax.lax.Precision.HIGHEST

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    report("dot_default_ms", per_iter_time(
        lambda pk, c: jnp.dot(c, pk.reshape(S, -1),
                              preferred_element_type=jnp.float32),
        packed, comp, iters=10))
    report("dot_highest_ms", per_iter_time(
        lambda pk, c: jnp.dot(c, pk.reshape(S, -1), precision=HI,
                              preferred_element_type=jnp.float32),
        packed, comp, iters=10))

    def whole(pk, c, prec):
        flat = jnp.dot(c, pk.reshape(S, -1), precision=prec,
                       preferred_element_type=jnp.float32)
        return rl.featureless_aggregate(flat.reshape(-1, lw), plan, hidden)

    report("whole_default_ms", per_iter_time(
        lambda pk, c: whole(pk, c, None), packed, comp, iters=10))
    report("whole_highest_ms", per_iter_time(
        lambda pk, c: whole(pk, c, HI), packed, comp, iters=10))

    # numerics: how wrong is the default-bf16 compose?
    f_hi = np.asarray(jax.jit(lambda pk, c: whole(pk, c, HI))(packed, comp))
    f_def = np.asarray(jax.jit(lambda pk, c: whole(pk, c, None))(packed,
                                                                 comp))
    err = np.max(np.abs(f_hi - f_def)) / max(1e-9, np.max(np.abs(f_hi)))
    results["default_vs_highest_relerr"] = float(err)
    print(json.dumps({"default_vs_highest_relerr": float(err)}), flush=True)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
