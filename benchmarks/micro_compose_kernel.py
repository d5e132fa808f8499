"""Stage-split follow-up to micro_compose_fusion: WHERE do the ~10 ms go?

micro_compose_fusion measured whole 23.4 / barrier 23.5 / precomposed 13.2
/ pallas-copy 25.9 ms — compose-in-program costs ~10 ms although the dot
alone had measured ~1.3 ms. Suspect: the composed-table intermediate's
layout vs the XLA row-gather consuming it. This micro splits the program
into stages and adds a Pallas compose kernel that writes the table in the
canonical tiled layout by construction.

Run:  python benchmarks/micro_compose_kernel.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.torch_baseline import build_workload  # noqa: E402


def compose_table(comp, pk_flat, cb: int = 8192):
    """(R, B) @ (B, cols) on the MXU via Pallas, output written directly
    in the canonical (R, cols) tiled layout (cols = n_rows * lanes, so the
    row-major reshape to (R * n_rows, lanes) is free)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    R, B = comp.shape
    cols = pk_flat.shape[1]
    while cols % cb:
        cb //= 2

    def kern(c_ref, p_ref, o_ref):
        o_ref[:] = jnp.dot(c_ref[:], p_ref[:],
                           preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(cols // cb,),
        in_specs=[pl.BlockSpec((R, B), lambda i: (0, 0)),
                  pl.BlockSpec((B, cb), lambda i: (0, i))],
        out_specs=pl.BlockSpec((R, cb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((R, cols), jnp.float32),
    )(comp, pk_flat)


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
    plans = rl.plans_for_layers(src, dst, rel, norm, n, [(None, hidden)])
    plan = plans[f"{rspmm.packing_factor(hidden)}:"
                 f"{rspmm.packing_factor(hidden)}:id"]
    k = plan.k_in
    f = plan.fwd

    rng = np.random.default_rng(0)
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    # pad/slice to the plan's row count, as _identity_planned does
    S, n_rows0, lw = packed.shape
    if n_rows0 > plan.n_in_rows:
        packed = packed[:, :plan.n_in_rows, :]
    elif n_rows0 < plan.n_in_rows:
        packed = jnp.pad(packed,
                         ((0, 0), (0, plan.n_in_rows - n_rows0), (0, 0)))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    rows = f.rel * plan.n_in_rows + f.gather_row

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    # --- baselines from micro_compose_fusion, re-measured -----------------
    from mrgcn_tpu.models.rgcn import _identity_planned
    report("whole_ms", per_iter_time(
        lambda pk, c: _identity_planned(pk, c, plan, hidden),
        packed, comp, iters=10))

    flat0 = jnp.dot(comp, packed.reshape(S, -1),
                    preferred_element_type=jnp.float32).reshape(-1, lw)
    flat0 = jax.block_until_ready(flat0)
    report("pre_whole_ms", per_iter_time(
        lambda t: rl.featureless_aggregate(t, plan, hidden), flat0,
        iters=10))

    # --- stage splits ------------------------------------------------------
    report("dot_alone_ms", per_iter_time(
        lambda pk, c: jnp.dot(c, pk.reshape(S, -1),
                              preferred_element_type=jnp.float32),
        packed, comp, iters=10))

    def dot_gather(pk, c):
        t = jnp.dot(c, pk.reshape(S, -1),
                    preferred_element_type=jnp.float32).reshape(-1, lw)
        return rl._gather_sub(t, rows, f.in_mod, k, hidden).sum()
    report("dot_gather_ms", per_iter_time(dot_gather, packed, comp,
                                          iters=10))

    report("pre_gather_ms", per_iter_time(
        lambda t: rl._gather_sub(t, rows, f.in_mod, k, hidden).sum(),
        flat0, iters=10))

    # --- pallas compose kernel ----------------------------------------------
    got = compose_table(comp, packed.reshape(S, -1))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(flat0.reshape(R, -1)),
                               rtol=1e-5, atol=1e-5)
    print("compose_table parity OK", flush=True)

    report("kernel_alone_ms", per_iter_time(
        lambda pk, c: compose_table(c, pk.reshape(S, -1)),
        packed, comp, iters=10))

    def kernel_whole(pk, c):
        t = compose_table(c, pk.reshape(S, -1)).reshape(-1, lw)
        return rl.featureless_aggregate(t, plan, hidden)
    report("kernel_whole_ms", per_iter_time(kernel_whole, packed, comp,
                                            iters=10))

    def kernel_gather(pk, c):
        t = compose_table(c, pk.reshape(S, -1)).reshape(-1, lw)
        return rl._gather_sub(t, rows, f.in_mod, k, hidden).sum()
    report("kernel_gather_ms", per_iter_time(kernel_gather, packed, comp,
                                             iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
