"""On-device numeric check of the sorted-stream kernels vs XLA references.

Interpret-mode tests cannot catch TPU-lowering precision behavior: Mosaic
compiles `dot_general` at DEFAULT precision to one-pass bf16 on the MXU,
which silently truncated scatter messages until the kernels pinned
`Precision.HIGHEST` (found 2026-08-17: max abs err 0.027 on a N(0,1)
workload). Run this after ANY kernel change, on real hardware:

    python benchmarks/device_check.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops.pallas_gather import _xla_scatter, sorted_scatter

    rng = np.random.default_rng(0)
    # flush-heavy relation-major stream (the backward's shape)
    n, E, R, k = 20_000, 150_000, 37, 8
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                 kind="identity")

    failures = 0
    for name, stream, rows in (
            ("bwd_table", plans.bwd_table, R * plans.n_in_rows),
            ("fwd", plans.fwd, plans.n_out_rows)):
        msgs = jnp.asarray(rng.standard_normal(
            (stream.num_padded_edges, 128)).astype(np.float32))
        got = np.asarray(jax.jit(
            lambda m, s=stream, r=rows: sorted_scatter(
                m, s.scatter_local, s.scatter_blk, r, s.row_block,
                s.edge_block, False))(msgs))
        want = np.asarray(_xla_scatter(
            msgs, stream.scatter_local, stream.scatter_blk, rows,
            row_block=stream.row_block,
            edge_block=stream.edge_block))[:rows]
        diff = float(np.max(np.abs(got - want)))
        ok = diff < 1e-4
        failures += not ok
        print(f"{name}: max abs diff {diff:.3e} "
              f"({'OK' if ok else 'FAIL'})")

    table = rng.standard_normal(
        (R * plans.n_in_rows, 128)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda t: rl.featureless_aggregate(t, plans, 16))(
            jnp.asarray(table)))
    want = rl.reference_featureless(table, plans, 16, src, dst, rel, norm)
    rel_diff = float(np.max(np.abs(got - want))
                     / (np.abs(want).max() + 1e-9))
    ok = rel_diff < 1e-5
    failures += not ok
    print(f"featureless layer: max rel diff {rel_diff:.3e} "
          f"({'OK' if ok else 'FAIL'})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
