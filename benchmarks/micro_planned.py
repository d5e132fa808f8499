"""TPU sweep for the plan-driven gather-fused kernel at bench scale.

Per (row_block, edge_block): raw sorted_gather kernel time, a floor kernel
(same grid/IO, no matmul) to isolate pipeline overhead, and the full planned
featureless / dense layer forwards vs the current default paths.

Run on hardware:  python benchmarks/micro_planned.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=7):
    import jax
    o = fn(*args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(steps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def floor_kernel_time(table, local, tbl_idx, row_block, edge_block):
    """Same grid and blocks as the gather kernel, copy instead of matmul."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks, eb = local.shape
    L = table.shape[1]

    def kernel(tbl_ref, local_ref, table_ref, out_ref):
        out_ref[:] = jnp.broadcast_to(
            table_ref[0:1, :] + local_ref[0, 0, 0].astype(jnp.float32),
            out_ref.shape)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8, eb), lambda i, tb: (i, 0, 0)),
            pl.BlockSpec((row_block, L), lambda i, tb: (tb[i], 0)),
        ],
        out_specs=pl.BlockSpec((eb, L), lambda i, tb: (i, 0)),
    )
    fn = jax.jit(lambda t, lo, ti: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * eb, L), jnp.float32),
    )(ti, jnp.broadcast_to(lo[:, None, :], (num_blocks, 8, eb)), t))
    return timeit(fn, table, local, tbl_idx)


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.ops import pallas_gather as pg
    from mrgcn_tpu.ops import rspmm

    rng = np.random.default_rng(0)
    n, E, R, B = 100_000, 700_000, 121, 40
    hidden, C = 16, 14
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)

    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    relj, normj = jnp.asarray(rel), jnp.asarray(norm)

    shape, k = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    basis = jnp.asarray(
        rng.standard_normal((B, hidden, C)).astype(np.float32))

    results = {}

    @jax.jit
    def cur_featureless(packed, comp):
        return rspmm.gather_aggregate_packed(packed, srcj, dstj, relj,
                                             normj, n, hidden, k, comp=comp)

    results["cur_featureless_fwd"] = timeit(cur_featureless, packed, comp)

    from mrgcn_tpu.encodings.structure import group_by_relation
    grouping = group_by_relation(src, dst, rel, norm, n)
    g_src = jnp.asarray(grouping.src)
    g_dst = jnp.asarray(grouping.dst)
    g_norm = jnp.asarray(grouping.norm)
    g_rel = jnp.asarray(grouping.group_rel)

    @jax.jit
    def cur_dense(H, basis, comp):
        return rspmm.transform_aggregate_grouped(
            H, g_src, g_dst, g_norm, g_rel, grouping.group_size, n,
            basis, comp=comp)

    results["cur_dense_fwd"] = timeit(cur_dense, H, basis, comp)
    print(json.dumps(results), flush=True)

    for rb, eb in [(512, 256), (512, 512), (1024, 512), (512, 1024)]:
        host = pg.build_gather_plan(src, dst, rel, norm, n, k,
                                    row_block=rb, edge_block=eb)
        plan = pg.DevicePlan.from_host(host)
        tag = f"rb{rb}_eb{eb}"
        results[f"epad_{tag}"] = host.num_padded_edges

        # dense-table (per-node) raw kernel + floor: table resident-ish
        Htable = pg.pack_table(H, k, plan.padded_rows)
        raw = jax.jit(partial(pg.sorted_gather, row_block=rb,
                              edge_block=eb))
        results[f"rawgather_dense_{tag}"] = timeit(
            raw, Htable, plan.local, plan.block_tbl)
        results[f"floor_dense_{tag}"] = floor_kernel_time(
            Htable, plan.local, plan.block_tbl, rb, eb)

        @jax.jit
        def plan_featureless(packed, comp, plan=plan):
            return rspmm.gather_aggregate_planned(plan, n, hidden,
                                                  packed=packed, comp=comp)

        @jax.jit
        def plan_dense(H, basis, comp, plan=plan):
            return rspmm.transform_aggregate_planned(H, plan, basis,
                                                     comp, n)

        results[f"plan_featureless_fwd_{tag}"] = timeit(
            plan_featureless, packed, comp)
        results[f"plan_dense_fwd_{tag}"] = timeit(plan_dense, H, basis,
                                                  comp)
        a = np.asarray(plan_featureless(packed, comp))
        b = np.asarray(cur_featureless(packed, comp))
        results[f"maxdiff_featureless_{tag}"] = float(
            np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))

        print(json.dumps({kk: (round(v, 6) if isinstance(v, float) else v)
                          for kk, v in results.items()}), flush=True)

    print("FINAL " + json.dumps(
        {kk: (round(v, 6) if isinstance(v, float) else v)
         for kk, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
