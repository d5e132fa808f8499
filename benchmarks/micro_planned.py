"""TPU measurements for the plan-driven gather-fused kernel at bench scale.

Uses benchmarks/timing.py (fetch-forced, overhead-subtracted) — the naive
block_until_ready protocol does not synchronize on the axon backend.

Run on hardware:  python benchmarks/micro_planned.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
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

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 4)
        print(json.dumps({name: results[name]}), flush=True)

    # --- current default paths -------------------------------------------
    report("cur_featureless_fwd_ms", per_iter_time(
        lambda p, c: rspmm.gather_aggregate_packed(
            p, srcj, dstj, relj, normj, n, hidden, k, comp=c),
        packed, comp, iters=10))

    from mrgcn_tpu.encodings.structure import group_by_relation
    grouping = group_by_relation(src, dst, rel, norm, n)
    g_src = jnp.asarray(grouping.src)
    g_dst = jnp.asarray(grouping.dst)
    g_norm = jnp.asarray(grouping.norm)
    g_rel = jnp.asarray(grouping.group_rel)

    report("cur_dense_fwd_ms", per_iter_time(
        lambda h, b, c: rspmm.transform_aggregate_grouped(
            h, g_src, g_dst, g_norm, g_rel, grouping.group_size, n,
            b, comp=c),
        H, basis, comp, iters=10))

    # --- planned paths per (row_block, edge_block) ------------------------
    for rb, eb in [(512, 256), (512, 512), (1024, 512)]:
        host = pg.build_gather_plan(src, dst, rel, norm, n, k,
                                    row_block=rb, edge_block=eb)
        plan = pg.DevicePlan.from_host(host)
        tag = f"rb{rb}_eb{eb}"
        results[f"epad_{tag}"] = host.num_padded_edges

        Htable = pg.pack_table(H, k, plan.padded_rows)
        report(f"rawgather_dense_ms_{tag}", per_iter_time(
            lambda t: pg.sorted_gather(t, plan.local, plan.block_tbl,
                                       rb, eb),
            Htable, iters=10))

        report(f"plan_featureless_fwd_ms_{tag}", per_iter_time(
            lambda p, c: rspmm.gather_aggregate_planned(
                plan, n, hidden, packed=p, comp=c),
            packed, comp, iters=10))
        report(f"plan_dense_fwd_ms_{tag}", per_iter_time(
            lambda h, b, c: rspmm.transform_aggregate_planned(
                h, plan, b, c, n),
            H, basis, comp, iters=10))

        a = np.asarray(rspmm.gather_aggregate_planned(
            plan, n, hidden, packed=packed, comp=comp))
        b_ = np.asarray(rspmm.gather_aggregate_packed(
            packed, srcj, dstj, relj, normj, n, hidden, k, comp=comp))
        results[f"maxdiff_featureless_{tag}"] = float(
            np.max(np.abs(a - b_)) / (np.max(np.abs(b_)) + 1e-9))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
