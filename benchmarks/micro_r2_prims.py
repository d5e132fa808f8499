"""Primitive costs inside the planned featureless/dense layers (TPU).

Isolates, at bench scale (E~700k, composed table (121*12544, 128) f32):

  * raw XLA row gather from the big composed table (f32 and bf16)
  * _select_sub one-hot sub-row select (E,128) -> (E,16)
  * _expand_sub one-hot sub-row placement (E,16) -> (E,128)
  * sorted_scatter on the fwd stream
  * dense: per-edge Wg gather + einsum vs slab-constant batched matmul

Run:  python benchmarks/micro_r2_prims.py
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
    from mrgcn_tpu.ops.pallas_gather import sorted_scatter

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]
    src = np.asarray(w["src"], dtype=np.int32)
    dst = np.asarray(w["dst"], dtype=np.int32)
    rel = np.asarray(w["rel"], dtype=np.int32)
    norm = np.asarray(w["norm"], dtype=np.float32)

    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, hidden), (hidden, C)])
    plan = plans[next(iter(plans))]
    for key, p in plans.items():
        if p.k_in == p.k_out:
            plan = p
            ident_key = key
    f = plan.fwd
    E_pad = f.num_padded_edges

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    results["E_pad"] = int(E_pad)
    results["n_in_rows"] = int(plan.n_in_rows)
    print(json.dumps({"E_pad": E_pad, "n_in_rows": plan.n_in_rows,
                      "k": plan.k_in}), flush=True)

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(
        (R * plan.n_in_rows, 128)).astype(np.float32))
    rows = f.rel * plan.n_in_rows + f.gather_row

    # 1. raw row gather, f32 / bf16
    report("gather_f32_ms", per_iter_time(lambda t: t[rows], table,
                                          iters=10))
    table_bf = table.astype(jnp.bfloat16)
    report("gather_bf16_ms", per_iter_time(lambda t: t[rows], table_bf,
                                           iters=10))

    # 2. select_sub
    G = jnp.asarray(rng.standard_normal((E_pad, 128)).astype(np.float32))
    report("select_sub_ms", per_iter_time(
        lambda g: rl._select_sub(g, f.in_mod, plan.k_in, hidden),
        G, iters=10))

    # 3. expand_sub
    v = jnp.asarray(rng.standard_normal((E_pad, hidden)).astype(np.float32))
    report("expand_sub_ms", per_iter_time(
        lambda x: rl._expand_sub(x, f.out_mod, plan.k_out),
        v, iters=10))

    # 4. sorted_scatter
    msgs = jnp.asarray(rng.standard_normal((E_pad, 128)).astype(np.float32))
    report("sorted_scatter_ms", per_iter_time(
        lambda m: sorted_scatter(m, f.scatter_local, f.scatter_blk,
                                 plan.n_out_rows, f.row_block,
                                 f.edge_block, False),
        msgs, iters=10))

    # 5. fused gather+select+scale (what the fwd actually runs before
    #    expand+scatter) — measures XLA's fusion of 1+2
    def gsel(t):
        g = t[rows]
        return rl._select_sub(g, f.in_mod, plan.k_in, hidden) \
            * f.norm[:, None]
    report("gather_select_ms", per_iter_time(gsel, table, iters=10))

    # --- dense layer alternatives ---------------------------------------
    dense_plan = next((p for p in plans.values() if p is not plan), plan)
    t_stream = dense_plan.bwd_table   # (rel, dst)-sorted, slab-constant rel
    Et = t_stream.num_padded_edges
    nslab = t_stream.num_slabs
    eb = t_stream.edge_block
    W = jnp.asarray(rng.standard_normal((R, hidden, C)).astype(np.float32))
    Hg = jnp.asarray(rng.standard_normal((Et, hidden)).astype(np.float32))

    # current: per-edge weight gather + einsum
    def per_edge(h, Wt):
        Wg = Wt.reshape(-1, hidden * C)[t_stream.rel].reshape(
            -1, hidden, C)
        return jnp.einsum("ei,eio->eo", h, Wg)
    report("dense_per_edge_ms", per_iter_time(per_edge, Hg, W, iters=10))

    # slab-constant: one weight row per slab, batched MXU matmul
    def per_slab(h, Wt):
        Ws = Wt.reshape(-1, hidden * C)[t_stream.slab_rel].reshape(
            nslab, hidden, C)
        return jax.lax.dot_general(
            h.reshape(nslab, eb, hidden), Ws,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(Et, C)
    report("dense_per_slab_ms", per_iter_time(per_slab, Hg, W, iters=10))

    # --- featureless-bwd-shaped fused place-scatter: the bwd_table stream
    # touches ~#relations x #blocks DISTINCT output blocks, so the kernel
    # flushes its VMEM accumulator nearly every slab — measures whether
    # the synchronous flush latency dominates the backward pass
    ident = plans.get(f"{plan.k_in}:{plan.k_out}:id", plan)
    bt = ident.bwd_table
    Vb = jnp.asarray(rng.standard_normal(
        (bt.num_padded_edges, 128 // ident.k_in)).astype(np.float32))
    results["bwd_table_nslab"] = int(bt.num_slabs)
    results["bwd_table_nblocks"] = int(np.unique(
        np.asarray(bt.scatter_blk)).size)
    report("bwd_table_place_scatter_ms", per_iter_time(
        lambda v: rl._place_scatter(
            v, bt.in_mod, bt, R * ident.n_in_rows, ident.k_in, hidden,
            128, False),
        Vb, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
