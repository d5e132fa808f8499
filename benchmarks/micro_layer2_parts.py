"""Decompose the bench-scale dense output layer (hidden=16 -> C=14).

micro_bwd_parts (round 3) measured layer2_fwd_bwd at 21.6 ms of the
58.7 ms train step — a third of the epoch for the SMALLEST layer. Both
widths pack k=8 logical rows per 128-lane line, so every stream pays a
one-hot sub-row select (fwd gather side) or one-hot sub-row expand
(scatter side) over E~700k edges. This isolates each piece:

  * dense_fwd / dense_fwd_bwd — the shipped op (path chosen by rel_const)
  * gather_sub_fwd            — packed H gather + one-hot select alone
  * slab_mm / edge_einsum     — the weight application alone
  * expand_scatter            — one-hot expand + sorted block scatter
  * dW_side                   — the bwd_table stream's two gathers +
                                per-slab outer products + segment_sum
  * grouped_fwd_bwd           — the relation-grouped batched-matmul path
                                on the same workload (the non-plan
                                fallback, for comparison)

Run:  python benchmarks/micro_layer2_parts.py
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
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = build_workload()
    n, R = w["n"], w["R"]
    hidden, C = w["hidden"], w["num_classes"]

    src = np.asarray(w["src"], dtype=np.int32)
    dst = np.asarray(w["dst"], dtype=np.int32)
    rel = np.asarray(w["rel"], dtype=np.int32)
    norm = np.asarray(w["norm"], dtype=np.float32)
    plans = rl.plans_for_layers(src, dst, rel, norm, n, [(hidden, C)])
    k_in = rspmm.packing_factor(hidden)
    k_out = rspmm.packing_factor(C)
    plan = plans[f"{k_in}:{k_out}"]
    f = plan.fwd
    print(json.dumps({"rel_const_fwd": bool(f.rel_const),
                      "rel_const_bwd_h": bool(plan.bwd_h.rel_const),
                      "E_pad_fwd": f.num_padded_edges,
                      "E_raw": int(len(src))}), flush=True)

    rng = np.random.default_rng(3)
    H = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((R, hidden, C)) * 0.1, jnp.float32)

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    report("dense_fwd_ms", per_iter_time(
        lambda h: jnp.sum(rl.dense_aggregate(h, W, plan, hidden, C)),
        H, iters=10))
    report("dense_fwd_bwd_ms", per_iter_time(
        lambda h: jax.value_and_grad(
            lambda q: jnp.sum(rl.dense_aggregate(q, W, plan, hidden,
                                                 C)))(h), H, iters=10))
    report("dense_fwd_bwd_dW_ms", per_iter_time(
        lambda v: jax.value_and_grad(
            lambda q: jnp.sum(rl.dense_aggregate(H, q, plan, hidden,
                                                 C)))(v), W, iters=10))

    # ---- forward pieces ---------------------------------------------------
    def gather_sub_fwd(h):
        Hp = rl.pack_rows(h, plan.k_in, plan.n_in_rows)
        return jnp.sum(rl._gather_sub(Hp, f.gather_row, f.in_mod,
                                      plan.k_in, hidden))

    report("gather_sub_fwd_ms", per_iter_time(gather_sub_fwd, H, iters=10))

    Hp = jax.jit(lambda h: rl.pack_rows(h, plan.k_in, plan.n_in_rows))(H)
    Hg = jax.jit(lambda p: rl._gather_sub(p, f.gather_row, f.in_mod,
                                          plan.k_in, hidden))(Hp)

    if f.rel_const:
        report("slab_mm_ms", per_iter_time(
            lambda x: jnp.sum(rl._slab_matmul(x, W, f, hidden, C)),
            Hg, iters=10))
    else:
        def edge_einsum(x):
            Wg = W.reshape(-1, hidden * C)[f.rel].reshape(-1, hidden, C)
            return jnp.sum(jnp.einsum(
                "ei,eio->eo", x, Wg,
                precision=jax.lax.Precision.HIGHEST))
        report("edge_einsum_ms", per_iter_time(edge_einsum, Hg, iters=10))

    V = jnp.asarray(rng.standard_normal((f.num_padded_edges, C)),
                    jnp.float32)
    report("expand_scatter_ms", per_iter_time(
        lambda v: jnp.sum(rl._place_scatter(
            v, f.out_mod, f, plan.n_out_rows, plan.k_out, C,
            rl.line_width(plan.k_out, C), False)), V, iters=10))

    # ---- d_W side on the bwd_table stream ----------------------------------
    t = plan.bwd_table
    d_out = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)

    def dW_side(d_o):
        d_out_p = rl.pack_rows(d_o, plan.k_out, plan.n_out_rows)
        Hp_l = rl.pack_rows(H, plan.k_in, plan.n_in_rows)
        Hg_t = rl._gather_sub(Hp_l, t.gather_row, t.in_mod, plan.k_in,
                              hidden)
        d_v_t = rl._gather_sub(d_out_p, t.src_row, t.out_mod, plan.k_out,
                               C) * t.norm[:, None]
        nslab, eb = t.num_slabs, t.edge_block
        per_slab = jax.lax.dot_general(
            Hg_t.reshape(nslab, eb, hidden), d_v_t.reshape(nslab, eb, C),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(jax.ops.segment_sum(
            per_slab.reshape(nslab, hidden * C), t.slab_rel,
            num_segments=R))

    report("dW_side_ms", per_iter_time(dW_side, d_out, iters=10))

    # ---- relation-grouped fallback on the same workload ---------------------
    grouping = group_by_relation(src, dst, rel, norm, n)

    def grouped_loss(h):
        return jnp.sum(rspmm.transform_aggregate_grouped(
            h, jnp.asarray(grouping.src), jnp.asarray(grouping.dst),
            jnp.asarray(grouping.norm), jnp.asarray(grouping.group_rel),
            grouping.group_size, n, W))

    report("grouped_fwd_ms", per_iter_time(grouped_loss, H, iters=10))
    report("grouped_fwd_bwd_ms", per_iter_time(
        lambda h: jax.value_and_grad(grouped_loss)(h), H, iters=10))

    print("FINAL_L2 " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
