"""One-shot TPU experiment batch (round 4, fourth batch).

tpu_batch_r4c found the hand-written grouped backward of
dense_basis_hybrid costs 78 ms where autodiff-of-grouped costs ~18
(FINAL_HYBRID_AB: 90.0 vs 33.6 fwd+bwd). This batch:

  1. times each piece of _dense_basis_hybrid_bwd standalone to find the
     pathology (einsum-to-tiny-output lowering is the prime suspect —
     the compose_packed story all over again), plus dot_general variants
     of the suspect pieces;
  2. measures the ceiling for a sorted-stream score backward: the d_emb
     scatter-add of the static positive facts through the Pallas
     sorted_scatter vs jax.ops.segment_sum (FINAL_SCORE_PARTS put the
     d(emb,rels) chain at ~15 ms of the 95 ms LP epoch).

Run:  python benchmarks/tpu_batch_r4d.py  (fresh process only)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def report(tag, payload):
    RESULTS[tag] = payload
    print(tag, json.dumps(payload), flush=True)


def hybrid_bwd_parts():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    in_dim = out_dim = hidden
    hp = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(3)

    g = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
    gs = g.group_size
    G = g.group_rel.shape[0]
    grp_src = jnp.asarray(g.src)
    grp_dst = jnp.asarray(g.dst)
    grp_norm = jnp.asarray(g.norm)
    group_rel = jnp.asarray(g.group_rel)

    H = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, hidden, hidden)).astype(np.float32) * 0.05)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    d_out = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    W = jnp.einsum("rb,bio->rio", comp, basis)
    d_W = jnp.asarray(rng.standard_normal(W.shape).astype(np.float32))
    d_m_fix = jnp.asarray(rng.standard_normal(
        (G * gs, out_dim)).astype(np.float32))

    out = {}

    def t(name, fn, *args):
        out[name] = round(per_iter_time(fn, *args, iters=10) * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)

    # p1: cotangent gather + norm scale
    t("p1_dm_gather_ms",
      lambda do: jnp.sum(do[grp_src] * grp_norm[:, None]), d_out)

    # p2: compose W
    t("p2_compose_ms",
      lambda ba, c: jnp.sum(jnp.einsum("rb,bio->rio", c, ba,
                                       precision=hp)), basis, comp)

    # p3: d_H chain on a FIXED d_m (isolates the batched matmul + segsum)
    def p3(dm, Wf):
        dmg = dm.reshape(G, gs, out_dim)
        Wg = Wf[group_rel]
        d_Hg = jax.lax.dot_general(dmg, Wg, (((2,), (2,)), ((0,), (0,))),
                                   precision=hp,
                                   preferred_element_type=jnp.float32)
        return jnp.sum(jax.ops.segment_sum(
            d_Hg.reshape(G * gs, in_dim), grp_dst, num_segments=n) ** 2)

    t("p3_dH_chain_ms", p3, d_m_fix, W)

    # p4: d_W chain on a fixed d_m
    def p4(dm, Hf):
        dmg = dm.reshape(G, gs, out_dim)
        Hg = Hf[grp_dst].reshape(G, gs, in_dim)
        d_Wg = jax.lax.dot_general(Hg, dmg, (((1,), (1,)), ((0,), (0,))),
                                   precision=hp,
                                   preferred_element_type=jnp.float32)
        return jnp.sum(jax.ops.segment_sum(
            d_Wg.reshape(G, in_dim * out_dim), group_rel,
            num_segments=R) ** 2)

    t("p4_dW_chain_ms", p4, d_m_fix, H)

    # p5a: d_comp/d_basis via einsum (the hybrid's current code)
    def p5a(dW, ba, c):
        d_comp = jnp.einsum("rio,bio->rb", dW, ba, precision=hp)
        d_basis = jnp.einsum("rb,rio->bio", c, dW, precision=hp)
        return jnp.sum(d_comp ** 2) + jnp.sum(d_basis ** 2)

    t("p5a_einsum_ms", p5a, d_W, basis, comp)

    # p5b: same via explicit 2-D dot_generals (compose_packed's fix)
    def p5b(dW, ba, c):
        dw2 = dW.reshape(R, in_dim * out_dim)
        ba2 = ba.reshape(B, in_dim * out_dim)
        d_comp = jax.lax.dot_general(dw2, ba2, (((1,), (1,)), ((), ())),
                                     precision=hp)
        d_basis = jax.lax.dot_general(c, dw2, (((0,), (0,)), ((), ())),
                                      precision=hp)
        return jnp.sum(d_comp ** 2) + jnp.sum(d_basis ** 2)

    t("p5b_dotgen_ms", p5b, d_W, basis, comp)

    # p6: the FULL hand-written bwd as one jit (what the hybrid pays)
    def p6(do, Hf, ba, c):
        Wf = jnp.einsum("rb,bio->rio", c, ba, precision=hp)
        dm = do[grp_src] * grp_norm[:, None]
        dmg = dm.reshape(G, gs, out_dim)
        Wg = Wf[group_rel]
        d_Hg = jax.lax.dot_general(dmg, Wg, (((2,), (2,)), ((0,), (0,))),
                                   precision=hp,
                                   preferred_element_type=jnp.float32)
        d_H = jax.ops.segment_sum(d_Hg.reshape(G * gs, in_dim), grp_dst,
                                  num_segments=n)
        Hg = Hf[grp_dst].reshape(G, gs, in_dim)
        d_Wg = jax.lax.dot_general(Hg, dmg, (((1,), (1,)), ((0,), (0,))),
                                   precision=hp,
                                   preferred_element_type=jnp.float32)
        dW = jax.ops.segment_sum(d_Wg.reshape(G, in_dim * out_dim),
                                 group_rel, num_segments=R)
        dW = dW.reshape(Wf.shape)
        dw2 = dW.reshape(R, in_dim * out_dim)
        ba2 = ba.reshape(B, in_dim * out_dim)
        d_comp = jax.lax.dot_general(dw2, ba2, (((1,), (1,)), ((), ())),
                                     precision=hp)
        d_basis = jax.lax.dot_general(c, dw2, (((0,), (0,)), ((), ())),
                                      precision=hp)
        return (jnp.sum(d_H ** 2) + jnp.sum(d_comp ** 2)
                + jnp.sum(d_basis ** 2))

    t("p6_full_bwd_ms", p6, d_out, H, basis, comp)

    # p7: autodiff-of-grouped bwd-equivalent for reference
    from mrgcn_tpu.ops import rspmm

    def gloss(hbc):
        h, ba, c = hbc
        return jnp.sum(rspmm.transform_aggregate_grouped(
            h, grp_src, grp_dst, grp_norm, group_rel, gs, n, ba,
            comp=c) ** 2)

    t("p7_grouped_fwd_bwd_ms",
      lambda x: jax.value_and_grad(gloss)(x), (H, basis, comp))

    report("FINAL_HYBRID_PARTS", out)


def score_stream_ceiling():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops.pallas_gather import (EDGE_BLOCK, ROW_BLOCK,
                                             sorted_scatter)

    n, hidden = 14_541, 200
    F = 272_115
    L = 256
    rng = np.random.default_rng(7)
    s = np.sort(rng.integers(0, n, F)).astype(np.int64)

    order, slots, F_pad, slab_blk = rl._segment_layout(
        s, np.zeros(F, np.int64), s // ROW_BLOCK, EDGE_BLOCK)
    nslab = F_pad // EDGE_BLOCK
    local = np.full(F_pad, ROW_BLOCK, np.int32)
    local[slots] = (s % ROW_BLOCK)[order]
    local = jnp.asarray(local.reshape(nslab, EDGE_BLOCK))
    blk = jnp.asarray(slab_blk.astype(np.int32))
    out_rows = -(-n // ROW_BLOCK) * ROW_BLOCK

    msgs = jnp.asarray(rng.standard_normal((F_pad, L)).astype(np.float32))
    sj = jnp.asarray(s.astype(np.int32))
    msgs_unpadded = msgs[:F]

    out = {}
    out["xla_segsum_ms"] = round(per_iter_time(
        lambda m: jnp.sum(jax.ops.segment_sum(
            m, sj, num_segments=n) ** 2), msgs_unpadded, iters=10) * 1e3, 3)
    out["xla_segsum_sorted_ms"] = round(per_iter_time(
        lambda m: jnp.sum(jax.ops.segment_sum(
            m, sj, num_segments=n, indices_are_sorted=True) ** 2),
        msgs_unpadded, iters=10) * 1e3, 3)
    out["pallas_sorted_scatter_ms"] = round(per_iter_time(
        lambda m: jnp.sum(sorted_scatter(
            m, local, blk, out_rows, ROW_BLOCK, EDGE_BLOCK) ** 2),
        msgs, iters=10) * 1e3, 3)
    report("FINAL_SCORE_CEILING", out)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("hybrid_bwd_parts", hybrid_bwd_parts)
    guarded("score_stream_ceiling", score_stream_ceiling)
    print("FINAL_R4D", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
