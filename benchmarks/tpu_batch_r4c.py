"""One-shot TPU experiment batch (round 4, third batch): LP epoch with the
hybrid layer-2 + the score/BCE chain decomposition.

tpu_batch_r4a found: dense_basis stream FORWARD beats the grouped matmul
(11.4 vs 15.7 ms) but its wide backward loses (byte-bound); the hybrid
(ops/relational.dense_basis_hybrid) keeps the stream forward and the
grouped backward. This batch:

  1. hybrid layer-2 A/B vs grouped (isolated fwd / fwd+bwd).
  2. LP epoch: grouped default vs hybrid (the default decision).
  3. score/BCE chain decomposition at FB15k-237 scale — the ~19 ms
     in-step residual (tpu_batch_r3h): score fwd, d_emb-only,
     d_rels-only, full BCE chain; plus a subject-sorted variant
     (indices_are_sorted segment-sum) to see if the d_emb scatter-adds
     are the wall and whether sortedness helps.

NOTE (r4a lesson): run this batch from a FRESH process after any source
edit — a mid-run edit of lazily-imported modules mixes module versions.

Run:  python benchmarks/tpu_batch_r4c.py
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


def hybrid_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    rng = np.random.default_rng(3)

    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden), (hidden, hidden)],
        identity_basis=rl.basis_stream_wanted(R, n, hidden, B))
    g = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
    garrs = (jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.norm),
             jnp.asarray(g.group_rel))
    gs, plan_d = g.group_size, plans["1:1"]

    H = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, hidden, hidden)).astype(np.float32) * 0.05)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    hbc = (H, basis, comp)

    def grouped_loss(hbc, ga):
        h, ba, c = hbc
        out = rspmm.transform_aggregate_grouped(
            h, ga[0], ga[1], ga[2], ga[3], gs, n, ba, comp=c)
        return jnp.sum(out ** 2)

    def hybrid_loss(hbc, ga, pl):
        h, ba, c = hbc
        out = rl.dense_basis_hybrid(h, ba, c, pl, ga[0], ga[1], ga[2],
                                    ga[3], gs, hidden, hidden)
        return jnp.sum(out ** 2)

    out = {}
    out["grouped_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, ga: jax.value_and_grad(grouped_loss)(x, ga),
        hbc, garrs, iters=10) * 1e3, 3)
    out["hybrid_fwd_ms"] = round(per_iter_time(
        hybrid_loss, hbc, garrs, plan_d, iters=10) * 1e3, 3)
    out["hybrid_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, ga, pl: jax.value_and_grad(hybrid_loss)(x, ga, pl),
        hbc, garrs, plan_d, iters=10) * 1e3, 3)
    a = jax.jit(grouped_loss)(hbc, garrs)
    b = jax.jit(hybrid_loss)(hbc, garrs, plan_d)
    out["rel_diff"] = float(abs(a - b) / abs(a))
    report("FINAL_HYBRID_AB", out)


def lp_epoch_modes():
    from benchmarks.bench_suite import bench_lp
    for mode, tag in (("0", "lp_epoch_grouped_s"),
                      ("hybrid", "lp_epoch_hybrid_s")):
        os.environ["MRGCN_DENSE_BASIS"] = mode
        try:
            epoch, _ = bench_lp()
            report(tag, round(epoch, 6))
        except Exception as exc:
            report(tag, f"{type(exc).__name__}: {exc}")
    os.environ.pop("MRGCN_DENSE_BASIS", None)


def score_parts():
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import distmult

    n, R, hidden = 14_541, 475, 200
    F = 272_115 + 272_115 // 5          # positives + 20% corrupted
    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    rels = jnp.asarray(rng.standard_normal((R, hidden)).astype(np.float32))
    facts = np.stack([rng.integers(0, n, F), rng.integers(0, R, F),
                      rng.integers(0, n, F)], axis=1).astype(np.int32)
    labels = jnp.asarray((rng.random(F) < 0.8).astype(np.float32))
    fj = jnp.asarray(facts)

    def bce(e, r, fx):
        s = distmult.score(fx[:, 0], fx[:, 1], fx[:, 2], e, r)
        return optax.sigmoid_binary_cross_entropy(s, labels).mean()

    out = {}
    out["score_fwd_ms"] = round(per_iter_time(
        bce, emb, rels, fj, iters=10) * 1e3, 3)
    out["score_demb_ms"] = round(per_iter_time(
        lambda e, r, fx: jax.value_and_grad(bce, argnums=0)(e, r, fx),
        emb, rels, fj, iters=10) * 1e3, 3)
    out["score_drels_ms"] = round(per_iter_time(
        lambda e, r, fx: jax.value_and_grad(bce, argnums=1)(e, r, fx),
        emb, rels, fj, iters=10) * 1e3, 3)
    out["score_dboth_ms"] = round(per_iter_time(
        lambda e, r, fx: jax.value_and_grad(bce, argnums=(0, 1))(e, r, fx),
        emb, rels, fj, iters=10) * 1e3, 3)

    # subject-sorted facts + indices_are_sorted segment-sums for d_emb:
    # does XLA's scatter-add exploit sortedness?
    order = np.argsort(facts[:, 0], kind="stable")
    fs = jnp.asarray(facts[order])
    labels_s = labels[jnp.asarray(order)]

    def bce_sorted(e, r, fx):
        s = distmult.score(fx[:, 0], fx[:, 1], fx[:, 2], e, r)
        return optax.sigmoid_binary_cross_entropy(s, labels_s).mean()

    out["score_sorted_dboth_ms"] = round(per_iter_time(
        lambda e, r, fx: jax.value_and_grad(bce_sorted, argnums=(0, 1)
                                            )(e, r, fx),
        emb, rels, fs, iters=10) * 1e3, 3)

    # hand-rolled backward with explicit segment_sum(indices_are_sorted)
    # on the s-sorted order — the ceiling for a sorted-stream rewrite
    def bce_manual(e, r, fx):
        s_rows, p_rows, o_rows = fx[:, 0], fx[:, 1], fx[:, 2]
        es, rp, eo = e[s_rows], r[p_rows], e[o_rows]
        sc = jnp.sum(es * rp * eo, axis=-1)
        d = (jax.nn.sigmoid(sc) - labels_s) / F          # BCE cotangent
        d_es = d[:, None] * rp * eo
        d_eo = d[:, None] * es * rp
        d_rp = d[:, None] * es * eo
        d_e = jax.ops.segment_sum(d_es, s_rows, num_segments=n,
                                  indices_are_sorted=True)
        d_e = d_e + jax.ops.segment_sum(d_eo, o_rows, num_segments=n)
        d_r = jax.ops.segment_sum(d_rp, p_rows, num_segments=R)
        return jnp.sum(sc) * 0.0 + jnp.sum(d_e ** 2) + jnp.sum(d_r ** 2)

    out["score_manual_sorted_ms"] = round(per_iter_time(
        bce_manual, emb, rels, fs, iters=10) * 1e3, 3)
    report("FINAL_SCORE_PARTS", out)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("hybrid_ab", hybrid_ab)
    guarded("lp_epoch_modes", lp_epoch_modes)
    guarded("score_parts", score_parts)
    print("FINAL_R4C", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
