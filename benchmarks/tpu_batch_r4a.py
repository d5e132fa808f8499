"""One-shot TPU experiment batch (round 4, first batch).

The axon tunnel can be down for hours — batch every open LP measurement
into one process (CLAUDE.md protocol; template: tpu_batch_r3b.py):

  1. LP layer-2 A/B: relation-grouped batched matmul (round-3 default,
     dW backward materialises a (G, in, out) buffer — 25 ms-class,
     docs/session_r3.md FINAL_GROUPED_DW) vs the new
     ops/relational.dense_basis (stream engine over the tiny (n, B*out)
     per-basis projections; VERDICT r3 item 1).
  2. LP layer-1 A/B: featureless_basis (B separate gathers/scatters per
     pass) vs featureless_basis_wide (ONE combined (rows, B*L) line per
     edge — halves the per-edge row count of the transaction-bound
     passes).
  3. Full LP epochs under the 4 flag combinations
     (MRGCN_DENSE_BASIS x MRGCN_WIDE_BASIS) — the step that decides the
     round-4 defaults.
  4. Headline + multimodal epochs re-confirmed on the default path
     (regression guard for the round snapshot).

Run:  python benchmarks/tpu_batch_r4a.py
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


def _flag(name, value):
    if value is None:
        os.environ.pop(name, None)
    else:
        os.environ[name] = value


def lp_layer_ab():
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
    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
    grp = dict(grp_src=jnp.asarray(grouping.src),
               grp_dst=jnp.asarray(grouping.dst),
               grp_norm=jnp.asarray(grouping.norm),
               group_rel=jnp.asarray(grouping.group_rel),
               group_size=grouping.group_size)

    H = jnp.asarray(rng.standard_normal((n, hidden)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, hidden, hidden)).astype(np.float32) * 0.05)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    # ---- layer 2: grouped vs dense_basis (big arrays passed as TRACED
    # args — closed-over constants inflate the axon remote-compile body)
    gs, plan_d = grouping.group_size, plans["1:1"]
    garrs = (grp["grp_src"], grp["grp_dst"], grp["grp_norm"],
             grp["group_rel"])

    def grouped_loss(hbc, ga):
        h, ba, c = hbc
        out = rspmm.transform_aggregate_grouped(
            h, ga[0], ga[1], ga[2], ga[3], gs, n, ba, comp=c)
        return jnp.sum(out ** 2)

    def stream_loss(hbc, pl):
        h, ba, c = hbc
        out = rl.dense_basis(h, ba, c, pl, hidden, hidden)
        return jnp.sum(out ** 2)

    hbc = (H, basis, comp)
    out = {}
    out["grouped_fwd_ms"] = round(per_iter_time(
        grouped_loss, hbc, garrs, iters=10) * 1e3, 3)
    out["grouped_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, ga: jax.value_and_grad(grouped_loss)(x, ga),
        hbc, garrs, iters=10) * 1e3, 3)
    out["dense_basis_fwd_ms"] = round(per_iter_time(
        stream_loss, hbc, plan_d, iters=10) * 1e3, 3)
    out["dense_basis_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, pl: jax.value_and_grad(stream_loss)(x, pl),
        hbc, plan_d, iters=10) * 1e3, 3)
    # numeric cross-check at bench scale
    a = jax.jit(grouped_loss)(hbc, garrs)
    b = jax.jit(stream_loss)(hbc, plan_d)
    out["l2_rel_diff"] = float(abs(a - b) / abs(a))
    report("FINAL_L2_AB", out)

    # ---- layer 1: narrow vs wide basis streams
    plan_i = plans["1:1:idb"]
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    packed = packed[:, :plan_i.n_in_rows, :]

    def narrow_loss(cp, pl):
        return jnp.sum(rl.featureless_basis(cp[0], cp[1], pl, hidden) ** 2)

    def wide_loss(cp, pl):
        return jnp.sum(rl.featureless_basis_wide(cp[0], cp[1], pl, hidden)
                       ** 2)

    cp = (comp, packed)
    out = {}
    out["narrow_fwd_ms"] = round(per_iter_time(
        narrow_loss, cp, plan_i, iters=10) * 1e3, 3)
    out["narrow_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, pl: jax.value_and_grad(narrow_loss)(x, pl),
        cp, plan_i, iters=10) * 1e3, 3)
    out["wide_fwd_ms"] = round(per_iter_time(
        wide_loss, cp, plan_i, iters=10) * 1e3, 3)
    out["wide_fwd_bwd_ms"] = round(per_iter_time(
        lambda x, pl: jax.value_and_grad(wide_loss)(x, pl),
        cp, plan_i, iters=10) * 1e3, 3)
    a = jax.jit(narrow_loss)(cp, plan_i)
    b = jax.jit(wide_loss)(cp, plan_i)
    out["l1_rel_diff"] = float(abs(a - b) / abs(a))
    report("FINAL_L1_AB", out)


def lp_epochs():
    from benchmarks.bench_suite import bench_lp
    for dense_b, wide_b, tag in [
            (None, None, "lp_epoch_default_s"),
            ("1", None, "lp_epoch_dense_basis_s"),
            (None, "1", "lp_epoch_wide_basis_s"),
            ("1", "1", "lp_epoch_both_s")]:
        _flag("MRGCN_DENSE_BASIS", dense_b)
        _flag("MRGCN_WIDE_BASIS", wide_b)
        try:
            epoch, _ = bench_lp()
            report(tag, round(epoch, 6))
        except Exception as exc:  # keep the batch alive
            report(tag, f"{type(exc).__name__}: {exc}")
    _flag("MRGCN_DENSE_BASIS", None)
    _flag("MRGCN_WIDE_BASIS", None)


def regression_guard():
    from bench import run_jax_epochs  # headline featureless chain
    from benchmarks.torch_baseline import build_workload

    try:
        report("headline_epoch_s", round(run_jax_epochs(build_workload()),
                                         6))
    except Exception as exc:
        report("headline_epoch_s", f"{type(exc).__name__}: {exc}")
    from benchmarks.bench_suite import bench_multimodal
    try:
        report("mm_epoch_s", round(bench_multimodal(), 6))
    except Exception as exc:
        report("mm_epoch_s", f"{type(exc).__name__}: {exc}")


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("lp_layer_ab", lp_layer_ab)
    guarded("lp_epochs", lp_epochs)
    guarded("regression_guard", regression_guard)
    print("FINAL_R4A", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
