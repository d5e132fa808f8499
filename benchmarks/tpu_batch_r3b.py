"""One-shot TPU experiment batch (round 3, resumed session).

Axon TPU claims are slow — batch every open measurement into one process:

  1. micro_bwd_parts          — backward-side decomposition at bench scale
  2. micro_compose_bwd_variants — XLA/Pallas variants of the compose vjp
  3. full featureless train step, fused compose-bwd OFF vs ON
     (MRGCN_FUSED_COMPOSE_BWD routes models/rgcn._identity_planned through
     ops/relational.featureless_composed)

Run:  python benchmarks/tpu_batch_r3b.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step_time_with_flag(fused: str) -> float:
    """Featureless bench-scale train step time with the fused-bwd flag.
    Restores the env var afterwards — a leaked "1" would contaminate every
    later experiment in the batch with the experimental kernel."""
    prev = os.environ.get("MRGCN_FUSED_COMPOSE_BWD")
    os.environ["MRGCN_FUSED_COMPOSE_BWD"] = fused
    try:
        return _step_time()
    finally:
        if prev is None:
            os.environ.pop("MRGCN_FUSED_COMPOSE_BWD", None)
        else:
            os.environ["MRGCN_FUSED_COMPOSE_BWD"] = prev


def _step_time() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.timing import per_iter_time
    from benchmarks.torch_baseline import build_workload
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]
    src = np.asarray(w["src"], dtype=np.int32)
    dst = np.asarray(w["dst"], dtype=np.int32)
    rel = np.asarray(w["rel"], dtype=np.int32)
    norm = np.asarray(w["norm"], dtype=np.float32)
    grouping = group_by_relation(src, dst, rel, norm, n)
    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, hidden), (hidden, C)])
    edges = EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                      rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                      num_out=n,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size,
                      plans=plans)
    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)
    labels_idx = jnp.asarray(w["labels_idx"], dtype=jnp.int32)
    labels_cls = jnp.asarray(w["labels_cls"], dtype=jnp.int32)

    def loss_fn(p):
        out = model.apply({"params": p}, None, edges)
        return optax.softmax_cross_entropy_with_integer_labels(
            out[labels_idx], labels_cls).mean()

    def full(p, st):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = optimizer.update(grads, st, p)
        return optax.apply_updates(p, updates)

    return per_iter_time(full, params, opt_state, iters=10) * 1e3


def lp_parts():
    """Decompose the LP FB15k-scale train step (epoch 0.161 s): where do
    the milliseconds go when XLA's own FLOP count says ~4.4 ms of MXU?"""
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import distmult
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    plans = rl.plans_for_layers(w["src"], w["dst"], w["rel"], w["norm"], n,
                                [(None, hidden), (hidden, hidden)])
    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
    edges = EdgeBlock(src=jnp.asarray(w["src"]), dst=jnp.asarray(w["dst"]),
                      rel=jnp.asarray(w["rel"]),
                      norm=jnp.asarray(w["norm"]), num_out=n, plans=plans,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size)
    model = RGCN(hidden_dims=(hidden, hidden), num_relations=R,
                 num_nodes=n, num_bases=B, featureless=True,
                 link_prediction=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    trip = jnp.asarray(w["trip"])

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def embed_loss(p):
        return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

    report("lp_embed_fwd_ms", per_iter_time(
        lambda p: embed_loss(p), params, iters=10))
    report("lp_embed_fwd_bwd_ms", per_iter_time(
        lambda p: jax.value_and_grad(embed_loss)(p), params, iters=10))

    # layer-1 featureless identity gather alone (fused-basis path: the
    # planned table at R=475 x 200 lanes would be ~7 GB, so the model
    # falls back to gather_aggregate)
    l1 = params["layer_0"]
    wi = l1["weight_i"]
    comp_i = l1.get("comp_i")

    def l1_loss(v):
        out = rspmm.gather_aggregate(
            v[:, :n, :hidden], edges.src, edges.dst, edges.rel,
            edges.norm, n, comp=comp_i)
        return jnp.sum(out ** 2)

    report("lp_layer1_fwd_ms", per_iter_time(l1_loss, wi, iters=10))
    report("lp_layer1_fwd_bwd_ms", per_iter_time(
        lambda v: jax.value_and_grad(l1_loss)(v), wi, iters=10))

    # layer-1 on the basis-stream engine (featureless_basis, :idb plans)
    if comp_i is not None:
        plans_idb = rl.plans_for_layers(
            w["src"], w["dst"], w["rel"], w["norm"], n, [(None, hidden)],
            identity_basis=True)[f"1:1:idb"]

        def l1_basis_loss(v):
            out = rl.featureless_basis(comp_i, v, plans_idb, hidden)
            return jnp.sum(out ** 2)

        wi_rows = wi if wi.shape[1] == plans_idb.n_in_rows \
            else wi[:, :plans_idb.n_in_rows, :]
        report("lp_layer1_basis_fwd_ms", per_iter_time(
            l1_basis_loss, wi_rows, iters=10))
        report("lp_layer1_basis_fwd_bwd_ms", per_iter_time(
            lambda v: jax.value_and_grad(l1_basis_loss)(v), wi_rows,
            iters=10))

    # layer-2 grouped dense aggregation alone
    H = jnp.ones((n, hidden), jnp.float32)
    wf = params["layer_1"]["weight_f"]
    comp_f = params["layer_1"].get("comp_f")

    def l2_loss(h):
        out = rspmm.transform_aggregate_grouped(
            h, edges.grp_src, edges.grp_dst, edges.grp_norm,
            edges.group_rel, edges.group_size, n, wf, comp=comp_f)
        return jnp.sum(out ** 2)

    report("lp_layer2_fwd_ms", per_iter_time(l2_loss, H, iters=10))
    report("lp_layer2_fwd_bwd_ms", per_iter_time(
        lambda h: jax.value_and_grad(l2_loss)(h), H, iters=10))

    # DistMult scoring + BCE on fixed embeddings
    emb = jnp.asarray(np.random.default_rng(2).standard_normal(
        (n, hidden)), jnp.float32)
    rels = params["relations"]
    labels = jnp.ones((trip.shape[0],), jnp.float32)

    def score_loss(e):
        s = distmult.score(trip[:, 0], trip[:, 1], trip[:, 2], e, rels)
        return optax.sigmoid_binary_cross_entropy(s, labels).mean()

    report("lp_score_fwd_ms", per_iter_time(score_loss, emb, iters=10))
    report("lp_score_fwd_bwd_ms", per_iter_time(
        lambda e: jax.value_and_grad(score_loss)(e), emb, iters=10))

    print("FINAL_LP " + json.dumps(results), flush=True)


def lp_stream_trial():
    """LP dense layer (200x200, R=475) on the sorted-stream engine with
    rel_const FORCED (the auto-heuristic rejects it for the ~4x slab
    padding) at several edge_block sizes, vs the shipped relation-grouped
    path. If the Pallas scatter beats the XLA segment_sum by more than the
    padded slab matmuls cost, the heuristic is wrong at LP scale."""
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden = 200
    rng = np.random.default_rng(4)
    H = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((R, hidden, hidden)) * 0.01,
                    jnp.float32)
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)

    def grouped_loss(h):
        out = rspmm.transform_aggregate_grouped(
            h, jnp.asarray(grouping.src), jnp.asarray(grouping.dst),
            jnp.asarray(grouping.norm), jnp.asarray(grouping.group_rel),
            grouping.group_size, n, W)
        return jnp.sum(out ** 2)

    report("grouped_fwd_bwd_ms", per_iter_time(
        lambda h: jax.value_and_grad(grouped_loss)(h), H, iters=10))

    # eb=256 pads to 3.5M edges whose plan arrays overflow the axon
    # remote-compile request (HTTP 413), and eb64/eb128 already lose to
    # the grouped path by ~7x -- no information in the larger block.
    for eb in (64, 128):
        plans = rl.build_layer_plans(
            w["src"], w["dst"], w["rel"], w["norm"], n, 1, 1,
            edge_block=eb, kind="dense",
            rel_const_override={"fwd": True, "bwd_h": True})
        print(json.dumps({
            f"stream_eb{eb}_padded_edges": plans.fwd.num_padded_edges,
            "raw_edges": int(len(w["src"]))}), flush=True)

        def stream_loss(h, plans=plans):
            out = rl.dense_aggregate(h, W, plans, hidden, hidden)
            return jnp.sum(out ** 2)

        report(f"stream_eb{eb}_fwd_bwd_ms", per_iter_time(
            lambda h: jax.value_and_grad(stream_loss)(h), H, iters=10))

    print("FINAL_LP_STREAM " + json.dumps(results), flush=True)


def run_script(mod_name: str):
    print(f"\n===== {mod_name} =====", flush=True)
    mod = __import__(f"benchmarks.{mod_name}", fromlist=["main"])
    mod.main()


def guarded(label: str, fn, *args):
    """One failing experiment (e.g. a Mosaic compile error on a kernel
    first exercised on real hardware here) must not kill the rest of the
    batch — TPU grants are scarce."""
    import traceback
    try:
        return fn(*args)
    except Exception:
        print(f"!!! {label} FAILED:", flush=True)
        traceback.print_exc()
        return None


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    guarded("micro_bwd_parts", run_script, "micro_bwd_parts")
    guarded("micro_compose_bwd_variants", run_script,
            "micro_compose_bwd_variants")

    print("\n===== fused compose-bwd step =====", flush=True)
    off = guarded("step_fused_off", step_time_with_flag, "0")
    if off is not None:
        print(json.dumps({"step_fused_off_ms": round(off, 3)}), flush=True)
    on = guarded("step_fused_on", step_time_with_flag, "1")
    if on is not None:
        print(json.dumps({"step_fused_on_ms": round(on, 3)}), flush=True)

    guarded("micro_multimodal_parts", run_script, "micro_multimodal_parts")

    print("\n===== LP step decomposition =====", flush=True)
    guarded("lp_parts", lp_parts)

    print("\n===== LP stream-engine trial =====", flush=True)
    guarded("lp_stream_trial", lp_stream_trial)

    print("\n===== LP full epoch (basis-stream default) =====", flush=True)

    def _bench_lp():
        from benchmarks.bench_suite import bench_lp
        epoch, t_rank = bench_lp()
        print(json.dumps({"lp_epoch_s": round(float(epoch), 4),
                          "lp_rank_chunk_s": round(float(t_rank), 5)}),
              flush=True)
    guarded("bench_lp", _bench_lp)


if __name__ == "__main__":
    sys.exit(main() or 0)
