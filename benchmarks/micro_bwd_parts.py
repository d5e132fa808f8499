"""Decompose the featureless train step's BACKWARD side at bench scale.

NEXT.md round-3 candidate 2: the bwd_table scatter writes the full
(R*rows, 128) d_table (~793 MB at bench scale), then compose_packed's vjp
reads it twice (d_comp and d_packed dots). This benchmark isolates every
piece so the fused-kernel ROI is a measured number, not an estimate:

  * step_full       — loss + grad + adam (should match bench.py epoch)
  * fwd_loss        — forward + CE loss only
  * fwd_bwd         — value_and_grad (no optimizer)
  * adam_only       — optimizer.update + apply on captured grads
  * compose_fwd     — compose_packed alone (793 MB table write)
  * agg_fwd         — featureless_aggregate forward alone (gather+scatter)
  * agg_bwd_scatter — the d_table place-scatter on the bwd_table stream
  * compose_bwd     — the two vjp dots reading d_table
  * layer2_fwd_bwd  — the hidden->C dense layer fwd+bwd alone

Run:  python benchmarks/micro_bwd_parts.py
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
    import optax

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

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

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def loss_fn(p):
        out = model.apply({"params": p}, None, edges)
        return optax.softmax_cross_entropy_with_integer_labels(
            out[labels_idx], labels_cls).mean()

    def full(p, st):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = optimizer.update(grads, st, p)
        return optax.apply_updates(p, updates)

    report("step_full_ms", per_iter_time(full, params, opt_state, iters=10))
    report("fwd_loss_ms", per_iter_time(loss_fn, params, iters=10))
    report("fwd_bwd_ms", per_iter_time(
        lambda p: jax.value_and_grad(loss_fn)(p), params, iters=10))

    grads = jax.jit(jax.grad(loss_fn))(params)

    def adam_only(g, st, p):
        updates, st = optimizer.update(g, st, p)
        return optax.apply_updates(p, updates)

    report("adam_only_ms", per_iter_time(adam_only, grads, opt_state,
                                         params, iters=10))

    # ---- layer-1 internals on the identity plan ---------------------------
    k = rspmm.packing_factor(hidden)
    plan = plans[f"{k}:{k}:id"]
    layer1 = params["layer_0"]
    packed = layer1["weight_i_packed"]
    comp = layer1["comp_i"]
    pk = packed[:, :plan.n_in_rows, :]

    report("compose_fwd_ms", per_iter_time(
        lambda c: rspmm.compose_packed(c, pk), comp, iters=10))

    table = jax.jit(lambda c: rspmm.compose_packed(c, pk)
                    .reshape(-1, pk.shape[2]))(comp)

    report("agg_fwd_ms", per_iter_time(
        lambda t: rl.featureless_aggregate(t, plan, hidden), table,
        iters=10))
    report("agg_fwd_bwd_ms", per_iter_time(
        lambda t: jax.value_and_grad(
            lambda q: jnp.sum(rl.featureless_aggregate(q, plan, hidden)))(
                t), table, iters=10))

    # the d_table place-scatter alone (bwd_table stream)
    b = plan.bwd_table
    d_out = jnp.ones((plan.num_nodes, hidden), jnp.float32)

    def bwd_scatter(d_o):
        d_out_p = rl.pack_rows(d_o, plan.k_out, plan.n_out_rows)
        d_v = rl._gather_sub(d_out_p, b.src_row, b.out_mod, plan.k_out,
                             hidden)
        return rl._place_scatter(d_v, b.in_mod, b, table.shape[0],
                                 plan.k_in, hidden, table.shape[1], False)

    report("agg_bwd_scatter_ms", per_iter_time(bwd_scatter, d_out,
                                               iters=10))

    d_t = jax.jit(bwd_scatter)(d_out).reshape(comp.shape[0], -1,
                                              pk.shape[2])

    def compose_bwd(dt):
        d_comp = jax.lax.dot_general(
            dt, pk, (((1, 2), (1, 2)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d_packed = jax.lax.dot_general(
            comp, dt, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return d_comp, d_packed

    report("compose_bwd_ms", per_iter_time(compose_bwd, d_t, iters=10))

    # ---- layer 2 (dense hidden->C on its plan) ----------------------------
    plan2 = edges.plan_for(hidden, C)
    H = jnp.ones((n, hidden), jnp.float32)
    W2 = jnp.ones((R, hidden, C), jnp.float32)
    if plan2 is not None:
        report("layer2_fwd_bwd_ms", per_iter_time(
            lambda h: jax.value_and_grad(
                lambda q: jnp.sum(rl.dense_aggregate(q, W2, plan2, hidden,
                                                     C)))(h),
            H, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
