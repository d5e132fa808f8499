"""Decompose the round-2 headline epoch (sorted-stream engine) on TPU.

Parts measured at bench.py's exact workload (n=100k, E=700k, R=121, B=40,
16->14 featureless 2-layer R-GCN):

  * full train step (parity with bench.py)
  * loss + grad (no optimizer)
  * forward only
  * featureless input layer forward only
  * dense layer forward only
  * optimizer update only (clip + adam on the real param tree)

Run:  python benchmarks/micro_r2_parts.py
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

    def loss_of(p):
        out = model.apply({"params": p}, None, edges)
        logits = out[labels_idx]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels_cls).mean()

    if os.environ.get("MRGCN_PARTS_STEP", "1") == "1":
        # forward only
        report("forward_ms", per_iter_time(loss_of, params, iters=10))

        # loss + grad
        def grad_step(p):
            loss, grads = jax.value_and_grad(loss_of)(p)
            return loss, grads
        report("fwd_bwd_ms", per_iter_time(grad_step, params, iters=10))

        # optimizer only (one-like grads stand in; same tree/shape traffic)
        grads0 = jax.tree.map(jnp.ones_like, params)

        def opt_only(g, os_):
            updates, os2 = optimizer.update(g, os_, params)
            return optax.apply_updates(params, updates), os2
        report("optimizer_ms", per_iter_time(opt_only, grads0, opt_state,
                                             iters=10))

        # full step
        def full_step(p, os_):
            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, os2 = optimizer.update(grads, os_, p)
            return optax.apply_updates(p, updates), os2, loss
        report("full_step_ms", per_iter_time(full_step, params, opt_state,
                                             iters=10))

    # featureless layer forward only
    from mrgcn_tpu.ops import rspmm
    shape, k = rspmm.packed_identity_shape(B, n, hidden)
    packed = params["layer_0"]["weight_i_packed"]
    comp = params["layer_0"]["comp_i"]
    plan_i = edges.plan_for(hidden, hidden, identity=True)

    from mrgcn_tpu.models.rgcn import _identity_planned
    report("featureless_fwd_ms", per_iter_time(
        lambda pk, c: _identity_planned(pk, c, plan_i, hidden),
        packed, comp, iters=10))

    # featureless compose only (the comp @ packed matmul)
    S = packed.shape[0]
    report("compose_ms", per_iter_time(
        lambda pk, c: jnp.dot(c, pk.reshape(S, -1),
                              preferred_element_type=jnp.float32),
        packed, comp, iters=10))

    # dense layer forward only
    H = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((n, hidden)).astype(np.float32))
    Wf = params["layer_1"]["weight_f"]
    comp_f = params["layer_1"]["comp_f"]
    plan_f = edges.plan_for(hidden, C)
    report("dense_fwd_ms", per_iter_time(
        lambda h, wf, c: rl.dense_aggregate(
            h, rspmm._compose_weights(wf, c), plan_f, hidden, C),
        H, Wf, comp_f, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
