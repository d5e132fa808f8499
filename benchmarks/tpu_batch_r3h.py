"""Round-3 TPU batch H: find the LP epoch's ~50 ms residual.

The honest parts (r3e/r3f) sum to ~85 ms — layer1 basis-stream 30.1 +
layer2 grouped dHW 34.1 + score 12.9 + corruption 0.04 + optimizer — yet
the epoch measures 135 ms. Isolate the composition effects on the REAL
bench_lp model/step:

  * step_full        — one full train step (corrupt + fwd + bwd + clip +
                       adam), per_iter protocol (vs the fori-loop epoch)
  * grads_only       — same loss, value_and_grad, no optimizer.update
  * grads_noreg      — drop the L1/L2 regularization term
  * embed_score_bwd  — grads of BCE(score(embed(p))) wrt p (the true
                       chain, vs the sum(out^2) proxies measured so far)
  * embed_proxy_bwd  — grads of sum(embed(p)^2) (the proxy, for the same
                       params pytree)
  * opt_only         — clip_by_global_norm + adam update on captured grads

Run:  python benchmarks/tpu_batch_r3h.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def lp_step_parts():
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import distmult
    from mrgcn_tpu.ops import relational as rl

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden), (hidden, hidden)],
        identity_basis=rl.basis_stream_wanted(R, n, hidden, B))
    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"],
                                 n)
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
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)

    trip = jnp.asarray(w["trip"])
    ncorrupt = trip.shape[0] // 5
    labels = jnp.concatenate([jnp.ones(trip.shape[0]),
                              jnp.zeros(ncorrupt)])
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def batch_of(rngkey):
        k1, k2, k3 = jax.random.split(rngkey, 3)
        pick = jax.random.choice(k1, trip.shape[0], (ncorrupt,),
                                 replace=False)
        corrupt = trip[pick]
        heads = jax.random.randint(k2, (ncorrupt // 2,), 0, n)
        tails = jax.random.randint(k3, (ncorrupt - ncorrupt // 2,), 0, n)
        corrupt = corrupt.at[:ncorrupt // 2, 0].set(heads)
        corrupt = corrupt.at[ncorrupt // 2:, 2].set(tails)
        return jnp.concatenate([trip, corrupt], axis=0)

    def loss_fn(p, batch):
        emb = model.apply({"params": p}, None, edges)
        score = distmult.score(batch[:, 0], batch[:, 1], batch[:, 2],
                               emb, p["relations"])
        return optax.sigmoid_binary_cross_entropy(score, labels).mean()

    key = jax.random.PRNGKey(7)

    def step_full(p_o):
        p, o = p_o
        batch = batch_of(key)
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, batch))(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    report("step_full_ms", per_iter_time(step_full, (params, opt_state),
                                         iters=10))

    batch_fixed = jax.jit(batch_of)(key)

    report("grads_only_ms", per_iter_time(
        lambda p: jax.value_and_grad(
            lambda q: loss_fn(q, batch_fixed))(p), params, iters=10))

    def loss_proxy(p):
        emb = model.apply({"params": p}, None, edges)
        return jnp.sum(emb ** 2)

    report("embed_proxy_bwd_ms", per_iter_time(
        lambda p: jax.value_and_grad(loss_proxy)(p), params, iters=10))

    _, grads = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_fn(q, batch_fixed))(p))(params)

    def opt_only(g):
        updates, o = optimizer.update(g, opt_state, params)
        return optax.apply_updates(params, updates), o

    report("opt_only_ms", per_iter_time(opt_only, grads, iters=10))

    report("corrupt_only_ms", per_iter_time(batch_of, key, iters=10))

    print("FINAL_LP_PARTS " + json.dumps(results), flush=True)


def grouped_order_trial():
    """Does within-relation edge ORDER matter to the grouped path's XLA
    gather/scatter? group_by_relation keeps the original (random) order
    inside each relation run; sorting by dst should improve the H-gather's
    HBM locality (fwd) and make the d_H scatter semi-sorted (bwd). Same
    math — segment_sum is order-insensitive per output row."""
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import rspmm

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden = 200
    rng = np.random.default_rng(5)
    H = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((R, hidden, hidden)) * 0.1,
                    jnp.float32)
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    src = np.asarray(w["src"], np.int32)
    dst = np.asarray(w["dst"], np.int32)
    rel = np.asarray(w["rel"], np.int32)
    norm = np.asarray(w["norm"], np.float32)

    for label, order in (
            ("orig", None),
            ("dst", np.lexsort((dst, rel))),
            ("src", np.lexsort((src, rel)))):
        if order is None:
            s, d, r, m = src, dst, rel, norm
        else:
            s, d, r, m = src[order], dst[order], rel[order], norm[order]
        g = group_by_relation(s, d, r, m, n)
        args = (jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.norm),
                jnp.asarray(g.group_rel), g.group_size, n)

        def loss(hv, args=args):
            return jnp.sum(rspmm.transform_aggregate_grouped(
                hv[0], *args, hv[1]) ** 2)

        report(f"grouped_{label}_dHW_ms", per_iter_time(
            lambda hv: jax.value_and_grad(loss)(hv), (H, W), iters=10))

    print("FINAL_GROUPED_ORDER " + json.dumps(results), flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== LP step parts (composition residual) =====", flush=True)
    guarded("lp_step_parts", lp_step_parts)

    print("\n===== grouped edge-order trial =====", flush=True)
    guarded("grouped_order_trial", grouped_order_trial)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
