"""Extended TPU benchmarks: multimodal NC epoch and LP epoch + ranking.

Complements the headline featureless bench (bench.py) with the two other
production regimes, using the honest fetch-forced protocol
(benchmarks/timing.py) and device-resident step loops.

* ``multimodal_epoch``: DMG-like featured workload — numeric, temporal,
  text (byte tokens) and image encoding sets at realistic row counts, gated
  encoders + 2-layer R-GCN, one full-batch training step.
* ``lp_epoch``: FB15k-237-scale featureless LP training step (DistMult,
  within-batch corruption fixed per step).
* ``lp_ranking``: full filtered ranking of one test chunk.

Prints one JSON line per metric.  Run: python benchmarks/bench_suite.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def multimodal_workload():
    """DMG-like scale (SURVEY: 46k images are out of scope for a micro
    benchmark; row counts chosen to keep compile times sane while the
    encoder mix matches DMG's modalities)."""
    rng = np.random.default_rng(0)
    n, E, R, B = 60_000, 400_000, 61, 40
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    feats = {
        "num": rng.random((20_000, 1)).astype(np.float32),
        "year": rng.random((10_000, 6)).astype(np.float32),
        "text": rng.integers(0, 259, (8_000, 128)).astype(np.int32),
        "img": rng.integers(0, 255, (2_000, 3, 64, 64)).astype(np.uint8),
    }
    return dict(n=n, E=E, R=R, B=B, src=src, dst=dst, rel=rel, norm=norm,
                feats=feats, rng=rng)


def multimodal_setup():
    """Build the multimodal train step once; shared with
    benchmarks/roofline.py. Returns (train_step, params, stats,
    opt_state, edges) — ``edges`` is the per-layer EdgeBlock tuple on
    the restricted default, one EdgeBlock otherwise."""
    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.models.mrgcn import MRGCN, module_names
    from mrgcn_tpu.models.rgcn import EdgeBlock
    from mrgcn_tpu.ops import relational as rl

    w = multimodal_workload()
    n, R, B = w["n"], w["R"], w["B"]
    hidden, C = 16, 14
    rng = w["rng"]

    modules_config = (
        ("xsd.numeric", (1, 4, 0.0)),
        ("xsd.gYear", (6, 4, 0.0)),
        ("xsd.string", (None, 16, 0.0)),
        ("blob.image", (None, {}, 16, 0.0)),
    )
    names = module_names(modules_config)
    X_width = 4 + 4 + 16 + 16
    feats = {
        names[0]: (jnp.asarray(w["feats"]["num"]),
                   jnp.asarray(rng.choice(n, 20_000, replace=False)
                               .astype(np.int32))),
        names[1]: (jnp.asarray(w["feats"]["year"]),
                   jnp.asarray(rng.choice(n, 10_000, replace=False)
                               .astype(np.int32))),
        names[2]: (jnp.asarray(w["feats"]["text"]),
                   jnp.asarray(rng.choice(n, 8_000, replace=False)
                               .astype(np.int32))),
        names[3]: (jnp.asarray(w["feats"]["img"]),
                   jnp.asarray(rng.choice(n, 2_000, replace=False)
                               .astype(np.int32))),
    }

    plans = rl.plans_for_layers(w["src"], w["dst"], w["rel"], w["norm"], n,
                                [(None, hidden), (X_width, hidden),
                                 (hidden, C)])
    edges = EdgeBlock(src=jnp.asarray(w["src"]), dst=jnp.asarray(w["dst"]),
                      rel=jnp.asarray(w["rel"]),
                      norm=jnp.asarray(w["norm"]), num_out=n, plans=plans)
    model = MRGCN(hidden_dims=(hidden, C), modules_config=modules_config,
                  num_relations=R, num_nodes=n, num_bases=B)
    labels_np = np.sort(rng.choice(n, 10_000, replace=False)).astype(np.int32)
    cls_np = rng.integers(0, C, 10_000).astype(np.int32)
    if os.environ.get("MRGCN_RESTRICT_OUT", "1") != "0":
        # the NC driver's default full-batch path: frontier-restricted
        # layers (tasks/common.restricted_layer_edges)
        from types import SimpleNamespace

        from mrgcn_tpu.tasks.common import restricted_layer_edges
        structure = SimpleNamespace(src=w["src"], dst=w["dst"],
                                    rel=w["rel"], norm=w["norm"],
                                    num_nodes=n)
        edges = restricted_layer_edges(structure, labels_np, 2, edges,
                                       first_dim=hidden, X_width=X_width,
                                       featureless=False)
        labels_idx = jnp.arange(len(labels_np), dtype=jnp.int32)
    else:
        labels_idx = jnp.asarray(labels_np)
    labels_cls = jnp.asarray(cls_np)

    variables = model.init(jax.random.PRNGKey(0), feats, edges)
    params, stats = variables["params"], variables.get("batch_stats", {})
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)

    def train_step(params, stats, opt_state, rngkey):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": stats}, feats, edges,
                train=True, rngs={"dropout": rngkey},
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out[labels_idx], labels_cls).mean()
            return loss, updates.get("batch_stats", stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss

    return train_step, params, stats, opt_state, edges


def bench_multimodal(steps=5):
    import jax
    import jax.numpy as jnp

    train_step, params, stats, opt_state, _ = multimodal_setup()

    @jax.jit
    def run_epochs(params, stats, opt_state, k):
        def body(i, carry):
            params, stats, opt_state, _ = carry
            return train_step(params, stats, opt_state,
                              jax.random.fold_in(jax.random.PRNGKey(1), i))
        return jax.lax.fori_loop(0, k, body,
                                 (params, stats, opt_state,
                                  jnp.float32(0)))

    def run(params, stats, opt_state, k):
        t0 = time.time()
        params, stats, opt_state, loss = run_epochs(params, stats,
                                                    opt_state,
                                                    jnp.int32(k))
        float(loss)
        return time.time() - t0, params, stats, opt_state

    _, params, stats, opt_state = run(params, stats, opt_state, 1)
    t1, params, stats, opt_state = run(params, stats, opt_state, 1)
    tk, params, stats, opt_state = run(params, stats, opt_state, steps + 1)
    return (tk - t1) / steps


def lp_workload():
    """FB15k-237 scale: 14.5k entities, 237 relations (+inverses+loop),
    272k train triples."""
    rng = np.random.default_rng(1)
    n, ntrip, P = 14_541, 272_115, 237
    trip = np.stack([rng.integers(0, n, ntrip),
                     rng.integers(0, P, ntrip),
                     rng.integers(0, n, ntrip)], axis=1).astype(np.int32)
    R = 2 * P + 1
    src = np.concatenate([trip[:, 0], trip[:, 2], np.arange(n)])
    dst = np.concatenate([trip[:, 2], trip[:, 0], np.arange(n)])
    rel = np.concatenate([trip[:, 1], trip[:, 1] + P,
                          np.full(n, 2 * P)]).astype(np.int32)
    from mrgcn_tpu.encodings.structure import compute_norm
    norm = compute_norm(src.astype(np.int32), rel, n, R)
    return dict(n=n, R=R, src=src.astype(np.int32),
                dst=dst.astype(np.int32), rel=rel, norm=norm, trip=trip,
                rng=rng)


def bench_lp(steps=5):
    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import distmult
    from mrgcn_tpu.ops import relational as rl

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    # same plan-kind decision the task driver makes (tasks/common.py):
    # the composed table at R=475 x 200-lane rows would be ~7 GB, so the
    # identity plans carry the basis-stream bwd_h (featureless_basis path)
    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden), (hidden, hidden)],
        identity_basis=rl.basis_stream_wanted(R, n, hidden, B))
    from mrgcn_tpu.encodings.structure import group_by_relation
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

    def train_step(params, opt_state, rngkey):
        # in-jit within-batch corruption (vectorised PRNG)
        k1, k2, k3 = jax.random.split(rngkey, 3)
        pick = jax.random.choice(k1, trip.shape[0], (ncorrupt,),
                                 replace=False)
        corrupt = trip[pick]
        heads = jax.random.randint(k2, (ncorrupt // 2,), 0, n)
        tails = jax.random.randint(k3,
                                   (ncorrupt - ncorrupt // 2,), 0, n)
        corrupt = corrupt.at[:ncorrupt // 2, 0].set(heads)
        corrupt = corrupt.at[ncorrupt // 2:, 2].set(tails)
        batch = jnp.concatenate([trip, corrupt], axis=0)

        def loss_fn(p):
            emb = model.apply({"params": p}, None, edges)
            score = distmult.score(batch[:, 0], batch[:, 1], batch[:, 2],
                                   emb, p["relations"])
            return optax.sigmoid_binary_cross_entropy(score,
                                                      labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_epochs(params, opt_state, k):
        def body(i, carry):
            params, opt_state, _ = carry
            return train_step(params, opt_state,
                              jax.random.fold_in(jax.random.PRNGKey(2), i))
        return jax.lax.fori_loop(0, k, body,
                                 (params, opt_state, jnp.float32(0)))

    def run(params, opt_state, k):
        t0 = time.time()
        params, opt_state, loss = run_epochs(params, opt_state,
                                             jnp.int32(k))
        float(loss)
        return time.time() - t0, params, opt_state

    _, params, opt_state = run(params, opt_state, 1)
    t1, params, opt_state = run(params, opt_state, 1)
    tk, params, opt_state = run(params, opt_state, steps + 1)
    epoch = (tk - t1) / steps

    # --- full-entity ranking of one 5000-fact chunk (raw) ---
    @jax.jit
    def embed(params):
        return model.apply({"params": params}, None, edges)

    emb = embed(params)
    facts = trip[:5000]

    rels = params["relations"]

    def rank_chunk(e):
        sp = e[facts[:, 0]] * rels[facts[:, 1]]
        scores = sp @ e.T                          # (5000, n)
        true = scores[jnp.arange(facts.shape[0]), facts[:, 2]]
        greater = jnp.sum((scores > true[:, None]).astype(jnp.int32),
                          axis=1)
        ties = jnp.sum((scores == true[:, None]).astype(jnp.int32),
                       axis=1)
        return (greater + (ties - 1) // 2 + 1).astype(jnp.float32)

    from benchmarks.timing import per_iter_time
    t_rank = per_iter_time(rank_chunk, emb, iters=6)
    return epoch, t_rank


def main():
    t = bench_multimodal()
    print(json.dumps({"metric": "multimodal_nc_epoch_time",
                      "value": round(t, 6), "unit": "s"}), flush=True)
    epoch, t_rank = bench_lp()
    print(json.dumps({"metric": "lp_fb15k237_epoch_time",
                      "value": round(epoch, 6), "unit": "s"}), flush=True)
    if t_rank > 0:
        print(json.dumps({"metric": "lp_rank_5000x14541_time",
                          "value": round(t_rank, 6), "unit": "s"}),
              flush=True)


if __name__ == "__main__":
    main()
