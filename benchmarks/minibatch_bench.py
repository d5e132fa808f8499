"""Mini-batch NC training epoch at DMG scale (the shipped dmg.toml mode).

DMG trains with ``batchsize = 32`` (configs/dmg.toml) — L-hop BFS
mini-batches through the native C++ sampler, bucketed shapes, encoder
subsets, the relation-grouped MXU aggregation path (the sorted-stream plan
engine is full-batch-only by design; this benchmark quantifies what that
costs in the shipped mini-batch mode).

Reports:
  * host-side batch build time (BFS + feature subsetting, once per run —
    the reference builds batches once and reuses them every epoch too,
    reference: node_classification.py:127-143)
  * steady-state epoch time over all batches (devices-resident params,
    per-batch dispatch — distinct bucketed shapes compile once)

Run:  python benchmarks/minibatch_bench.py [--batchsize 32] [--labeled 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_suite import multimodal_workload  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batchsize", type=int, default=32)
    ap.add_argument("--labeled", type=int, default=10_000)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.data import batching
    from mrgcn_tpu.encodings.structure import GraphStructure
    from mrgcn_tpu.models.mrgcn import MRGCN, module_names

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

    structure = GraphStructure(num_nodes=n, num_relations=R,
                               src=np.asarray(w["src"], np.int32),
                               dst=np.asarray(w["dst"], np.int32),
                               rel=np.asarray(w["rel"], np.int32),
                               norm=np.asarray(w["norm"], np.float32))

    labels_idx = rng.choice(n, args.labeled, replace=False).astype(np.int32)
    labels_cls = rng.integers(0, C, args.labeled).astype(np.int32)

    # ---- host-side batch building (BFS + feature subsets) ----------------
    t0 = time.perf_counter()
    index = batching.EdgeIndex(structure)
    batches = []
    for begin in range(0, args.labeled, args.batchsize):
        nodes = labels_idx[begin:begin + args.batchsize]
        mb = batching.sample_minibatch(index, nodes, num_layers=2)
        bfeats = batching.subset_features(feats, mb.outer_nodes)
        m = len(nodes)
        M = batching.bucket(m, 32)
        idx = np.concatenate([np.arange(m, dtype=np.int32),
                              np.zeros(M - m, dtype=np.int32)])
        tgt = np.concatenate([labels_cls[begin:begin + m],
                              np.zeros(M - m, dtype=np.int32)])
        wgt = np.concatenate([np.ones(m, np.float32),
                              np.zeros(M - m, np.float32)])
        batches.append((bfeats, mb.layer_edges, jnp.asarray(idx),
                        jnp.asarray(tgt), jnp.asarray(wgt)))
    t_build = time.perf_counter() - t0
    print(json.dumps({"batch_build_s": round(t_build, 3),
                      "num_batches": len(batches)}), flush=True)

    model = MRGCN(hidden_dims=(hidden, C), modules_config=modules_config,
                  num_relations=R, num_nodes=n, num_bases=B)
    variables = model.init(jax.random.PRNGKey(0), batches[0][0],
                           batches[0][1])
    params, stats = variables["params"], variables.get("batch_stats", {})
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, bfeats, edges, idx, tgt, wgt,
                   rngkey):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": stats}, bfeats, edges,
                train=True, rngs={"dropout": rngkey},
                mutable=["batch_stats"])
            logits = out[idx]
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt)
            loss = (losses * wgt).sum() / jnp.maximum(wgt.sum(), 1.0)
            return loss, updates.get("batch_stats", stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, \
            loss

    def epoch(params, stats, opt_state, k):
        loss = None
        for i, (bf, be, idx, tgt, wgt) in enumerate(batches):
            params, stats, opt_state, loss = train_step(
                params, stats, opt_state, bf, be, idx, tgt, wgt,
                jax.random.fold_in(jax.random.PRNGKey(k), i))
        jax.block_until_ready(loss)
        return params, stats, opt_state

    # warm-up epoch compiles every distinct bucketed shape
    t0 = time.perf_counter()
    params, stats, opt_state = epoch(params, stats, opt_state, 0)
    t_warm = time.perf_counter() - t0
    print(json.dumps({"first_epoch_incl_compiles_s": round(t_warm, 3)}),
          flush=True)

    times = []
    for k in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        params, stats, opt_state = epoch(params, stats, opt_state, k)
        times.append(time.perf_counter() - t0)
    t_epoch = float(np.median(times))
    print(json.dumps({"minibatch_epoch_s": round(t_epoch, 3),
                      "per_batch_ms": round(1e3 * t_epoch / len(batches),
                                            3)}), flush=True)

    # ---- scan-grouped epochs (the NC driver's default path): all
    # same-shaped batches run as ONE dispatch via lax.scan ----------------
    grouped: dict = {}
    for bf, be, idx, tgt, wgt in batches:
        payload = (bf, be, idx, tgt, wgt)
        leaves, td = jax.tree.flatten(payload)
        key = (td, tuple((leaf.shape, str(leaf.dtype)) for leaf in leaves))
        grouped.setdefault(key, []).append(payload)
    stacked_groups = [jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
                      for ps in grouped.values()]
    print(json.dumps({"num_scan_groups": len(stacked_groups)}), flush=True)

    @jax.jit
    def group_step(params, stats, opt_state, stacked, rngs):
        def body(carry, xs):
            params, stats, opt_state = carry
            (bf, be, idx, tgt, wgt), rng = xs

            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": stats}, bf, be,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                logits = out[idx]
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, tgt)
                loss = (losses * wgt).sum() / jnp.maximum(wgt.sum(), 1.0)
                return loss, updates.get("batch_stats", stats)

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state), loss

        (params, stats, opt_state), losses = jax.lax.scan(
            body, (params, stats, opt_state), (stacked, rngs))
        return params, stats, opt_state, losses

    def scan_epoch(params, stats, opt_state, k):
        loss = None
        for gi, stacked in enumerate(stacked_groups):
            count = jax.tree.leaves(stacked)[0].shape[0]
            rngs = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(k), gi), count)
            params, stats, opt_state, loss = group_step(
                params, stats, opt_state, stacked, rngs)
        jax.block_until_ready(loss)
        return params, stats, opt_state

    t0 = time.perf_counter()
    params, stats, opt_state = scan_epoch(params, stats, opt_state, 0)
    print(json.dumps({"scan_first_epoch_incl_compiles_s":
                      round(time.perf_counter() - t0, 3)}), flush=True)
    times = []
    for k in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        params, stats, opt_state = scan_epoch(params, stats, opt_state, k)
        times.append(time.perf_counter() - t0)
    t_scan = float(np.median(times))
    print(json.dumps({"minibatch_scan_epoch_s": round(t_scan, 3)}),
          flush=True)

    print("FINAL " + json.dumps({
        "minibatch_epoch_s": round(t_epoch, 3),
        "minibatch_scan_epoch_s": round(t_scan, 3),
        "num_batches": len(batches),
        "batch_build_s": round(t_build, 3)}), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
