"""Decompose the multimodal NC epoch (bench_suite workload) on TPU.

Parts: full step / fwd+bwd / encoders-only fwd+bwd (loss on summed
encoder outputs, no graph) / graph-only fwd+bwd (featureless R-GCN on
the same edges) / per-encoder forward.

Run:  python benchmarks/micro_multimodal_parts.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_suite import multimodal_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.timing import per_iter_time
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
    X_width = 40
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
    variables = model.init(jax.random.PRNGKey(0), feats, edges)
    params, stats = variables["params"], variables.get("batch_stats", {})
    labels_idx = jnp.asarray(rng.choice(n, 10_000, replace=False)
                             .astype(np.int32))
    labels_cls = jnp.asarray(rng.integers(0, C, 10_000).astype(np.int32))

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def loss_of(p, st, key):
        out, _ = model.apply({"params": p, "batch_stats": st}, feats,
                             edges, train=True, rngs={"dropout": key},
                             mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            out[labels_idx], labels_cls).mean()

    key = jax.random.PRNGKey(1)
    report("fwd_ms", per_iter_time(lambda p: loss_of(p, stats, key),
                                   params, iters=10))

    def grad_step(p):
        # return the grads too: a loss-only return lets XLA dead-code
        # -eliminate the entire backward pass (the round-3 "57 ms
        # fwd_bwd" was really forward-only)
        return jax.value_and_grad(lambda q: loss_of(q, stats, key))(p)
    report("fwd_bwd_ms", per_iter_time(grad_step, params, iters=10))

    # encoders only: loss on the fused feature matrix (no graph conv)
    def enc_loss(p):
        X, _ = model.apply(
            {"params": p, "batch_stats": stats}, feats, n,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            method=MRGCN.compute_modality_embeddings)
        return jnp.sum(X * X) * 1e-6

    report("encoders_fwd_bwd_ms", per_iter_time(
        lambda p: jax.value_and_grad(enc_loss)(p), params, iters=10))

    # per-encoder forwards
    from mrgcn_tpu.models import encoders as enc_mod
    text = feats[names[2]][0]
    img = feats[names[3]][0]
    te = enc_mod.TextEncoder(output_dim=16)
    tv = te.init(jax.random.PRNGKey(2), text)
    report("text_fwd_ms", per_iter_time(
        lambda v: te.apply(v, text), tv, iters=10))
    report("text_fwd_bwd_ms", per_iter_time(
        lambda v: jax.value_and_grad(
            lambda q: jnp.sum(te.apply(q, text)))(v),
        tv, iters=10))
    ie = enc_mod.ImageCNN(output_dim=16)
    x_img = jnp.transpose(img.astype(jnp.float32) / 255.0, (0, 2, 3, 1))
    iv = ie.init(jax.random.PRNGKey(3), x_img)
    report("image_fwd_ms", per_iter_time(
        lambda v: ie.apply(v, x_img, mutable=["batch_stats"])[0],
        iv, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
