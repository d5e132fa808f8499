"""Attribute the multimodal train-step backward across modalities.

micro_multimodal_parts measured (one-hot embed, flash attn): fwd 23 ms,
fwd+bwd 714 ms, encoders-only fwd+bwd 636 ms, text standalone fwd+bwd
295 ms — leaving ~340 ms unattributed. This script runs the FULL model
grad with modality subsets so each modality's in-model share is a
subtraction, not a guess.

Run:  python benchmarks/micro_mm_attrib.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_suite import multimodal_workload  # noqa: E402


def build_step(subset=None, train=True):
    """The full multimodal value_and_grad step on the bench workload,
    restricted to the modality ``subset`` (None = all). Returns
    ``(step_fn, params)``."""
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

    key = jax.random.PRNGKey(1)
    f = feats if subset is None else \
        {k: v for k, v in feats.items() if k in subset}

    def loss_of(p):
        out, _ = model.apply({"params": p, "batch_stats": stats}, f,
                             edges, train=train, rngs={"dropout": key},
                             mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(
            out[labels_idx], labels_cls).mean()

    return (lambda p: jax.value_and_grad(loss_of)(p)), params


def main():
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.mrgcn import module_names

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    modules_config = (
        ("xsd.numeric", ()), ("xsd.gYear", ()), ("xsd.string", ()),
        ("blob.image", ()))
    names = module_names(modules_config)
    variants = [("all", None, True),
                ("no_text", set(names) - {names[2]}, True),
                ("no_image", set(names) - {names[3]}, True),
                ("graph_only", set(), True)]
    if "--eval" in sys.argv:
        # train-mode-cost isolation: same subsets with train=False
        variants = [(f"eval_{lbl}", s, False) for lbl, s, _ in variants]
    for label, subset, train in variants:
        step, params = build_step(subset, train=train)
        report(f"{label}_fwd_bwd_ms", per_iter_time(step, params, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
