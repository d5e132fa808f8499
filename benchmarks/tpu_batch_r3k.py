"""Round-3 TPU batch K: text-encoder remat A/B + restricted-step parts.

1. The multimodal epoch's wall is the text-encoder backward (~90 of
   144 ms fwd+bwd at N=8k, L=128, d=128, 2 blocks, h1, bf16). The
   encoder is HBM-bound on (N, L, d)-scale activations, so block remat
   (models/encoders.TextEncoder(remat=True)) recomputes them instead of
   writing + re-reading HBM. A/B here decides the default.

2. The restricted headline program (26.6 ms step) has no decomposition
   yet — time fwd / per-layer grad subsets to see what the next NC
   lever would be.

Run:  python benchmarks/tpu_batch_r3k.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def text_remat_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    N, L = 8_000, 128
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 259, (N, L)), jnp.int32)
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    params = None
    for label, remat in (("enc_h1_fwd_bwd_ms", False),
                         ("enc_h1_remat_fwd_bwd_ms", True)):
        enc = TextEncoder(output_dim=16, remat=remat)
        if params is None:
            params = enc.init(jax.random.PRNGKey(0), toks)["params"]

        def loss(p, enc=enc):
            return jnp.sum(enc.apply({"params": p}, toks) ** 2)

        report(label, per_iter_time(
            lambda p, l=loss: jax.value_and_grad(l)(p), params, iters=10))

    print("FINAL_TEXT_REMAT " + json.dumps(results), flush=True)


def restricted_grad_parts():
    """Per-layer grad subsets of the restricted headline program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from types import SimpleNamespace

    from benchmarks.timing import per_iter_time
    from benchmarks.torch_baseline import build_workload
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.tasks.common import restricted_layer_edges

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]
    plans = rl.plans_for_layers(w["src"], w["dst"], w["rel"], w["norm"],
                                n, [(None, hidden), (hidden, C)])
    edges = EdgeBlock(src=jnp.asarray(w["src"]), dst=jnp.asarray(w["dst"]),
                      rel=jnp.asarray(w["rel"]),
                      norm=jnp.asarray(w["norm"]), num_out=n, plans=plans)
    labels_idx_np = np.sort(np.asarray(w["labels_idx"], dtype=np.int32))
    structure = SimpleNamespace(src=w["src"], dst=w["dst"], rel=w["rel"],
                                norm=w["norm"], num_nodes=n)
    edges = restricted_layer_edges(structure, labels_idx_np, 2, edges,
                                   first_dim=hidden)
    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def proxy(p):
        return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

    report("r_fwd_ms", per_iter_time(
        lambda p: model.apply({"params": p}, None, edges), params,
        iters=10))
    report("r_bwd_both_ms", per_iter_time(
        lambda p: jax.value_and_grad(proxy)(p), params, iters=10))
    for sub in ("layer_0", "layer_1"):
        fixed = {k: v for k, v in params.items() if k != sub}

        def loss_sub(psub, fixed=fixed, sub=sub):
            p = dict(fixed)
            p[sub] = psub
            return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

        report(f"r_bwd_{sub}_ms", per_iter_time(
            lambda ps, l=loss_sub: jax.value_and_grad(l)(ps),
            params[sub], iters=10))

    # optimizer over the full param set
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)
    _, grads = jax.jit(lambda p: jax.value_and_grad(proxy)(p))(params)

    def opt_only(g):
        updates, o = optimizer.update(g, opt_state, params)
        return optax.apply_updates(params, updates), o

    report("r_opt_only_ms", per_iter_time(opt_only, grads, iters=10))
    print("FINAL_RESTRICTED_PARTS " + json.dumps(results), flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== text encoder remat A/B =====", flush=True)
    guarded("text_remat_ab", text_remat_ab)

    print("\n===== restricted headline grad parts =====", flush=True)
    guarded("restricted_grad_parts", restricted_grad_parts)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
