"""Decompose the bench train step: forward vs grad vs optimizer vs paths."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks.torch_baseline import build_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import rspmm

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]

    edges = EdgeBlock(src=jnp.asarray(w["src"], dtype=jnp.int32),
                      dst=jnp.asarray(w["dst"], dtype=jnp.int32),
                      rel=jnp.asarray(w["rel"], dtype=jnp.int32),
                      norm=jnp.asarray(w["norm"]),
                      num_out=n)

    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    labels_idx = jnp.asarray(w["labels_idx"], dtype=jnp.int32)
    labels_cls = jnp.asarray(w["labels_cls"], dtype=jnp.int32)

    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        out = model.apply({"params": p}, None, edges)
        logits = out[labels_idx]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels_cls).mean()

    def timeit(fn, *args, steps=5):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    results = {}
    results["forward"] = timeit(jax.jit(loss_fn), params)
    results["grad"] = timeit(jax.jit(jax.grad(loss_fn)), params)

    @jax.jit
    def adam_only(params, opt_state):
        grads = jax.tree.map(jnp.zeros_like, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    results["adam_update"] = timeit(adam_only, params, opt_state)

    # layer-1 featureless packed gather alone (fwd + grad)
    wi = params["layer_0"]["weight_i_packed"]
    ci = params["layer_0"]["comp_i"]
    _, k = rspmm.packed_identity_shape(B, n, hidden)

    @jax.jit
    def l1_fwd(wi, ci):
        return rspmm.gather_aggregate_packed(
            wi, edges.src, edges.dst, edges.rel, edges.norm, n, hidden, k,
            comp=ci)

    results["layer1_packed_fwd"] = timeit(l1_fwd, wi, ci)

    @jax.jit
    def l1_grad(wi, ci):
        return jax.grad(lambda a, b: l1_fwd(a, b).sum())(wi, ci)

    results["layer1_packed_grad"] = timeit(l1_grad, wi, ci)

    # layer-2 transform alone
    H = jnp.ones((n, hidden), dtype=jnp.float32)
    wf = params["layer_1"]["weight_f"]
    cf = params["layer_1"]["comp_f"]

    @jax.jit
    def l2_fwd(H, wf, cf):
        return rspmm.transform_aggregate(H, edges.src, edges.dst, edges.rel,
                                         edges.norm, n, wf, comp=cf)

    results["layer2_transform_fwd"] = timeit(l2_fwd, H, wf, cf)

    print(json.dumps({k: round(v, 6) for k, v in results.items()}))


if __name__ == "__main__":
    main()
