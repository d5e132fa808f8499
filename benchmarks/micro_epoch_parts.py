"""Decompose the bench epoch: forward / forward+backward / full step."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.torch_baseline import build_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]

    grouping = group_by_relation(
        np.asarray(w["src"], dtype=np.int32),
        np.asarray(w["dst"], dtype=np.int32),
        np.asarray(w["rel"], dtype=np.int32),
        np.asarray(w["norm"], dtype=np.float32), n)
    edges = EdgeBlock(src=jnp.asarray(w["src"], dtype=jnp.int32),
                      dst=jnp.asarray(w["dst"], dtype=jnp.int32),
                      rel=jnp.asarray(w["rel"], dtype=jnp.int32),
                      norm=jnp.asarray(w["norm"]),
                      num_out=n,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size)

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

    def timeit(fn, *args, steps=7):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    results = {}
    results["fwd"] = timeit(jax.jit(loss_fn), params)
    results["fwd_bwd"] = timeit(jax.jit(jax.value_and_grad(loss_fn)), params)

    @jax.jit
    def full(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    results["full_step"] = timeit(full, params, opt_state)
    print(json.dumps({k: round(v, 6) for k, v in results.items()}))


if __name__ == "__main__":
    main()
