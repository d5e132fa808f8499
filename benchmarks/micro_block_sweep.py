"""Sweep (row_block, edge_block) for the sorted-stream plans at bench
scale: full train step per configuration.

Run:  python benchmarks/micro_block_sweep.py
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
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]
    src = np.asarray(w["src"], dtype=np.int32)
    dst = np.asarray(w["dst"], dtype=np.int32)
    rel = np.asarray(w["rel"], dtype=np.int32)
    norm = np.asarray(w["norm"], dtype=np.float32)
    labels_idx = jnp.asarray(w["labels_idx"], dtype=jnp.int32)
    labels_cls = jnp.asarray(w["labels_cls"], dtype=jnp.int32)

    results = {}
    for rb, eb in [(512, 256), (512, 128), (256, 256), (1024, 256),
                   (512, 512)]:
        plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                    [(None, hidden), (hidden, C)],
                                    row_block=rb, edge_block=eb)
        edges = EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                          rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                          num_out=n, plans=plans)
        model = RGCN(hidden_dims=(hidden, C), num_relations=R,
                     num_nodes=n, num_bases=B, featureless=True)
        params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
        optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adam(0.01))
        opt_state = optimizer.init(params)

        def full_step(p, os_):
            def loss_of(q):
                out = model.apply({"params": q}, None, edges)
                return optax.softmax_cross_entropy_with_integer_labels(
                    out[labels_idx], labels_cls).mean()
            loss, grads = jax.value_and_grad(loss_of)(p)
            updates, os2 = optimizer.update(grads, os_, p)
            return optax.apply_updates(p, updates), os2, loss

        key = f"rb{rb}_eb{eb}"
        t = per_iter_time(full_step, params, opt_state, iters=8)
        results[key] = round(t * 1e3, 3)
        print(json.dumps({key: results[key]}), flush=True)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
