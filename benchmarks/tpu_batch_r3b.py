"""One-shot TPU experiment batch (round 3, resumed session).

Axon TPU claims are slow — batch every open measurement into one process:

  1. micro_bwd_parts          — backward-side decomposition at bench scale
  2. micro_compose_bwd_variants — XLA/Pallas variants of the compose vjp
  3. full featureless train step, fused compose-bwd OFF vs ON
     (MRGCN_FUSED_COMPOSE_BWD routes models/rgcn._identity_planned through
     ops/relational.featureless_composed)

Run:  python benchmarks/tpu_batch_r3b.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step_time_with_flag(fused: str) -> float:
    """Featureless bench-scale train step time with the fused-bwd flag."""
    os.environ["MRGCN_FUSED_COMPOSE_BWD"] = fused
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.timing import per_iter_time
    from benchmarks.torch_baseline import build_workload
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

    def loss_fn(p):
        out = model.apply({"params": p}, None, edges)
        return optax.softmax_cross_entropy_with_integer_labels(
            out[labels_idx], labels_cls).mean()

    def full(p, st):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = optimizer.update(grads, st, p)
        return optax.apply_updates(p, updates)

    return per_iter_time(full, params, opt_state, iters=10) * 1e3


def run_script(mod_name: str):
    print(f"\n===== {mod_name} =====", flush=True)
    mod = __import__(f"benchmarks.{mod_name}", fromlist=["main"])
    mod.main()


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    run_script("micro_bwd_parts")
    run_script("micro_compose_bwd_variants")

    print("\n===== fused compose-bwd step =====", flush=True)
    off = step_time_with_flag("0")
    print(json.dumps({"step_fused_off_ms": round(off, 3)}), flush=True)
    on = step_time_with_flag("1")
    print(json.dumps({"step_fused_on_ms": round(on, 3)}), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
