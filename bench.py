"""Headline benchmark: DMG-scale full-batch R-GCN training epoch.

Workload (matching benchmarks/torch_baseline.py exactly): n=100k nodes,
R=121 relations (60 properties + inverses + self-loop), 700k edges, basis
decomposition B=40, featureless 2-layer R-GCN (16 hidden, 14 classes), CE
loss over 10k labelled nodes, Adam + global-norm clip. One epoch = one
full-batch train step.

Prints ONE JSON line:
    {"metric": ..., "value": <epoch seconds>, "unit": "s",
     "vs_baseline": <baseline_s / ours_s>,
     "featureless_nc_epoch_s": ..., "multimodal_nc_epoch_s": ...,
     "multimodal_vs_baseline": ..., "lp_epoch_s": ..., "lp_vs_baseline": ...}

The headline metric/value/vs_baseline stay the featureless NC epoch; the
payload additionally carries the multimodal NC and LP FB15k-237 epochs
(benchmarks/bench_suite.py) so regressions in any regime show up in the
round snapshots. ``vs_baseline`` ratios compare against the torch-CPU epoch
times in ``bench_baseline.json`` (measured once on this machine with
benchmarks/torch_baseline.py, torch_multimodal_baseline.py,
torch_lp_baseline.py). MRGCN_BENCH_HEADLINE_ONLY=1 skips the extra regimes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchmarks.torch_baseline import build_workload  # noqa: E402


def run_jax_epochs(w, steps: int = 10) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]

    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import relational as rl
    src_np = np.asarray(w["src"], dtype=np.int32)
    dst_np = np.asarray(w["dst"], dtype=np.int32)
    rel_np = np.asarray(w["rel"], dtype=np.int32)
    norm_np = np.asarray(w["norm"], dtype=np.float32)
    grouping = group_by_relation(src_np, dst_np, rel_np, norm_np, n)
    plans = rl.plans_for_layers(src_np, dst_np, rel_np, norm_np, n,
                                [(None, hidden), (hidden, C)])
    edges = EdgeBlock(src=jnp.asarray(w["src"], dtype=jnp.int32),
                      dst=jnp.asarray(w["dst"], dtype=jnp.int32),
                      rel=jnp.asarray(w["rel"], dtype=jnp.int32),
                      norm=jnp.asarray(w["norm"]),
                      num_out=n,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size,
                      plans=plans)

    # frontier-restricted layers — the NC driver's default full-batch path
    # (tasks/common.restricted_layer_edges): the output layer aggregates
    # only at the 10k labelled nodes, layer 1 only at their in-neighbour
    # frontier; loss and gradients are identical because every dropped
    # row receives zero cotangent. MRGCN_RESTRICT_OUT=0 reverts to the
    # full program for comparison.
    labels_idx_np = np.asarray(w["labels_idx"])
    labels_cls_np = np.asarray(w["labels_cls"])
    if os.environ.get("MRGCN_RESTRICT_OUT", "1") != "0":
        from types import SimpleNamespace

        from mrgcn_tpu.tasks.common import restricted_layer_edges
        order = np.argsort(labels_idx_np, kind="stable")
        labels_idx_np = labels_idx_np[order]
        labels_cls_np = labels_cls_np[order]
        structure = SimpleNamespace(src=src_np, dst=dst_np, rel=rel_np,
                                    norm=norm_np, num_nodes=n)
        edges = restricted_layer_edges(structure, labels_idx_np, 2, edges,
                                       first_dim=hidden)
        labels_idx = jnp.arange(len(labels_idx_np), dtype=jnp.int32)
    else:
        labels_idx = jnp.asarray(labels_idx_np, dtype=jnp.int32)
    labels_cls = jnp.asarray(labels_cls_np, dtype=jnp.int32)

    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]

    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(0.01))
    opt_state = optimizer.init(params)

    def train_step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, None, edges)
            logits = out[labels_idx]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_cls).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Timing protocol (see benchmarks/timing.py): jax.block_until_ready
    # does NOT synchronize on the axon remote backend, and buffers that
    # cross separate jit dispatches are materialised through the tunnel
    # (~1 s for this model's 0.5 GB state — an artifact a real deployment
    # never pays: training loops run device-resident). So run K dependent
    # steps inside ONE jit via fori_loop, fetch the final loss, and
    # subtract the 1-step run.
    @jax.jit
    def run_epochs(params, opt_state, k):
        def body(_, carry):
            params, opt_state, _ = carry
            return train_step(params, opt_state)
        params, opt_state, loss = jax.lax.fori_loop(
            0, k, body, (params, opt_state, jnp.float32(0)))
        return params, opt_state, loss

    def run(params, opt_state, k):
        t0 = time.time()
        params, opt_state, loss = run_epochs(params, opt_state,
                                             jnp.int32(k))
        float(loss)   # device->host fetch forces completion
        return time.time() - t0, params, opt_state

    _, params, opt_state = run(params, opt_state, 1)  # compile + warmup

    t1s, tks = [], []
    for _ in range(3):
        t1, params, opt_state = run(params, opt_state, 1)
        tk, params, opt_state = run(params, opt_state, steps + 1)
        t1s.append(t1)
        tks.append(tk)
    return float((np.median(tks) - np.median(t1s)) / steps)


def _backend_or_die() -> None:
    """Fail loudly when the axon tunnel is down instead of hanging forever.

    PJRT init on a dead tunnel blocks indefinitely (observed >20 min,
    SIGTERM-immune) at "Initializing backend 'axon'". Probe the backend in
    a daemon thread with a bounded wait (MRGCN_BENCH_INIT_TIMEOUT seconds,
    default 900) and emit the JSON result line with an error marker on
    timeout, so the driver records a failed measurement rather than a
    stalled process."""
    import threading

    done = threading.Event()

    def probe():
        import jax
        jax.devices()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    budget = float(os.environ.get("MRGCN_BENCH_INIT_TIMEOUT", "900"))
    if not done.wait(budget):
        print(json.dumps({
            "metric": "dmg_scale_rgcn_epoch_time",
            "value": -1.0,
            "unit": "s",
            "vs_baseline": -1.0,
            "error": f"device backend failed to initialise within "
                     f"{budget:.0f}s (axon tunnel down?)",
        }), flush=True)
        os._exit(2)


def main() -> int:
    _backend_or_die()
    w = build_workload()
    ours_s = run_jax_epochs(w)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    baseline = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)

    def ratio(key: str, ours: float) -> float:
        ref = baseline.get(key, -1.0)
        return round(ref / ours, 3) if ref > 0 and ours > 0 else -1.0

    payload = {
        "metric": "dmg_scale_rgcn_epoch_time",
        "value": round(ours_s, 6),
        "unit": "s",
        "vs_baseline": ratio("torch_cpu_epoch_s", ours_s),
        "featureless_nc_epoch_s": round(ours_s, 6),
    }

    # the other two production regimes (VERDICT r3 #6): a regression in
    # multimodal NC or LP becomes visible in the round-snapshot JSON.
    # MRGCN_BENCH_HEADLINE_ONLY=1 skips them (quick iteration runs).
    if os.environ.get("MRGCN_BENCH_HEADLINE_ONLY") != "1":
        from benchmarks import bench_suite
        try:
            mm_s = bench_suite.bench_multimodal()
            payload["multimodal_nc_epoch_s"] = round(mm_s, 6)
            payload["multimodal_vs_baseline"] = ratio(
                "torch_cpu_multimodal_epoch_s", mm_s)
        except Exception as exc:  # record, don't lose the headline
            payload["multimodal_error"] = f"{type(exc).__name__}: {exc}"
        try:
            lp_s, _ = bench_suite.bench_lp()
            payload["lp_epoch_s"] = round(lp_s, 6)
            payload["lp_vs_baseline"] = ratio("torch_cpu_lp_epoch_s", lp_s)
        except Exception as exc:
            payload["lp_error"] = f"{type(exc).__name__}: {exc}"

    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
