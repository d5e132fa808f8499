"""Round-3 TPU batch I: localise the LP embed-backward composition gap.

r3h: the full-step residual lives INSIDE the composed embed backward —
embed_proxy_bwd = 114.1 ms while the isolated parts sum to ~64 ms
(basis-stream layer-1 fwd+bwd 30.1 + grouped layer-2 dHW 34.1).
Optimizer (0.3 ms) and corruption (0.0 ms) are innocent.

Hypothesis: an XLA cross-layer fusion/layout effect — fusing a layer's
producer into the next layer's gathers (or the backward scatters) knocks
them off the fast emitter, same pathology class as the round-3 forward
compose re-tile. Experiments:

  * embed_fwd           — model.apply forward only
  * embed_bwd_both      — grads wrt all params (expect ~114, re-pin)
  * embed_bwd_l0        — grads wrt layer_0 subtree only (layer-2 d_H
                          chain still runs; layer-2 d_W does not)
  * embed_bwd_l1        — grads wrt layer_1 subtree only (no layer-1 bwd)
  * embed_bwd_barrier   — grads wrt all params with
                          MRGCN_LAYER_BARRIER=1 (optimization_barrier
                          between layers blocks cross-layer fusion)
  * hlo histogram       — op counts + while/copy/transpose tells of the
                          embed backward, dumped to
                          docs/hlo_lp_embed_bwd.txt

Then the four-regime roofline (benchmarks/roofline.py — now includes the
restricted featureless program and the multimodal regime).

Run:  python benchmarks/tpu_batch_r3i.py
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def _lp_model():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden), (hidden, hidden)],
        identity_basis=rl.basis_stream_wanted(R, n, hidden, B))
    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
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
    return model, params, edges


def lp_embed_parts():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time

    model, params, edges = _lp_model()
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def proxy(p):
        return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

    report("embed_fwd_ms", per_iter_time(
        lambda p: model.apply({"params": p}, None, edges), params,
        iters=10))

    report("embed_bwd_both_ms", per_iter_time(
        lambda p: jax.value_and_grad(proxy)(p), params, iters=10))

    for sub in ("layer_0", "layer_1"):
        fixed = {k: v for k, v in params.items() if k != sub}

        def loss_sub(psub, fixed=fixed, sub=sub):
            p = dict(fixed)
            p[sub] = psub
            return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

        report(f"embed_bwd_{sub}_ms", per_iter_time(
            lambda psub, l=loss_sub: jax.value_and_grad(l)(psub),
            params[sub], iters=10))

    os.environ["MRGCN_LAYER_BARRIER"] = "1"
    try:
        # flag is read at trace time — a fresh closure retraces
        def proxy_barrier(p):
            return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

        report("embed_bwd_barrier_ms", per_iter_time(
            lambda p: jax.value_and_grad(proxy_barrier)(p), params,
            iters=10))
    finally:
        del os.environ["MRGCN_LAYER_BARRIER"]

    print("FINAL_LP_EMBED_PARTS " + json.dumps(results), flush=True)


def hlo_embed_bwd():
    import jax
    import jax.numpy as jnp

    model, params, edges = _lp_model()

    def proxy(p):
        return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

    compiled = jax.jit(
        lambda p: jax.value_and_grad(proxy)(p)).lower(params).compile()
    text = compiled.as_text()
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= (?:\w+\[[^\]]*\] )?(\w+)\(",
                                        text))
    drop = {"parameter", "constant", "tuple", "get-tuple-element"}
    hist = {k: v for k, v in ops.most_common(24) if k not in drop}
    print("HLO op histogram:", json.dumps(hist), flush=True)
    for tell in ("while", "copy", "transpose", "scatter", "sort"):
        print(f"  {tell}: {ops.get(tell, 0)}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "hlo_lp_embed_bwd.txt")
    with open(out, "w") as f:
        f.write(text)
    print(f"full HLO written to {out} ({len(text)} bytes)", flush=True)


def roofline_all():
    from benchmarks import roofline
    roofline.main()


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== LP embed decomposition =====", flush=True)
    guarded("lp_embed_parts", lp_embed_parts)

    print("\n===== LP embed backward HLO =====", flush=True)
    guarded("hlo_embed_bwd", hlo_embed_bwd)

    print("\n===== roofline (4 regimes) =====", flush=True)
    guarded("roofline_all", roofline_all)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
