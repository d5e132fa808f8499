"""Round-3 TPU batch L: why is the restricted headline FORWARD 25 ms?

r3k: restricted program fwd-only 25.4 ms ~= the FULL program's forward
(25.6), while the restricted step is 26.6 ms total (backward+adam add
~1-2 ms). Parts say the restricted forward should be ~12 ms: compose
~1-2 + layer-1 streams at ~350k edges (half the full 13 ms) + grouped
output layer at ~70k edges (~2 ms). Decompose it piece by piece on the
REAL restricted EdgeBlocks:

  * compose_fwd_forced — rspmm.compose_packed, value-forced
  * l1_fwd            — _identity_planned on the restricted layer-1 plan
  * l2_fwd            — grouped output layer at frontier scale
  * model_fwd         — re-pin 25.4
  * model_bwd         — grad subsets with fixed params passed as ARGS
                        (r3k embedded 262 MB constants -> remote-compile
                        HTTP 413)

Plus: LP roofline regime re-measure on the fixed d_comp path.

Run:  python benchmarks/tpu_batch_r3l.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def _restricted_setup():
    import jax
    import jax.numpy as jnp

    from types import SimpleNamespace

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
    edges_r = restricted_layer_edges(structure, labels_idx_np, 2, edges,
                                     first_dim=hidden)
    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges_r)["params"]
    return model, params, edges_r, w


def restricted_fwd_parts():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models import rgcn as mrgcn
    from mrgcn_tpu.ops import rspmm
    from mrgcn_tpu.ops import relational as rl

    model, params, edges_r, w = _restricted_setup()
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    blk0, blk1 = edges_r[0], edges_r[1]
    hidden = w["hidden"]
    print(json.dumps({
        "blk0_edges": int(blk0.src.shape[0]),
        "blk0_num_out": int(blk0.num_out),
        "blk0_has_plans": blk0.plans is not None,
        "blk1_edges": int(blk1.src.shape[0]),
        "blk1_num_out": int(blk1.num_out),
        "blk1_grouped": bool(blk1.grouped),
    }), flush=True)

    p0 = params["layer_0"]
    comp_i, packed = p0["comp_i"], p0["weight_i_packed"]
    plan = blk0.plan_for(hidden, hidden, identity=True)
    print(json.dumps({
        "plan_kind": plan.kind,
        "plan_fwd_Epad": plan.fwd.num_padded_edges,
        "plan_n_in_rows": plan.n_in_rows,
        "plan_n_out_rows": plan.n_out_rows,
    }), flush=True)

    report("compose_fwd_ms", per_iter_time(
        lambda cp: rspmm.compose_packed(cp[0], cp[1]), (comp_i, packed),
        iters=10))

    report("l1_fwd_ms", per_iter_time(
        lambda cp: mrgcn._identity_planned(cp[1], cp[0], plan, hidden),
        (comp_i, packed), iters=10))

    report("l1_fwd_bwd_ms", per_iter_time(
        lambda cp: jax.value_and_grad(
            lambda q: jnp.sum(
                mrgcn._identity_planned(q[1], q[0], plan, hidden) ** 2)
        )(cp), (comp_i, packed), iters=10))

    # grouped output layer at frontier scale
    H = jnp.asarray(np.random.default_rng(1).standard_normal(
        (int(blk0.num_out), hidden)), jnp.float32)
    wf = params["layer_1"]["weight_f"]
    comp_f = params["layer_1"].get("comp_f")

    def l2(hv):
        h, W, c = hv
        return rspmm.transform_aggregate_grouped(
            h, blk1.grp_src, blk1.grp_dst, blk1.grp_norm,
            blk1.group_rel, blk1.group_size, blk1.num_out, W, comp=c)

    report("l2_fwd_ms", per_iter_time(l2, (H, wf, comp_f), iters=10))
    report("l2_fwd_bwd_ms", per_iter_time(
        lambda hv: jax.value_and_grad(
            lambda q: jnp.sum(l2(q) ** 2))(hv), (H, wf, comp_f),
        iters=10))

    def fwd(p):
        return model.apply({"params": p}, None, edges_r)

    report("model_fwd_ms", per_iter_time(fwd, params, iters=10))

    def proxy(p):
        return jnp.sum(fwd(p) ** 2)

    report("model_bwd_both_ms", per_iter_time(
        lambda p: jax.value_and_grad(proxy)(p), params, iters=10))

    # grad subsets with fixed params as ARGS (not jit constants)
    for sub in ("layer_0", "layer_1"):
        def loss_sub(psub, fixed, sub=sub):
            p = dict(fixed)
            p[sub] = psub
            return jnp.sum(model.apply({"params": p}, None, edges_r) ** 2)

        fixed = {k: v for k, v in params.items() if k != sub}
        report(f"model_bwd_{sub}_ms", per_iter_time(
            lambda ps, fx, l=loss_sub: jax.value_and_grad(l)(ps, fx),
            params[sub], fixed, iters=10))

    print("FINAL_RESTRICTED_FWD " + json.dumps(results), flush=True)


def lp_roofline():
    from benchmarks import roofline

    step, args, plans = roofline.lp_step()
    roofline.analyze("lp_fb15k237_epoch", step, args, plans=plans,
                     extra={"note": "bwd_h-stream d_comp (tpu_batch_r3j)"})


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== restricted fwd decomposition =====", flush=True)
    guarded("restricted_fwd_parts", restricted_fwd_parts)

    print("\n===== LP roofline (post-fix) =====", flush=True)
    guarded("lp_roofline", lp_roofline)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
