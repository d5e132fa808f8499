"""Round-3 TPU batch J: validate the bwd_h-stream d_comp fix.

r3i localised the LP "composition residual": grads wrt layer_0 cost
108.4 ms of the 114 ms embed backward, and the isolated layer-1 number
(30.1 ms) had only ever differentiated the packed tables — d_comp ran on
the (rel, dst)-sorted bwd_table stream, whose (block, relation) slab
split pads 6.32x at LP scale (3.53M rows vs 559k edges). The fix moves
d_comp onto the 1.01x-padded bwd_h stream, reusing the d_packed branch's
d_out gather (ops/relational._featureless_basis_bwd).

Measurements:
  * basis_bwd_old / basis_bwd_new — isolated featureless_basis
    value_and_grad wrt (comp, packed), MRGCN_DCOMP_TSTREAM=1 vs default
  * embed_bwd_new — composed 2-layer embed backward (was 114.1)
  * lp_epoch_new  — full LP train epoch (was 134.7)
  * bench_headline — bench.py chain unchanged (regression guard)

Run:  python benchmarks/tpu_batch_r3j.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def basis_bwd_ab():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import relational as rl

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    from mrgcn_tpu.ops import rspmm

    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden)],
        identity_basis=True)
    plan = plans["1:1:idb"]
    shape, k = rspmm.packed_identity_shape(B, n, hidden)
    rng = np.random.default_rng(3)
    comp = jnp.asarray(rng.standard_normal((R, B)) * 0.1, jnp.float32)
    packed = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)
    packed = packed[:, :plan.n_in_rows, :] if \
        shape[1] >= plan.n_in_rows else jnp.pad(
            packed, ((0, 0), (0, plan.n_in_rows - shape[1]), (0, 0)))
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    def loss(cp):
        c, p = cp
        return jnp.sum(rl.featureless_basis(c, p, plan, hidden) ** 2)

    for label, env in (("basis_bwd_new_ms", None),
                       ("basis_bwd_old_ms", "1")):
        if env is None:
            os.environ.pop("MRGCN_DCOMP_TSTREAM", None)
        else:
            os.environ["MRGCN_DCOMP_TSTREAM"] = env
        try:
            report(label, per_iter_time(
                lambda cp: jax.value_and_grad(loss)(cp), (comp, packed),
                iters=10))
        finally:
            os.environ.pop("MRGCN_DCOMP_TSTREAM", None)

    # numerical agreement of the two formulations on device
    gnew = jax.jit(jax.grad(loss))((comp, packed))
    os.environ["MRGCN_DCOMP_TSTREAM"] = "1"
    try:
        gold = jax.jit(jax.grad(loss))((comp, packed))
    finally:
        os.environ.pop("MRGCN_DCOMP_TSTREAM", None)
    dc = float(jnp.max(jnp.abs(gnew[0] - gold[0])))
    dp = float(jnp.max(jnp.abs(gnew[1] - gold[1])))
    scale = float(jnp.max(jnp.abs(gold[0])))
    print(json.dumps({"dcomp_maxdiff": dc, "dpacked_maxdiff": dp,
                      "dcomp_scale": scale}), flush=True)
    print("FINAL_BASIS_AB " + json.dumps(results), flush=True)


def embed_and_epoch():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from benchmarks.tpu_batch_r3i import _lp_model

    model, params, edges = _lp_model()

    def proxy(p):
        return jnp.sum(model.apply({"params": p}, None, edges) ** 2)

    t = per_iter_time(lambda p: jax.value_and_grad(proxy)(p), params,
                      iters=10)
    print(json.dumps({"embed_bwd_new_ms": round(t * 1e3, 3)}), flush=True)

    from benchmarks.bench_suite import bench_lp
    epoch, t_rank = bench_lp(steps=5)
    print("FINAL_LP_EPOCH_NEW " + json.dumps(
        {"lp_epoch_s": round(epoch, 6),
         "lp_rank_chunk_s": round(t_rank, 6)}), flush=True)


def bench_headline():
    from bench import run_jax_epochs
    from benchmarks.torch_baseline import build_workload

    w = build_workload()
    s = run_jax_epochs(w, steps=10)
    print("FINAL_HEADLINE " + json.dumps({"epoch_chain_s": round(s, 6)}),
          flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== basis bwd A/B (d_comp stream) =====", flush=True)
    guarded("basis_bwd_ab", basis_bwd_ab)

    print("\n===== composed embed bwd + LP epoch =====", flush=True)
    guarded("embed_and_epoch", embed_and_epoch)

    print("\n===== headline regression guard =====", flush=True)
    guarded("bench_headline", bench_headline)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
