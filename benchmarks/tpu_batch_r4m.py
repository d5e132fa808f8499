"""One-shot TPU batch (round 4): the fused scatter+dot basis backward.

  1. isolated featureless_basis fwd+bwd at LP scale, flag off vs on.
  2. LP epoch, flag off vs on (the default decision).

Run:  python benchmarks/tpu_batch_r4m.py  (fresh process only)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def report(tag, payload):
    RESULTS[tag] = payload
    print(tag, json.dumps(payload), flush=True)


def basis_bwd_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    rng = np.random.default_rng(3)
    plan_i = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n, [(None, hidden)],
        identity_basis=True)["1:1:idb"]
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    packed = packed[:, :plan_i.n_in_rows, :]
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    def loss(cp, pl):
        return jnp.sum(rl.featureless_basis(cp[0], cp[1], pl, hidden) ** 2)

    out = {}
    for flag, tag in ((None, "off"), ("1", "on")):
        if flag is None:
            os.environ.pop("MRGCN_FUSED_BASIS_BWD", None)
        else:
            os.environ["MRGCN_FUSED_BASIS_BWD"] = flag
        out[f"basis_bwd_{tag}_ms"] = round(per_iter_time(
            lambda x, pl: jax.value_and_grad(loss)(x, pl),
            (comp, packed), plan_i, iters=10) * 1e3, 3)
    # numeric cross-check of the grads at bench scale
    os.environ.pop("MRGCN_FUSED_BASIS_BWD", None)
    g0 = jax.grad(lambda x: loss(x, plan_i))((comp, packed))
    os.environ["MRGCN_FUSED_BASIS_BWD"] = "1"
    g1 = jax.grad(lambda x: loss(x, plan_i))((comp, packed))
    os.environ.pop("MRGCN_FUSED_BASIS_BWD", None)
    dc = float(jnp.max(jnp.abs(g0[0] - g1[0])))
    dp = float(jnp.max(jnp.abs(g0[1] - g1[1])))
    out["dcomp_maxdiff"] = dc
    out["dpacked_maxdiff"] = dp
    report("FINAL_BASIS_BWD_AB", out)


def lp_epochs():
    from benchmarks.bench_suite import bench_lp
    for flag, tag in ((None, "lp_epoch_off_s"), ("1", "lp_epoch_on_s")):
        if flag is None:
            os.environ.pop("MRGCN_FUSED_BASIS_BWD", None)
        else:
            os.environ["MRGCN_FUSED_BASIS_BWD"] = flag
        try:
            epoch, _ = bench_lp()
            report(tag, round(epoch, 6))
        except Exception as exc:
            report(tag, f"{type(exc).__name__}: {exc}")
    os.environ.pop("MRGCN_FUSED_BASIS_BWD", None)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("basis_bwd_ab", basis_bwd_ab)
    guarded("lp_epochs", lp_epochs)
    print("FINAL_R4M", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
