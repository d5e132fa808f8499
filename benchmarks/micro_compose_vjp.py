"""Train-step cost of the tensordot compose with a custom backward.

Forward: tensordot(comp, pk, [[1],[0]]) -> (R, rows, 128), relation-major,
so the (R*rows, 128) view is a free bitcast (micro_compose_2d: 15.2 ms vs
23.2 ms for the 2-D dot whose output interleaves R into sublane tiles and
needs a 793 MB physical re-tile).

Backward candidates (d_t arrives as (R, rows, 128), a free bitcast of the
featureless vjp's d_table):
  d_comp[r,b] = Σ_{i,l} d_t[r,i,l] pk[b,i,l]   — contract 2 huge dims
  d_pk[b,i,l] = Σ_r comp[r,b] d_t[r,i,l]       — contract tiny R

The historical hazard: XLA lowers einsum('rs,sgl->rgl')'s autodiff
catastrophically; measure the explicit dot_generals instead, then the full
value_and_grad of the layer with a custom_vjp compose.

Run:  python benchmarks/micro_compose_vjp.py
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

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden = w["hidden"]
    plans = rl.plans_for_layers(
        np.asarray(w["src"], np.int32), np.asarray(w["dst"], np.int32),
        np.asarray(w["rel"], np.int32), np.asarray(w["norm"], np.float32),
        n, [(None, hidden)])
    plan = plans[f"{rspmm.packing_factor(hidden)}:"
                 f"{rspmm.packing_factor(hidden)}:id"]

    rng = np.random.default_rng(0)
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(
        rng.standard_normal((shape[0], plan.n_in_rows, shape[2]))
        .astype(np.float32) / 10)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32) / 10)
    S, n_rows, lw = packed.shape
    HI = jax.lax.Precision.HIGHEST

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    d_t = jnp.asarray(
        rng.standard_normal((R, n_rows, lw)).astype(np.float32))
    d_t = jax.block_until_ready(d_t)

    report("fwd_tdot_ms", per_iter_time(
        lambda pk, c: jnp.tensordot(c, pk, axes=[[1], [0]], precision=HI),
        packed, comp, iters=10))

    report("bwd_dcomp_ms", per_iter_time(
        lambda dt, pk: jax.lax.dot_general(
            dt, pk, (((1, 2), (1, 2)), ((), ())), precision=HI),
        d_t, packed, iters=10))

    report("bwd_dpk_ms", per_iter_time(
        lambda dt, c: jax.lax.dot_general(
            c, dt, (((0,), (0,)), ((), ())), precision=HI),
        d_t, comp, iters=10))

    # ---- full layer value_and_grad: production vs tensordot+custom vjp ----
    from mrgcn_tpu.models.rgcn import _identity_planned

    def loss_prod(pk, c):
        return _identity_planned(pk, c, plan, hidden).sum()
    report("vg_prod_ms", per_iter_time(
        jax.value_and_grad(loss_prod, argnums=(0, 1)), packed, comp,
        iters=10))

    @jax.custom_vjp
    def compose3(c, pk):
        return jnp.tensordot(c, pk, axes=[[1], [0]], precision=HI)

    def compose3_fwd(c, pk):
        return compose3(c, pk), (c, pk)

    def compose3_bwd(res, d_t3):
        c, pk = res
        d_c = jax.lax.dot_general(d_t3, pk, (((1, 2), (1, 2)), ((), ())),
                                  precision=HI)
        d_pk = jax.lax.dot_general(c, d_t3, (((0,), (0,)), ((), ())),
                                   precision=HI)
        return d_c, d_pk

    compose3.defvjp(compose3_fwd, compose3_bwd)

    def loss_new(pk, c):
        t = compose3(c, pk).reshape(-1, lw)
        return rl.featureless_aggregate(t, plan, hidden).sum()
    # parity fwd+grad
    v0, g0 = jax.value_and_grad(loss_prod, argnums=(0, 1))(packed, comp)
    v1, g1 = jax.value_and_grad(loss_new, argnums=(0, 1))(packed, comp)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    print("vjp parity OK", flush=True)
    report("vg_new_ms", per_iter_time(
        jax.value_and_grad(loss_new, argnums=(0, 1)), packed, comp,
        iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
