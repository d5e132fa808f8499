"""Variants of the compose_packed backward pair (d_comp, d_packed).

NEXT.md round-3 candidate 2, step 2 (after micro_bwd_parts.py isolates the
cost): the two vjp dots read the (R*rows, L) d_table twice — this sweeps
pure-XLA reformulations and (when present) the fused Pallas single-pass
before committing to a kernel. All variants compute

    d_comp  = einsum('rql,bql->rb', d_t, packed)    # (R, B)
    d_packed = einsum('rb,rql->bql', comp, d_t)     # (B, rows, L)

and are checked against the baseline to 1e-4 relative before timing.

Run:  python benchmarks/micro_compose_bwd_variants.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R, B, ROWS, L = 121, 40, 12800, 128
CHUNK = 1600  # rows per scan chunk for the single-pass variant


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time

    HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    d_t = jnp.asarray(rng.standard_normal((R, ROWS, L), dtype=np.float32))
    pk = jnp.asarray(rng.standard_normal((B, ROWS, L), dtype=np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B), dtype=np.float32))

    def baseline(dt):
        d_comp = jax.lax.dot_general(
            dt, pk, (((1, 2), (1, 2)), ((), ())), precision=HI)
        d_packed = jax.lax.dot_general(
            comp, dt, (((0,), (0,)), ((), ())), precision=HI)
        return d_comp, d_packed

    def only_dcomp(dt):
        return jax.lax.dot_general(
            dt, pk, (((1, 2), (1, 2)), ((), ())), precision=HI)

    def only_dpacked(dt):
        return jax.lax.dot_general(
            comp, dt, (((0,), (0,)), ((), ())), precision=HI)

    def pair_default_prec(dt):
        d_comp = jax.lax.dot_general(
            dt, pk, (((1, 2), (1, 2)), ((), ())))
        d_packed = jax.lax.dot_general(
            comp, dt, (((0,), (0,)), ((), ())))
        return d_comp, d_packed

    def pair_2d(dt):
        dt2 = dt.reshape(R, ROWS * L)
        d_comp = jax.lax.dot_general(
            dt2, pk.reshape(B, ROWS * L), (((1,), (1,)), ((), ())),
            precision=HI)
        d_packed = jax.lax.dot_general(
            comp, dt2, (((0,), (0,)), ((), ())),
            precision=HI).reshape(B, ROWS, L)
        return d_comp, d_packed

    def pair_scan(dt):
        """One pass over d_t in row chunks: both contractions per chunk."""
        dtc = dt.reshape(R, ROWS // CHUNK, CHUNK, L).transpose(1, 0, 2, 3)
        pkc = pk.reshape(B, ROWS // CHUNK, CHUNK, L).transpose(1, 0, 2, 3)

        def body(acc, xs):
            dti, pki = xs
            dc = jax.lax.dot_general(
                dti, pki, (((1, 2), (1, 2)), ((), ())), precision=HI)
            dp = jax.lax.dot_general(
                comp, dti, (((0,), (0,)), ((), ())), precision=HI)
            return acc + dc, dp

        d_comp, dps = jax.lax.scan(
            body, jnp.zeros((R, B), jnp.float32), (dtc, pkc))
        d_packed = dps.transpose(1, 0, 2, 3).reshape(B, ROWS, L)
        return d_comp, d_packed

    variants = {
        "baseline_pair_3d": baseline,
        "only_dcomp": only_dcomp,
        "only_dpacked": only_dpacked,
        "pair_default_prec": pair_default_prec,
        "pair_2d": pair_2d,
        "pair_scan": pair_scan,
    }

    try:
        from mrgcn_tpu.ops.pallas_gather import compose_grad_pass

        def pallas_pass(dt):
            return compose_grad_pass(dt.reshape(R * ROWS, L),
                                     pk.reshape(B * ROWS, L), comp, R, B)
        variants["pallas_pass"] = pallas_pass
    except ImportError:
        pass

    ref = jax.jit(baseline)(d_t)
    ref = (np.asarray(ref[0]), np.asarray(ref[1]))

    results = {}
    for name, fn in variants.items():
        out = jax.jit(fn)(d_t)
        if name not in ("only_dcomp", "only_dpacked",
                        "pair_default_prec"):
            outs = out if isinstance(out, tuple) else (out,)
            np.testing.assert_allclose(np.asarray(outs[0]), ref[0],
                                       rtol=1e-4, atol=1e-3)
            if len(outs) > 1:
                np.testing.assert_allclose(
                    np.asarray(outs[1]).reshape(B, ROWS, L), ref[1],
                    rtol=1e-4, atol=1e-3)
        ms = per_iter_time(fn, d_t, iters=10) * 1e3
        results[name] = round(ms, 3)
        print(json.dumps({name: results[name]}), flush=True)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
