"""Kill the 793 MB physical reshape after the compose dot.

HLO analysis (micro_compose_hlo / micro_compose_prec): in-program compose
costs +10 ms over gathering from a param table because XLA (a) copies the
packed param to the dot's preferred layout (262 MB, strided) and (b)
physically re-tiles the (R, rows*128) dot output into (R*rows, 128) — the
R dim is interleaved 8-to-a-sublane-tile, so that reshape is a 793 MB
strided copy.

Variants measured here keep the table 2-D (R, cols) and index it with a
2-D gather instead of reshaping:

  * whole2d   — dot -> (R, cols); gather slice (1, 128) at (rel, col*128)
  * tdot      — tensordot 3-D output (R, rows, 128), bitcast-reshape
  * whole     — current production path (baseline)

Run:  python benchmarks/micro_compose_2d.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.torch_baseline import build_workload  # noqa: E402


def gather2d(table2d, rel, grow, lanes=128):
    """G[e] = table2d[rel[e], grow[e]*128 : (grow[e]+1)*128]."""
    import jax
    import jax.numpy as jnp
    idx = jnp.stack([rel.astype(jnp.int32),
                     grow.astype(jnp.int32) * lanes], axis=1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    return jax.lax.gather(table2d, idx, dnums, slice_sizes=(1, lanes))


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
    k, f = plan.k_in, plan.fwd

    rng = np.random.default_rng(0)
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.asarray(
        rng.standard_normal((shape[0], plan.n_in_rows, shape[2]))
        .astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    S, n_rows, lw = packed.shape
    HI = jax.lax.Precision.HIGHEST
    rows_flat = f.rel * plan.n_in_rows + f.gather_row

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    # --- production baseline ----------------------------------------------
    from mrgcn_tpu.models.rgcn import _identity_planned
    report("whole_ms", per_iter_time(
        lambda pk, c: _identity_planned(pk, c, plan, hidden),
        packed, comp, iters=10))

    # --- 2-D table: gather correctness then speed --------------------------
    flat0 = jnp.dot(comp, packed.reshape(S, -1), precision=HI,
                    preferred_element_type=jnp.float32)
    flat0 = jax.block_until_ready(flat0)
    g_ref = flat0.reshape(-1, lw)[rows_flat]
    g_2d = gather2d(flat0, f.rel, f.gather_row, lw)
    np.testing.assert_allclose(np.asarray(g_2d), np.asarray(g_ref),
                               rtol=0, atol=0)
    print("gather2d parity OK", flush=True)

    report("pre_gather2d_ms", per_iter_time(
        lambda t: gather2d(t, f.rel, f.gather_row, lw).sum(), flat0,
        iters=10))
    report("pre_gather1d_ms", per_iter_time(
        lambda t: rl._gather_sub(t.reshape(-1, lw), rows_flat, f.in_mod,
                                 k, hidden).sum(),
        flat0, iters=10))

    def whole2d(pk, c):
        t = jnp.dot(c, pk.reshape(S, -1), precision=HI,
                    preferred_element_type=jnp.float32)
        G = gather2d(t, f.rel, f.gather_row, lw)
        V = rl._select_sub(G, f.in_mod, k, hidden)
        out = rl._place_scatter(V, f.out_mod, f, plan.n_out_rows,
                                plan.k_out, hidden, lw, False)
        return rl.unpack_rows(out, plan.k_out, plan.num_nodes, hidden)
    got = jax.jit(whole2d)(packed, comp)
    ref = jax.jit(lambda pk, c: _identity_planned(pk, c, plan, hidden))(
        packed, comp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    print("whole2d parity OK", flush=True)
    report("whole2d_ms", per_iter_time(whole2d, packed, comp, iters=10))

    # --- tensordot variant --------------------------------------------------
    def whole_tdot(pk, c):
        t = jnp.tensordot(c, pk, axes=[[1], [0]], precision=HI)
        return rl.featureless_aggregate(t.reshape(-1, lw), plan, hidden)
    report("whole_tdot_ms", per_iter_time(whole_tdot, packed, comp,
                                          iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
