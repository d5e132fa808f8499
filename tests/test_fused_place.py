"""Fused place-scatter kernel vs the composed reference ops.

The fused kernel (pallas_gather.fused_place_scatter, interpret mode on
CPU) must reproduce exactly the composed pipeline it replaces:
expand-sub placement + norm scaling + sorted block scatter. Streams come
from real layer plans so slab padding, place slots, and block ids carry
the production invariants.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # opt-in MRGCN_FUSED_PLACE path

import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.ops import relational as rl
from mrgcn_tpu.ops.pallas_gather import fused_place_scatter, sorted_scatter


@pytest.fixture(autouse=True)
def _enable_fused(monkeypatch):
    # plan slab counts are only padded to the kernel's super-block factor
    # when the fused path is enabled (the composed default runs faster on
    # unpadded streams)
    monkeypatch.setenv("MRGCN_FUSED_PLACE", "1")


def _plan(seed=0, n=700, E=2500, R=9, k=8, kind="dense"):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    return rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                row_block=128, edge_block=64,
                                kind=kind), rng


def _composed(V, place_mod, stream, out_rows, k, d, L):
    msgs = rl._expand_sub(
        jnp.asarray(V)[:, :d] * stream.norm[:, None], place_mod, k)
    if msgs.shape[1] < L:
        msgs = jnp.pad(msgs, ((0, 0), (0, L - msgs.shape[1])))
    return sorted_scatter(msgs, stream.scatter_local, stream.scatter_blk,
                          out_rows, stream.row_block, stream.edge_block,
                          True)


@pytest.mark.parametrize("kind", ["dense", "identity"])
@pytest.mark.parametrize("d", [16, 11])
def test_fused_matches_composed_k8(kind, d):
    plans, rng = _plan(kind=kind)
    f = plans.fwd
    V = rng.standard_normal(
        (f.num_padded_edges, d)).astype(np.float32)
    got = fused_place_scatter(
        jnp.asarray(V), f.out_mod, f.norm, f.scatter_local,
        f.scatter_blk, plans.n_out_rows, plans.k_out, 128,
        f.row_block, f.edge_block, interpret=True)
    want = _composed(V, f.out_mod, f, plans.n_out_rows, plans.k_out,
                     d, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_composed_k1():
    plans, rng = _plan(k=1, n=260)
    f = plans.fwd
    d = 20                               # L = 128, k = 1
    V = rng.standard_normal((f.num_padded_edges, d)).astype(np.float32)
    got = fused_place_scatter(
        jnp.asarray(V), f.out_mod, f.norm, f.scatter_local,
        f.scatter_blk, plans.n_out_rows, 1, 128, f.row_block,
        f.edge_block, interpret=True)
    want = _composed(V, f.out_mod, f, plans.n_out_rows, 1, d, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_on_bwd_table_stream():
    """The (rel, dst)-sorted stream flushes nearly every slab — exercises
    the flush path and the relation-major output row space."""
    plans, rng = _plan(kind="identity")
    b = plans.bwd_table
    d = 16
    R_rows = 9 * plans.n_in_rows
    V = rng.standard_normal((b.num_padded_edges, d)).astype(np.float32)
    got = fused_place_scatter(
        jnp.asarray(V), b.in_mod, b.norm, b.scatter_local,
        b.scatter_blk, R_rows, plans.k_in, 128, b.row_block,
        b.edge_block, interpret=True)
    want = _composed(V, b.in_mod, b, R_rows, plans.k_in, d, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
