"""Pallas kernel correctness (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.ops import pallas_kernels as pk
from mrgcn_tpu.ops import rspmm


def _setup(seed=0, n=300, E=900, B=3, out=8, R=7):
    rng = np.random.default_rng(seed)
    src = np.sort(rng.integers(0, n, E).astype(np.int32))
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    flat = rng.standard_normal((n, B * out)).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)
    return src, dst, rel, norm, flat, comp, n, out


def test_prepare_blocks_invariants():
    src, *_ , n, _ = _setup()
    perm, local_src, row_blocks = pk.prepare_blocks(
        src, n, edge_block=64, row_block=128)
    assert len(perm) % 64 == 0
    assert len(row_blocks) == len(perm) // 64
    # every real edge appears exactly once
    real = perm[perm >= 0]
    np.testing.assert_array_equal(np.sort(real), np.arange(len(src)))
    # local ids are consistent with the block table
    for blk in range(len(row_blocks)):
        sl = slice(blk * 64, (blk + 1) * 64)
        for p, ls in zip(perm[sl], local_src[sl]):
            if p >= 0:
                assert src[p] == row_blocks[blk] * 128 + ls


def test_pallas_matches_fused_reference():
    src, dst, rel, norm, flat, comp, n, out = _setup()
    B = comp.shape[1]

    # oracle: the XLA fused path
    oracle = rspmm._fused_basis_aggregate(
        jnp.asarray(flat), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), jnp.asarray(comp), n, out,
        budget_elems=2 ** 28)

    perm, local_src, row_blocks = pk.prepare_blocks(
        src, n, edge_block=64, row_block=128)
    got = pk.fused_gather_aggregate_pallas(
        jnp.asarray(flat), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), jnp.asarray(comp),
        jnp.asarray(perm), jnp.asarray(local_src), jnp.asarray(row_blocks),
        n, out, edge_block=64, row_block=128, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_pallas_empty_padding_rows_inert():
    src, dst, rel, norm, flat, comp, n, out = _setup(seed=1, E=70)
    perm, local_src, row_blocks = pk.prepare_blocks(
        src, n, edge_block=64, row_block=128)
    assert (perm < 0).sum() > 0  # padding exists
    got = pk.fused_gather_aggregate_pallas(
        jnp.asarray(flat), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), jnp.asarray(comp),
        jnp.asarray(perm), jnp.asarray(local_src), jnp.asarray(row_blocks),
        n, out, edge_block=64, row_block=128, interpret=True)
    oracle = rspmm._fused_basis_aggregate(
        jnp.asarray(flat), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), jnp.asarray(comp), n, out,
        budget_elems=2 ** 28)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)
