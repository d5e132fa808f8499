"""Oracle tests for the plan-driven (gather-fused) aggregation paths.

The planned paths must match the brute-force dense oracle
(``rspmm.reference_dense_check``) and the unplanned execution strategies
bit-for-bit in forward math (f32 one-hot gather is exact) and closely in
gradients (summation order differs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrgcn_tpu.ops import pallas_gather as pg
from mrgcn_tpu.ops import rspmm


def random_graph(seed=0, n=57, R=7, E=311):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    return src, dst, rel, norm, n, R, E


def make_plan(src, dst, rel, norm, n, k, row_block=16, edge_block=8):
    host = pg.build_gather_plan(src, dst, rel, norm, n, k,
                                row_block=row_block, edge_block=edge_block)
    return pg.DevicePlan.from_host(host)


@pytest.mark.parametrize("k", [1, 4, 8])
def test_plan_layout_invariants(k):
    src, dst, rel, norm, n, R, E = random_graph()
    host = pg.build_gather_plan(src, dst, rel, norm, n, k,
                                row_block=16, edge_block=8)
    eb = host.edge_block
    assert host.num_padded_edges % eb == 0
    assert host.num_blocks == host.num_padded_edges // eb
    live = host.norm > 0
    assert live.sum() == (norm > 0).sum()
    # every slab has one relation and one table block
    local = host.local.reshape(-1)
    blk_rel = np.repeat(host.block_rel, eb)
    blk_tbl = np.repeat(host.block_tbl, eb)
    prow = blk_tbl * host.row_block + np.minimum(local,
                                                 host.row_block - 1)
    recon_dst = prow * k + host.dst_mod
    # live slots reconstruct (rel, dst, src, norm) as a multiset
    got = sorted(zip(blk_rel[live], recon_dst[live], host.src[live],
                     host.norm[live].round(6)))
    want = sorted(zip(rel[norm > 0], dst[norm > 0], src[norm > 0],
                      norm[norm > 0].round(6)))
    assert got == want
    # padding slots: no one-hot match, zero weight, dropped scatter target
    pad = ~live
    assert np.all(local[pad] == host.row_block)
    assert np.all(host.src[pad] == n)


@pytest.mark.parametrize("out_dim,comp_on", [(16, True), (16, False),
                                             (14, True), (200, True),
                                             (96, False)])
def test_featureless_planned_vs_oracle(out_dim, comp_on):
    src, dst, rel, norm, n, R, E = random_graph(seed=out_dim)
    rng = np.random.default_rng(1)
    B = 3 if comp_on else R
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32)) \
        if comp_on else None

    (shape, k) = rspmm.packed_identity_shape(B, n, out_dim)
    plan = make_plan(src, dst, rel, norm, n, k)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    relj, normj = jnp.asarray(rel), jnp.asarray(norm)

    if k > 1:
        packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = rspmm.gather_aggregate_planned(plan, n, out_dim,
                                             packed=packed, comp=comp)
        want = rspmm.gather_aggregate_packed(packed, srcj, dstj, relj,
                                             normj, n, out_dim, k,
                                             comp=comp)
    else:
        nw = jnp.asarray(
            rng.standard_normal((B, n, out_dim)).astype(np.float32))
        got = rspmm.gather_aggregate_planned(plan, n, out_dim,
                                             node_weights=nw, comp=comp)
        want = rspmm.gather_aggregate(nw, srcj, dstj, relj, normj, n,
                                      comp=comp)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("in_dim,out_dim,comp_on",
                         [(16, 14, True), (16, 16, False), (200, 200, True),
                          (70, 30, False)])
def test_dense_planned_vs_oracle(in_dim, out_dim, comp_on):
    src, dst, rel, norm, n, R, E = random_graph(seed=in_dim + out_dim)
    rng = np.random.default_rng(2)
    B = 3 if comp_on else R
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32)) \
        if comp_on else None
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(
        rng.standard_normal((B, in_dim, out_dim)).astype(np.float32))

    k = rspmm.packing_factor(in_dim)
    plan = make_plan(src, dst, rel, norm, n, k)
    got = rspmm.transform_aggregate_planned(H, plan, basis, comp, n)
    assert got is not None

    W = rspmm._compose_weights(basis, comp)
    want = rspmm.reference_dense_check(H, jnp.asarray(src),
                                       jnp.asarray(dst), jnp.asarray(rel),
                                       jnp.asarray(norm), n, R, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_planned_gradients_match_unplanned():
    src, dst, rel, norm, n, R, E = random_graph(seed=9)
    rng = np.random.default_rng(3)
    B, in_dim, out_dim = 3, 16, 14
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(
        rng.standard_normal((B, in_dim, out_dim)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((n, out_dim)).astype(np.float32))

    k = rspmm.packing_factor(in_dim)
    plan = make_plan(src, dst, rel, norm, n, k)

    def loss_planned(H, basis, comp):
        return jnp.vdot(
            rspmm.transform_aggregate_planned(H, plan, basis, comp, n), cot)

    def loss_ref(H, basis, comp):
        W = rspmm._compose_weights(basis, comp)
        return jnp.vdot(
            rspmm.reference_dense_check(H, jnp.asarray(src),
                                        jnp.asarray(dst), jnp.asarray(rel),
                                        jnp.asarray(norm), n, R, W), cot)

    g1 = jax.grad(loss_planned, argnums=(0, 1, 2))(H, basis, comp)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(H, basis, comp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_featureless_gradients_with_comp():
    src, dst, rel, norm, n, R, E = random_graph(seed=11)
    rng = np.random.default_rng(4)
    B, out_dim = 3, 16
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    shape, k = rspmm.packed_identity_shape(B, n, out_dim)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    plan = make_plan(src, dst, rel, norm, n, k)
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    relj, normj = jnp.asarray(rel), jnp.asarray(norm)

    def loss_planned(packed, comp):
        return jnp.vdot(rspmm.gather_aggregate_planned(
            plan, n, out_dim, packed=packed, comp=comp), cot)

    def loss_ref(packed, comp):
        return jnp.vdot(rspmm.gather_aggregate_packed(
            packed, srcj, dstj, relj, normj, n, out_dim, k, comp=comp),
            cot)

    g1 = jax.grad(loss_planned, argnums=(0, 1))(packed, comp)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(packed, comp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_rgcn_model_planned_parity():
    """Full 2-layer featureless RGCN: planned vs unplanned forward + grads."""
    import optax
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    src, dst, rel, norm, n, R, E = random_graph(seed=21)
    plans = pg.plans_for_widths(src, dst, rel, norm, n, [16],
                                row_block=16, edge_block=8)
    base = dict(src=jnp.asarray(src), dst=jnp.asarray(dst),
                rel=jnp.asarray(rel), norm=jnp.asarray(norm), num_out=n)
    edges_plain = EdgeBlock(**base)
    edges_plan = EdgeBlock(**base, plans=plans)

    model = RGCN(hidden_dims=(16, 5), num_relations=R, num_nodes=n,
                 num_bases=3, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges_plain)["params"]
    labels = jnp.asarray(
        np.random.default_rng(5).integers(0, 5, n).astype(np.int32))

    def loss(p, e):
        out = model.apply({"params": p}, None, e)
        return optax.softmax_cross_entropy_with_integer_labels(
            out, labels).mean()

    l1, g1 = jax.value_and_grad(loss)(params, edges_plain)
    l2, g2 = jax.value_and_grad(loss)(params, edges_plan)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_pallas_kernel_interpret_parity(monkeypatch):
    """The Pallas kernel (interpret mode) matches the XLA fallback."""
    src, dst, rel, norm, n, R, E = random_graph(seed=31, n=40, E=150)
    rng = np.random.default_rng(6)
    B, in_dim, out_dim = 3, 16, 14
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(
        rng.standard_normal((B, in_dim, out_dim)).astype(np.float32))
    k = rspmm.packing_factor(in_dim)
    plan = make_plan(src, dst, rel, norm, n, k)

    want = rspmm.transform_aggregate_planned(H, plan, basis, comp, n)
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    got = rspmm.transform_aggregate_planned(H, plan, basis, comp, n,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients through the interpret-mode kernel too
    def loss(H, basis, comp, interp):
        return jnp.vdot(rspmm.transform_aggregate_planned(
            H, plan, basis, comp, n, interpret=interp), want)

    monkeypatch.delenv("MRGCN_FORCE_PALLAS_GATHER")
    g_x = jax.grad(loss, argnums=(0, 1, 2))(H, basis, comp, False)
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    g_p = jax.grad(loss, argnums=(0, 1, 2))(H, basis, comp, True)
    for a, b in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_featureless_pallas_interpret_parity(monkeypatch):
    src, dst, rel, norm, n, R, E = random_graph(seed=41, n=40, E=150)
    rng = np.random.default_rng(7)
    B, out_dim = 3, 16
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    shape, k = rspmm.packed_identity_shape(B, n, out_dim)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    plan = make_plan(src, dst, rel, norm, n, k)

    want = rspmm.gather_aggregate_planned(plan, n, out_dim, packed=packed,
                                          comp=comp)
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    got = rspmm.gather_aggregate_planned(plan, n, out_dim, packed=packed,
                                         comp=comp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
