"""Sharded sorted-stream plans: shard_map engine == single-device engine.

Round 2 dropped the plan engine under a mesh (the slow XLA fallbacks ran
instead); these tests pin the round-3 design — per-shard stacked streams,
single-chip engine per device, psum over the data axis — to the
single-device results, forward and backward, on the virtual 8-device CPU
mesh.
"""


import pytest as _pytest

# tiering: exhaustive engine/backbone pins run in the slow tier;
# the quick edit-test loop keeps driver-level coverage of the
# same paths (test_mesh_training quick subset, test_models)
pytestmark = _pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.models.rgcn import (_basis_planned, _basis_planned_sharded,
                                   _dense_planned_sharded,
                                   _identity_planned,
                                   _identity_planned_sharded)
from mrgcn_tpu.ops import relational as rl
from mrgcn_tpu.ops import rspmm
from mrgcn_tpu.parallel.mesh import make_mesh


def _graph(seed=0, n=300, E=2000, R=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    return src, dst, rel, norm, n, R


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh(8)


def test_identity_sharded_matches_single(mesh):
    src, dst, rel, norm, n, R = _graph()
    B, out = 3, 16
    plan1 = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, out)])["8:8:id"]
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="identity")
    assert plan8.num_shards == 8
    assert plan8.fwd.scatter_local.shape[0] == 8

    rng = np.random.default_rng(1)
    shape, _ = rspmm.packed_identity_shape(B, n, out)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    out1 = _identity_planned(packed, comp, plan1, out)
    out8 = _identity_planned_sharded(packed, comp, plan8, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

    def loss1(pk, c):
        return (_identity_planned(pk, c, plan1, out) ** 2).sum()

    def loss8(pk, c):
        return (_identity_planned_sharded(pk, c, plan8, out, mesh)
                ** 2).sum()

    g1 = jax.grad(loss1, argnums=(0, 1))(packed, comp)
    g8 = jax.grad(loss8, argnums=(0, 1))(packed, comp)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_identity_sharded_fused_compose_bwd(mesh, monkeypatch):
    """The fused compose-backward path (MRGCN_FUSED_COMPOSE_BWD) stays
    correct inside shard_map: per-device d_t scatter + single-pass
    compose_grad_pass, psum'd over the data axis."""
    monkeypatch.setenv("MRGCN_FUSED_COMPOSE_BWD", "1")
    src, dst, rel, norm, n, R = _graph(seed=7)
    B, out = 3, 16
    plan1 = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, out)])["8:8:id"]
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="identity")
    rng = np.random.default_rng(8)
    shape, _ = rspmm.packed_identity_shape(B, n, out)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    out1 = _identity_planned(packed, comp, plan1, out)
    out8 = _identity_planned_sharded(packed, comp, plan8, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

    def loss8(pk, c):
        return (_identity_planned_sharded(pk, c, plan8, out, mesh)
                ** 2).sum()

    monkeypatch.setenv("MRGCN_FUSED_COMPOSE_BWD", "0")
    g_plain = jax.grad(loss8, argnums=(0, 1))(packed, comp)
    monkeypatch.setenv("MRGCN_FUSED_COMPOSE_BWD", "1")
    g_fused = jax.grad(loss8, argnums=(0, 1))(packed, comp)
    for a, b in zip(g_fused, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dense_sharded_matches_single(mesh):
    src, dst, rel, norm, n, R = _graph(seed=2)
    in_dim = out = 16
    plan1 = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(in_dim, out)])["8:8"]
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="dense")
    assert plan1.fwd.rel_const == plan8.fwd.rel_const

    rng = np.random.default_rng(3)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((R, in_dim, out))
                    .astype(np.float32))

    out1 = rl.dense_aggregate(H, W, plan1, in_dim, out)
    out8 = _dense_planned_sharded(H, W, plan8, in_dim, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

    def loss1(h, w):
        return (rl.dense_aggregate(h, w, plan1, in_dim, out) ** 2).sum()

    def loss8(h, w):
        return (_dense_planned_sharded(h, w, plan8, in_dim, out, mesh)
                ** 2).sum()

    g1 = jax.grad(loss1, argnums=(0, 1))(H, W)
    g8 = jax.grad(loss8, argnums=(0, 1))(H, W)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_basis_sharded_matches_single(mesh):
    """featureless_basis under shard_map (the LP-scale featureless path
    when the composed table cannot be materialised) == single device."""
    src, dst, rel, norm, n, R = _graph(seed=9)
    B, out = 3, 16
    plan1 = rl.build_layer_plans(src, dst, rel, norm, n, 8, 8,
                                 kind="identity_basis")
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="identity_basis")
    assert plan8.kind == "identity_basis"

    rng = np.random.default_rng(10)
    shape, _ = rspmm.packed_identity_shape(B, n, out)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    out1 = _basis_planned(packed, comp, plan1, out)
    out8 = _basis_planned_sharded(packed, comp, plan8, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)

    def loss1(pk, c):
        return (_basis_planned(pk, c, plan1, out) ** 2).sum()

    def loss8(pk, c):
        return (_basis_planned_sharded(pk, c, plan8, out, mesh) ** 2).sum()

    g1 = jax.grad(loss1, argnums=(0, 1))(packed, comp)
    g8 = jax.grad(loss8, argnums=(0, 1))(packed, comp)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_plan_jit_under_mesh(mesh):
    """The sharded op compiles inside an outer jit (the drivers' usage)."""
    src, dst, rel, norm, n, R = _graph(seed=4, n=120, E=600, R=4)
    B, out = 2, 16
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="identity")
    rng = np.random.default_rng(5)
    shape, _ = rspmm.packed_identity_shape(B, n, out)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    @jax.jit
    def step(pk, c):
        return _identity_planned_sharded(pk, c, plan8, out, mesh).sum()

    v = step(packed, comp)
    assert np.isfinite(float(v))


def test_basis_wide_sharded_matches_single(mesh, monkeypatch):
    """MRGCN_WIDE_BASIS=1 (combined-plane featureless_basis) under
    shard_map == the narrow single-device path."""
    src, dst, rel, norm, n, R = _graph(seed=11)
    B, out = 3, 16
    plan1 = rl.build_layer_plans(src, dst, rel, norm, n, 8, 8,
                                 kind="identity_basis")
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 8, 8, 8,
                                 kind="identity_basis")
    rng = np.random.default_rng(12)
    shape, _ = rspmm.packed_identity_shape(B, n, out)
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    monkeypatch.delenv("MRGCN_WIDE_BASIS", raising=False)
    out1 = _basis_planned(packed, comp, plan1, out)
    g1 = jax.grad(lambda pk, c: (_basis_planned(pk, c, plan1, out)
                                 ** 2).sum(), argnums=(0, 1))(packed, comp)

    monkeypatch.setenv("MRGCN_WIDE_BASIS", "1")
    out8 = _basis_planned_sharded(packed, comp, plan8, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
    g8 = jax.grad(lambda pk, c: (_basis_planned_sharded(
        pk, c, plan8, out, mesh) ** 2).sum(), argnums=(0, 1))(packed, comp)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dense_basis_sharded_matches_single(mesh):
    """dense_basis (stream-engine dense layer for basis-decomposed wide
    layers) under shard_map == single device, grads wrt H/basis/comp."""
    from mrgcn_tpu.models.rgcn import _dense_basis_sharded

    src, dst, rel, norm, n, R = _graph(seed=13)
    B, in_dim, out = 2, 136, 136
    plan1 = rl.build_layer_plans(src, dst, rel, norm, n, 1, 1,
                                 kind="dense")
    plan8 = rl.shard_layer_plans(src, dst, rel, norm, n, 1, 1, 8,
                                 kind="dense")

    rng = np.random.default_rng(14)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, in_dim, out)).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    out1 = rl.dense_basis(H, basis, comp, plan1, in_dim, out)
    out8 = _dense_basis_sharded(H, basis, comp, plan8, in_dim, out, mesh)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               rtol=1e-4, atol=1e-4)

    g1 = jax.grad(lambda h, ba, c: (rl.dense_basis(
        h, ba, c, plan1, in_dim, out) ** 2).sum(),
        argnums=(0, 1, 2))(H, basis, comp)
    g8 = jax.grad(lambda h, ba, c: (_dense_basis_sharded(
        h, ba, c, plan8, in_dim, out, mesh) ** 2).sum(),
        argnums=(0, 1, 2))(H, basis, comp)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
