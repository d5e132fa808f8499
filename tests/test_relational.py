"""Oracle tests for the sorted-stream relational engine (ops/relational.py).

Forward must match the brute-force dense oracle; gradients must match
autodiff through the dense oracle (the custom VJPs recompute per-edge
cotangents on differently-sorted streams — any indexing slip shows here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrgcn_tpu.ops import relational as rl
from mrgcn_tpu.ops import rspmm


def random_graph(seed=0, n=57, R=7, E=311):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    return src, dst, rel, norm, n, R, E


def dense_oracle(H, W, src, dst, rel, norm, n):
    """out[s] += norm * H[dst] @ W[rel] — jnp, differentiable."""
    msgs = jnp.einsum("ei,eio->eo", H[dst], W[rel]) * norm[:, None]
    return jax.ops.segment_sum(msgs, src, num_segments=n)


@pytest.mark.parametrize("out_dim", [16, 14, 200, 96])
def test_featureless_fwd_and_grad(out_dim):
    src, dst, rel, norm, n, R, E = random_graph(seed=out_dim)
    rng = np.random.default_rng(1)
    k = rspmm.packing_factor(out_dim)
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                 row_block=16, edge_block=8)
    lw = rl.line_width(k, out_dim)
    table = jnp.asarray(rng.standard_normal(
        (R * plans.n_in_rows, lw)).astype(np.float32))

    got = rl.featureless_aggregate(table, plans, out_dim)
    # oracle: unpack the table into per-(rel, node) weight rows
    W = rl.unpack_rows(table.reshape(R * plans.n_in_rows, lw),
                       k, R * plans.n_in_rows * k, out_dim)
    W = W.reshape(R, plans.n_in_rows * k, out_dim)[:, :n, :]
    want = jax.ops.segment_sum(
        W[rel, dst] * jnp.asarray(norm)[:, None],
        jnp.asarray(src), num_segments=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # gradient w.r.t. the table
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_new(t):
        return jnp.vdot(rl.featureless_aggregate(t, plans, out_dim), cot)

    def loss_ref(t):
        W = rl.unpack_rows(t, k, R * plans.n_in_rows * k, out_dim)
        W = W.reshape(R, plans.n_in_rows * k, out_dim)[:, :n, :]
        return jnp.vdot(jax.ops.segment_sum(
            W[rel, dst] * jnp.asarray(norm)[:, None],
            jnp.asarray(src), num_segments=n), cot)

    g1 = jax.grad(loss_new)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("in_dim,out_dim", [(16, 14), (16, 16),
                                            (200, 200), (70, 30),
                                            (14, 96)])
def test_dense_fwd_and_grad(in_dim, out_dim):
    src, dst, rel, norm, n, R, E = random_graph(seed=in_dim + out_dim)
    rng = np.random.default_rng(2)
    k_in = rspmm.packing_factor(in_dim)
    k_out = rspmm.packing_factor(out_dim)
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k_in, k_out,
                                 row_block=16, edge_block=8)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    W = jnp.asarray(
        rng.standard_normal((R, in_dim, out_dim)).astype(np.float32))
    normj, srcj = jnp.asarray(norm), jnp.asarray(src)

    got = rl.dense_aggregate(H, W, plans, in_dim, out_dim)
    want = dense_oracle(H, W, srcj, jnp.asarray(dst), jnp.asarray(rel),
                        normj, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_new(H, W):
        return jnp.vdot(rl.dense_aggregate(H, W, plans, in_dim, out_dim),
                        cot)

    def loss_ref(H, W):
        return jnp.vdot(dense_oracle(H, W, srcj, jnp.asarray(dst),
                                     jnp.asarray(rel), normj, n), cot)

    g1 = jax.grad(loss_new, argnums=(0, 1))(H, W)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(H, W)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("interpret,out_dim", [(False, 16), (False, 200),
                                               (True, 16)])
@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_featureless_composed_fused_bwd(monkeypatch, interpret, out_dim):
    """featureless_composed (single-pass d_comp/d_packed backward) matches
    the unfused compose_packed -> featureless_aggregate chain, forward and
    gradients, in both the XLA fallback and Pallas interpret mode, for
    packed (k=8, L=128) and wide (k=1, L=256) table layouts."""
    # small graph: interpret-mode pallas is ~1000x slower per op, and the
    # XLA-fallback variant covers the large-shape algebra already
    src, dst, rel, norm, n, R, E = random_graph(
        seed=5, **({"n": 24, "E": 80, "R": 4} if interpret else {}))
    rng = np.random.default_rng(3)
    B = 3
    k = rspmm.packing_factor(out_dim)
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                 row_block=8 if interpret else 16,
                                 edge_block=8)
    lw = rl.line_width(k, out_dim)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    packed = jnp.asarray(rng.standard_normal(
        (B, plans.n_in_rows, lw)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_fused(c, p):
        return jnp.vdot(rl.featureless_composed(c, p, plans, out_dim,
                                                interpret), cot)

    def loss_chain(c, p):
        # the oracle always runs the (fast) XLA fallback — the interpret
        # variant's job is ONLY to exercise the Pallas kernels on the
        # fused side
        flat = rspmm.compose_packed(c, p).reshape(-1, lw)
        return jnp.vdot(rl.featureless_aggregate(flat, plans, out_dim,
                                                 False), cot)

    # oracle values on the plain XLA paths FIRST (the pallas force below
    # would reroute them through uncompilable-on-CPU kernels)
    flat = rspmm.compose_packed(comp, packed).reshape(-1, lw)
    out_c = rl.featureless_aggregate(flat, plans, out_dim, False)
    g_c = jax.grad(loss_chain, argnums=(0, 1))(comp, packed)

    if interpret:
        monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    out_f = rl.featureless_composed(comp, packed, plans, out_dim, interpret)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=1e-5, atol=1e-5)
    g_f = jax.grad(loss_fused, argnums=(0, 1))(comp, packed)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("out_dim,interpret", [(16, False), (200, False),
                                               (16, True)])
def test_featureless_basis_fwd_and_grad(monkeypatch, out_dim, interpret):
    """featureless_basis (per-edge compose over B basis tables, never
    materialising the (R*rows, L) table) matches the composed chain,
    forward and gradients, for packed (k=8) and wide (k=1) layouts."""
    src, dst, rel, norm, n, R, E = random_graph(
        seed=11, **({"n": 24, "E": 80, "R": 4} if interpret else {}))
    rng = np.random.default_rng(12)
    B = 3
    k = rspmm.packing_factor(out_dim)
    rb = 8 if interpret else 16
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                 row_block=rb, edge_block=8,
                                 kind="identity_basis")
    assert plans.kind == "identity_basis"
    lw = rl.line_width(k, out_dim)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    packed = jnp.asarray(rng.standard_normal(
        (B, plans.n_in_rows, lw)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_basis(c, p):
        return jnp.vdot(rl.featureless_basis(c, p, plans, out_dim,
                                             interpret), cot)

    def loss_chain(c, p):
        # oracle: compose the full table, aggregate on the same streams
        # (identity_basis fwd/bwd_table match plain identity plans)
        flat = rspmm.compose_packed(c, p).reshape(-1, lw)
        return jnp.vdot(rl.featureless_aggregate(flat, plans, out_dim,
                                                 False), cot)

    flat = rspmm.compose_packed(comp, packed).reshape(-1, lw)
    out_c = rl.featureless_aggregate(flat, plans, out_dim, False)
    g_c = jax.grad(loss_chain, argnums=(0, 1))(comp, packed)

    if interpret:
        monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    out_b = rl.featureless_basis(comp, packed, plans, out_dim, interpret)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c),
                               rtol=2e-5, atol=2e-5)
    g_b = jax.grad(loss_basis, argnums=(0, 1))(comp, packed)
    for a, b in zip(g_b, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("out_dim,interpret", [(16, False), (200, False),
                                               (16, True)])
@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_featureless_basis_wide_parity(monkeypatch, out_dim, interpret):
    """featureless_basis_wide (combined (rows, B*L) table, one wide line
    per edge) matches featureless_basis, forward and gradients, on the
    same identity_basis plans."""
    src, dst, rel, norm, n, R, E = random_graph(
        seed=17, **({"n": 24, "E": 80, "R": 4} if interpret else {}))
    rng = np.random.default_rng(18)
    B = 3
    k = rspmm.packing_factor(out_dim)
    rb = 8 if interpret else 16
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k, k,
                                 row_block=rb, edge_block=8,
                                 kind="identity_basis")
    lw = rl.line_width(k, out_dim)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    packed = jnp.asarray(rng.standard_normal(
        (B, plans.n_in_rows, lw)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_narrow(c, p):
        return jnp.vdot(rl.featureless_basis(c, p, plans, out_dim, False),
                        cot)

    def loss_wide(c, p):
        return jnp.vdot(rl.featureless_basis_wide(c, p, plans, out_dim,
                                                  interpret), cot)

    out_n = rl.featureless_basis(comp, packed, plans, out_dim, False)
    g_n = jax.grad(loss_narrow, argnums=(0, 1))(comp, packed)

    if interpret:
        monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    out_w = rl.featureless_basis_wide(comp, packed, plans, out_dim,
                                      interpret)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_n),
                               rtol=2e-5, atol=2e-5)
    g_w = jax.grad(loss_wide, argnums=(0, 1))(comp, packed)
    for a, b in zip(g_w, g_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize(
    "in_dim,out_dim,interpret",
    [(200, 200, False), (70, 200, False),
     # tiering: the interpret-mode kernel sweep runs in the slow tier
     pytest.param(136, 40, True, marks=pytest.mark.slow)])
def test_dense_basis_fwd_and_grad(monkeypatch, in_dim, out_dim, interpret):
    """dense_basis (stream-engine dense layer through the (n, B*out)
    per-basis projections) matches the dense oracle with composed weights,
    forward and grads wrt H, basis and comp."""
    src, dst, rel, norm, n, R, E = random_graph(
        seed=in_dim, **({"n": 24, "E": 80, "R": 4} if interpret else {}))
    rng = np.random.default_rng(19)
    B = 2
    assert rspmm.packing_factor(in_dim) == 1  # wide rows only
    k_out = rspmm.packing_factor(out_dim)
    rb = 8 if interpret else 16
    plans = rl.build_layer_plans(src, dst, rel, norm, n, 1, k_out,
                                 row_block=rb, edge_block=8, kind="dense")
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, in_dim, out_dim)).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    relj, normj = jnp.asarray(rel), jnp.asarray(norm)
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss_ref(H, basis, comp):
        W = jnp.einsum("rb,bio->rio", comp, basis)
        return jnp.vdot(dense_oracle(H, W, srcj, dstj, relj, normj, n),
                        cot)

    def loss_new(H, basis, comp):
        return jnp.vdot(rl.dense_basis(H, basis, comp, plans, in_dim,
                                       out_dim, interpret), cot)

    W = jnp.einsum("rb,bio->rio", comp, basis)
    want = dense_oracle(H, W, srcj, dstj, relj, normj, n)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(H, basis, comp)

    if interpret:
        monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    got = rl.dense_basis(H, basis, comp, plans, in_dim, out_dim, interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-3)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(H, basis, comp)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-3)


def test_dense_basis_hybrid_fwd_and_grad():
    """dense_basis_hybrid (stream forward + relation-grouped backward)
    matches the dense oracle, forward and grads wrt H/basis/comp."""
    from mrgcn_tpu.encodings.structure import group_by_relation

    src, dst, rel, norm, n, R, E = random_graph(seed=41)
    rng = np.random.default_rng(42)
    B, in_dim, out_dim = 2, 200, 200
    plans = rl.build_layer_plans(src, dst, rel, norm, n, 1, 1,
                                 row_block=16, edge_block=8, kind="dense")
    g = group_by_relation(src, dst, rel, norm, n, group_size=8)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal(
        (B, in_dim, out_dim)).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    relj, normj = jnp.asarray(rel), jnp.asarray(norm)
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))
    gargs = (jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.norm),
             jnp.asarray(g.group_rel), g.group_size)

    def loss_ref(H, basis, comp):
        W = jnp.einsum("rb,bio->rio", comp, basis)
        return jnp.vdot(dense_oracle(H, W, srcj, dstj, relj, normj, n),
                        cot)

    def loss_new(H, basis, comp):
        return jnp.vdot(rl.dense_basis_hybrid(
            H, basis, comp, plans, *gargs, in_dim, out_dim), cot)

    W = jnp.einsum("rb,bio->rio", comp, basis)
    want = dense_oracle(H, W, srcj, dstj, relj, normj, n)
    got = rl.dense_basis_hybrid(H, basis, comp, plans, *gargs, in_dim,
                                out_dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-3)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(H, basis, comp)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(H, basis, comp)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-3)


@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_rgcn_model_dense_basis_flag_parity(monkeypatch):
    """MRGCN_DENSE_BASIS=1 routes wide non-rel_const basis layers through
    dense_basis — model loss and grads must match the relation-grouped
    default (LP-shaped: hidden 200, plans rejected for rel_const)."""
    import optax
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    # many relations over few row blocks: the composite (block, rel) slab
    # split would pad far past the plain layout, so rel_const is rejected
    # — the same regime as FB15k-237 (R~475 over ~29 blocks)
    src, dst, rel, norm, n, R, E = random_graph(seed=37, R=40, E=500)
    plans = rl.plans_for_layers(
        src, dst, rel, norm, n, [(None, 200), (200, 200)],
        row_block=16, edge_block=8,
        identity_basis=rl.basis_stream_wanted(R, n, 200, 2))
    plan_f = plans["1:1"]
    # the test only makes sense if the driver would reject this plan for
    # the rel_const dense path (the LP regime dense_basis targets)
    assert not plan_f.fwd.rel_const
    grouping = group_by_relation(src, dst, rel, norm, n, group_size=8)
    edges = EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                      rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                      num_out=n, plans=plans,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size)
    model = RGCN(hidden_dims=(200, 200), num_relations=R, num_nodes=n,
                 num_bases=2, featureless=True, link_prediction=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    cot = jnp.asarray(np.random.default_rng(8).standard_normal(
        (n, 200)).astype(np.float32))

    def loss(p):
        return jnp.vdot(model.apply({"params": p}, None, edges), cot)

    monkeypatch.setenv("MRGCN_DENSE_BASIS", "0")        # grouped
    l0, g0 = jax.value_and_grad(loss)(params)
    for mode in ("1", "hybrid"):                        # stream / hybrid
        monkeypatch.setenv("MRGCN_DENSE_BASIS", mode)
        l1, g1 = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4,
                                   err_msg=f"mode {mode}")
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-3,
                                       err_msg=f"mode {mode}")


@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_pallas_interpret_parity(monkeypatch):
    """The Pallas scatter/gather kernels (interpret mode) reproduce the XLA
    fallback bit-for-bit paths within f32 matmul tolerance."""
    src, dst, rel, norm, n, R, E = random_graph(seed=31, n=40, E=150)
    rng = np.random.default_rng(6)
    in_dim, out_dim = 16, 14
    k_in = rspmm.packing_factor(in_dim)
    k_out = rspmm.packing_factor(out_dim)
    plans = rl.build_layer_plans(src, dst, rel, norm, n, k_in, k_out,
                                 row_block=16, edge_block=8)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    W = jnp.asarray(
        rng.standard_normal((R, in_dim, out_dim)).astype(np.float32))

    want = rl.dense_aggregate(H, W, plans, in_dim, out_dim)
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))
    gw = jax.grad(lambda H, W: jnp.vdot(
        rl.dense_aggregate(H, W, plans, in_dim, out_dim), cot),
        argnums=(0, 1))(H, W)

    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    got = rl.dense_aggregate(H, W, plans, in_dim, out_dim, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    gp = jax.grad(lambda H, W: jnp.vdot(
        rl.dense_aggregate(H, W, plans, in_dim, out_dim, interpret=True),
        cot), argnums=(0, 1))(H, W)
    for a, b in zip(gp, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_sorted_scatter_basics(monkeypatch):
    from mrgcn_tpu.ops.pallas_gather import sorted_scatter
    rng = np.random.default_rng(0)
    RB, EB = 16, 8
    nslab = 7
    local = rng.integers(0, RB + 1, (nslab, EB)).astype(np.int32)
    blk = np.sort(rng.integers(0, 5, nslab)).astype(np.int32)
    msgs = rng.standard_normal((nslab * EB, 128)).astype(np.float32)
    out_rows = 6 * RB

    want = np.zeros((out_rows, 128), np.float32)
    rows = (blk[:, None] * RB + local).reshape(-1)
    valid = local.reshape(-1) < RB
    np.add.at(want, rows[valid], msgs[valid])

    got = sorted_scatter(jnp.asarray(msgs), jnp.asarray(local),
                         jnp.asarray(blk), out_rows, RB, EB)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)

    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    got_p = sorted_scatter(jnp.asarray(msgs), jnp.asarray(local),
                           jnp.asarray(blk), out_rows, RB, EB,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), want, rtol=1e-5,
                               atol=1e-5)


def test_rgcn_model_fused_compose_flag_parity(monkeypatch):
    """MRGCN_FUSED_COMPOSE_BWD=1 routes _identity_planned through
    featureless_composed — model loss and grads must match the default."""
    import optax
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    src, dst, rel, norm, n, R, E = random_graph(seed=29)
    plans = rl.plans_for_layers(src, dst, rel, norm, n, [(None, 16)],
                                row_block=16, edge_block=8)
    edges = EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                      rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                      num_out=n, plans=plans)
    model = RGCN(hidden_dims=(16,), num_relations=R, num_nodes=n,
                 num_bases=3, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)["params"]
    labels = jnp.asarray(
        np.random.default_rng(7).integers(0, 16, n).astype(np.int32))

    def loss(p):
        out = model.apply({"params": p}, None, edges)
        return optax.softmax_cross_entropy_with_integer_labels(
            out, labels).mean()

    monkeypatch.delenv("MRGCN_FUSED_COMPOSE_BWD", raising=False)
    l0, g0 = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("MRGCN_FUSED_COMPOSE_BWD", "1")
    l1, g1 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_rgcn_model_basis_path_parity(monkeypatch):
    """With the composed-table budget forced to zero, the model routes the
    featureless input layer through featureless_basis (``:idb`` plans) —
    outputs and grads must match the unplanned path."""
    import optax
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    src, dst, rel, norm, n, R, E = random_graph(seed=23)
    monkeypatch.setattr(rl, "COMPOSED_TABLE_MAX_ELEMS", 1)
    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, 16), (16, 5)],
                                row_block=16, edge_block=8,
                                identity_basis=True)
    assert "8:8:idb" in plans
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
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_rgcn_model_planned_parity():
    """Full 2-layer featureless RGCN: planned vs unplanned forward+grads."""
    import optax
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    src, dst, rel, norm, n, R, E = random_graph(seed=21)
    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, 16), (16, 5)],
                                row_block=16, edge_block=8)
    base = dict(src=jnp.asarray(src), dst=jnp.asarray(dst),
                rel=jnp.asarray(rel), norm=jnp.asarray(norm), num_out=n)
    edges_plain = EdgeBlock(**base)
    edges_plan = EdgeBlock(**base, plans=plans)

    from mrgcn_tpu.models.rgcn import RGCN
    model = RGCN(hidden_dims=(16, 5), num_relations=R, num_nodes=n,
                 num_bases=3, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges_plain)["params"]
    labels = jnp.asarray(
        np.random.default_rng(5).integers(0, 5, n).astype(np.int32))

    import optax

    def loss(p, e):
        out = model.apply({"params": p}, None, e)
        return optax.softmax_cross_entropy_with_integer_labels(
            out, labels).mean()

    l1, g1 = jax.value_and_grad(loss)(params, edges_plain)
    l2, g2 = jax.value_and_grad(loss)(params, edges_plan)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("interpret", [False, True])
@pytest.mark.slow  # tiering: interpret-mode/variant sweep, slow tier
def test_featureless_basis_fused_bwd_parity(monkeypatch, interpret):
    """MRGCN_FUSED_BASIS_BWD=1 (one fused scatter+dot pass per basis for
    d_packed/d_comp) matches the two-pass default, gradients exactly —
    XLA fallback and Pallas interpret mode."""
    out_dim = 200  # k == 1 (the fused path's regime; LP shape)
    src, dst, rel, norm, n, R, E = random_graph(
        seed=43, **({"n": 24, "E": 80, "R": 4} if interpret else {}))
    rng = np.random.default_rng(44)
    B = 2
    rb = 8 if interpret else 16
    plans = rl.build_layer_plans(src, dst, rel, norm, n, 1, 1,
                                 row_block=rb, edge_block=8,
                                 kind="identity_basis")
    lw = rl.line_width(1, out_dim)
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    packed = jnp.asarray(rng.standard_normal(
        (B, plans.n_in_rows, lw)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, out_dim)).astype(np.float32))

    def loss(c, p):
        return jnp.vdot(rl.featureless_basis(c, p, plans, out_dim,
                                             interpret), cot)

    monkeypatch.delenv("MRGCN_FUSED_BASIS_BWD", raising=False)
    g0 = jax.grad(loss, argnums=(0, 1))(comp, packed)

    monkeypatch.setenv("MRGCN_FUSED_BASIS_BWD", "1")
    if interpret:
        monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    g1 = jax.grad(loss, argnums=(0, 1))(comp, packed)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
