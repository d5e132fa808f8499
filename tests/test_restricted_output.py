"""Restricted output layer: loss/gradient parity with the full program.

Full-batch NC loss only reads logits at labelled nodes; the driver's
default path (tasks/common.output_edge_block) therefore aggregates the
final layer at labelled nodes only. These tests pin that the restriction
changes nothing numerically: same loss, same parameter gradients, same
driver-level metrics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mrgcn_tpu.encodings.structure import group_by_relation
from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
from mrgcn_tpu.ops import relational as rl
from mrgcn_tpu.tasks.common import output_edge_block, restricted_layer_edges


class _Structure:
    def __init__(self, src, dst, rel, norm, n):
        self.src, self.dst, self.rel, self.norm = src, dst, rel, norm
        self.num_nodes = n


def _graph(n=200, R=5, E=800, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R - 1, E).astype(np.int32)
    loop = np.arange(n, dtype=np.int32)
    src = np.concatenate([src, loop])
    dst = np.concatenate([dst, loop])
    rel = np.concatenate([rel, np.full(n, R - 1, dtype=np.int32)])
    key = rel.astype(np.int64) * n + src
    deg = np.bincount(key, minlength=R * n)
    norm = (1.0 / deg[key]).astype(np.float32)
    return src, dst, rel, norm


def _full_block(src, dst, rel, norm, n, hidden, C):
    grouping = group_by_relation(src, dst, rel, norm, n)
    plans = rl.plans_for_layers(src, dst, rel, norm, n,
                                [(None, hidden), (hidden, C)])
    return EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                     rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                     num_out=n, plans=plans,
                     grp_src=jnp.asarray(grouping.src),
                     grp_dst=jnp.asarray(grouping.dst),
                     grp_norm=jnp.asarray(grouping.norm),
                     group_rel=jnp.asarray(grouping.group_rel),
                     group_size=grouping.group_size)


@pytest.mark.slow  # tiering: op-level pin; the driver-level parity test stays quick
def test_restricted_output_loss_and_grad_parity():
    n, R, hidden, C = 200, 5, 8, 4
    src, dst, rel, norm = _graph(n=n, R=R)
    structure = _Structure(src, dst, rel, norm, n)
    full = _full_block(src, dst, rel, norm, n, hidden, C)

    rng = np.random.default_rng(1)
    # duplicate one node to cover multi-label rows
    nodes = np.sort(rng.choice(n, 40, replace=False)).astype(np.int32)
    label_nodes = np.concatenate([nodes, nodes[:3]])
    label_cls = rng.integers(0, C, len(label_nodes)).astype(np.int32)

    uniq, inverse = np.unique(label_nodes, return_inverse=True)
    out_block = output_edge_block(structure, uniq)
    assert out_block.num_out == len(uniq)
    # only edges targeting labelled nodes survive
    assert np.all(np.isin(np.asarray(full.src)[np.asarray(full.norm) > 0],
                          np.arange(n)))
    kept = np.isin(src, uniq)
    assert int(np.sum(np.asarray(out_block.norm) > 0)) <= int(kept.sum())

    model = RGCN(hidden_dims=(hidden, C), num_relations=R, num_nodes=n,
                 num_bases=3, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, full)["params"]

    cls = jnp.asarray(label_cls)

    def loss_full(p):
        out = model.apply({"params": p}, None, full)
        return optax.softmax_cross_entropy_with_integer_labels(
            out[jnp.asarray(label_nodes)], cls).mean()

    def loss_restricted(p):
        out = model.apply({"params": p}, None, (full, out_block))
        return optax.softmax_cross_entropy_with_integer_labels(
            out[jnp.asarray(inverse.astype(np.int32))], cls).mean()

    lf, gf = jax.value_and_grad(loss_full)(params)
    lr, gr = jax.value_and_grad(loss_restricted)(params)
    assert np.allclose(float(lf), float(lr), atol=1e-6)
    flat_f = jax.tree.leaves(gf)
    flat_r = jax.tree.leaves(gr)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    # ---- full frontier restriction (restricted layer-1 with rectangular
    # plans + restricted output layer) must match too
    chain = restricted_layer_edges(structure, uniq, 2, full,
                                   first_dim=hidden)
    assert isinstance(chain, tuple) and len(chain) == 2
    assert chain[1].num_out == len(uniq)
    assert chain[0].plans is not None            # rectangular stream plans
    assert chain[0].num_out < n                  # layer-1 got restricted

    def loss_chain(p):
        out = model.apply({"params": p}, None, chain)
        return optax.softmax_cross_entropy_with_integer_labels(
            out[jnp.asarray(inverse.astype(np.int32))], cls).mean()

    lc, gc = jax.value_and_grad(loss_chain)(params)
    assert np.allclose(float(lf), float(lc), atol=1e-6)
    for a, b in zip(flat_f, jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_output_edge_block_norms_unchanged():
    n, R = 60, 3
    src, dst, rel, norm = _graph(n=n, R=R, E=150, seed=2)
    structure = _Structure(src, dst, rel, norm, n)
    uniq = np.sort(np.random.default_rng(3).choice(
        n, 10, replace=False)).astype(np.int32)
    blk = output_edge_block(structure, uniq)
    # every kept (src, dst, rel, norm) quadruple appears in the original
    # edge list with the SAME norm (restriction must not renormalise)
    orig = {}
    for s, d, r, w in zip(src, dst, rel, norm):
        orig.setdefault((int(s), int(d), int(r)), []).append(float(w))
    b_src = np.asarray(blk.src)
    b_dst = np.asarray(blk.dst)
    b_rel = np.asarray(blk.rel)
    b_norm = np.asarray(blk.norm)
    real = b_norm > 0
    for s_local, d, r, w in zip(b_src[real], b_dst[real], b_rel[real],
                                b_norm[real]):
        key = (int(uniq[s_local]), int(d), int(r))
        assert key in orig
        assert any(abs(w - o) < 1e-7 for o in orig[key])


def test_driver_restriction_matches_full(monkeypatch, tmp_path):
    """Driver-level: full-batch NC training with MRGCN_RESTRICT_OUT on
    and off produces identical per-epoch losses (dropout disabled)."""
    from mrgcn_tpu.tasks import node_classification as nc

    class Inputs:
        pass

    n, R, hidden, C = 120, 4, 8, 3
    src, dst, rel, norm = _graph(n=n, R=R, E=400, seed=4)
    structure = _Structure(src, dst, rel, norm, n)
    full = _full_block(src, dst, rel, norm, n, hidden, C)

    inputs = Inputs()
    inputs.features = {}
    inputs.edges = full
    inputs.structure = structure
    inputs.num_nodes = n
    inputs.hidden_dims = (hidden, C)
    inputs.X_width = 0
    inputs.featureless = True
    inputs.identity_basis = False

    rng = np.random.default_rng(5)
    nodes = rng.choice(n, 25, replace=False)
    label_rows = np.stack(
        [nodes, rng.integers(0, C, 25)], axis=1).astype(np.int32)

    losses = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("MRGCN_RESTRICT_OUT", flag)
        batches = nc.make_batches(inputs, label_rows, -1, 2)
        assert len(batches) == 1
        b = batches[0]
        if flag == "1":
            assert isinstance(b.edges, tuple) and len(b.edges) == 2
        else:
            assert not isinstance(b.edges, tuple)
        model = RGCN(hidden_dims=(hidden, C), num_relations=R,
                     num_nodes=n, num_bases=2, featureless=True)
        params = model.init(jax.random.PRNGKey(1), None, b.edges)["params"]

        def loss_fn(p, b=b):
            out = model.apply({"params": p}, None, b.edges)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out[b.idx], b.targets)
            return jnp.sum(ce * b.weights) / jnp.sum(b.weights)

        optimizer = optax.adam(0.05)
        opt_state = optimizer.init(params)
        trace = []
        for _ in range(3):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            trace.append(float(loss))
        losses[flag] = trace

    np.testing.assert_allclose(losses["0"], losses["1"], atol=1e-5,
                               rtol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
