"""Numerical tests for the relational aggregation and ranking ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from mrgcn_tpu.ops import distmult, rspmm


def _random_graph(rng, n=23, R=5, E=200, in_dim=7, out_dim=11):
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    norm[-10:] = 0.0  # padding edges
    H = rng.standard_normal((n, in_dim)).astype(np.float32)
    W = rng.standard_normal((R, in_dim, out_dim)).astype(np.float32)
    return src, dst, rel, norm, H, W


def test_transform_aggregate_matches_dense_oracle():
    rng = np.random.default_rng(0)
    src, dst, rel, norm, H, W = _random_graph(rng)
    n, R = H.shape[0], W.shape[0]

    out = rspmm.transform_aggregate(jnp.asarray(H), jnp.asarray(src),
                                    jnp.asarray(dst), jnp.asarray(rel),
                                    jnp.asarray(norm), n, jnp.asarray(W))
    oracle = rspmm.reference_dense_check(jnp.asarray(H), jnp.asarray(src),
                                         jnp.asarray(dst), jnp.asarray(rel),
                                         jnp.asarray(norm), n, R,
                                         jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_transform_aggregate_paths_agree():
    rng = np.random.default_rng(1)
    src, dst, rel, norm, H, W = _random_graph(rng)
    n = H.shape[0]
    args = (jnp.asarray(H), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(rel), jnp.asarray(norm), n, jnp.asarray(W))
    direct = rspmm.transform_aggregate(*args, budget_elems=2 ** 27)
    fused = rspmm.transform_aggregate(*args, budget_elems=1)
    chunked = rspmm.transform_aggregate(*args, budget_elems=1,
                                        message_budget_elems=1)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(chunked),
                               rtol=1e-4, atol=1e-4)


def test_transform_aggregate_with_bases():
    rng = np.random.default_rng(2)
    src, dst, rel, norm, H, _ = _random_graph(rng)
    n, R, B = H.shape[0], 5, 3
    basis = rng.standard_normal((B, H.shape[1], 11)).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)

    W = np.einsum("rb,bio->rio", comp, basis)
    oracle = rspmm.reference_dense_check(jnp.asarray(H), jnp.asarray(src),
                                         jnp.asarray(dst), jnp.asarray(rel),
                                         jnp.asarray(norm), n, R,
                                         jnp.asarray(W))
    for msg_budget in (2 ** 28, 1):  # one-shot and edge-chunked paths
        out = rspmm.transform_aggregate(jnp.asarray(H), jnp.asarray(src),
                                        jnp.asarray(dst), jnp.asarray(rel),
                                        jnp.asarray(norm), n,
                                        jnp.asarray(basis),
                                        comp=jnp.asarray(comp),
                                        message_budget_elems=msg_budget)
        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                                   rtol=1e-3, atol=1e-3)


def test_gather_aggregate_matches_dense():
    rng = np.random.default_rng(3)
    n, R, E, out_dim = 17, 4, 120, 9
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    W_I = rng.standard_normal((R, n, out_dim)).astype(np.float32)

    out = rspmm.gather_aggregate(jnp.asarray(W_I), jnp.asarray(src),
                                 jnp.asarray(dst), jnp.asarray(rel),
                                 jnp.asarray(norm), n)
    # dense oracle: A (n x R*n) @ W_I flat (R*n x out)
    A = np.zeros((n, R * n), dtype=np.float32)
    np.add.at(A, (src, rel * n + dst), norm)
    oracle = A @ W_I.reshape(R * n, out_dim)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-4)


def test_gather_aggregate_with_bases_matches_composed():
    rng = np.random.default_rng(4)
    n, R, B, E, out_dim = 13, 6, 2, 80, 5
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    basis = rng.standard_normal((B, n, out_dim)).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)

    composed = np.einsum("rb,bno->rno", comp, basis)
    oracle = rspmm.gather_aggregate(jnp.asarray(composed), jnp.asarray(src),
                                    jnp.asarray(dst), jnp.asarray(rel),
                                    jnp.asarray(norm), n)
    for budget, msg_budget in ((2 ** 27, 2 ** 28), (1, 2 ** 28), (1, 1)):
        out = rspmm.gather_aggregate(jnp.asarray(basis), jnp.asarray(src),
                                     jnp.asarray(dst), jnp.asarray(rel),
                                     jnp.asarray(norm), n,
                                     comp=jnp.asarray(comp),
                                     budget_elems=budget,
                                     message_budget_elems=msg_budget)
        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DistMult ranking — brute-force oracle replicating the reference semantics
# (reference: link_prediction.py:557-643) literally in numpy
# ---------------------------------------------------------------------------

def _brute_force_ranks(data, E_nodes, E_edges, filtered):
    heads, tails = distmult.truedicts(data)
    num_facts, num_nodes = data.shape[0], E_nodes.shape[0]
    out = np.empty(num_facts * 2, dtype=np.int64)
    offset = 0
    for head in (False, True):
        scores = np.zeros((num_facts, num_nodes))
        for i, (s, p, o) in enumerate(data):
            for n_i in range(num_nodes):
                cand = (n_i, p, o) if head else (s, p, n_i)
                scores[i, n_i] = np.sum(E_nodes[cand[0]] * E_edges[cand[1]]
                                        * E_nodes[cand[2]])
        if filtered:
            for i, (s, p, o) in enumerate(data):
                known = heads.get((p, o), []) if head \
                    else tails.get((s, p), [])
                target = s if head else o
                for c in known:
                    if c != target:
                        scores[i, c] = -np.inf
        targets = data[:, 0] if head else data[:, 2]
        for i in range(num_facts):
            true = scores[i, targets[i]]
            greater = np.sum(scores[i] > true)
            ties = np.sum(scores[i] == true)
            # numpy round is round-half-to-even, like torch.round
            out[offset + i] = greater + int(np.round((ties - 1) / 2)) + 1
        offset += num_facts
    return out


@pytest.fixture
def lp_setup():
    rng = np.random.default_rng(7)
    num_nodes, num_edges, h = 12, 4, 8
    E_nodes = rng.standard_normal((num_nodes, h)).astype(np.float32)
    E_edges = rng.standard_normal((num_edges, h)).astype(np.float32)
    data = np.stack([rng.integers(0, num_nodes, 20),
                     rng.integers(0, num_edges, 20),
                     rng.integers(0, num_nodes, 20)], axis=1).astype(np.int32)
    return data, E_nodes, E_edges


def test_ranks_match_bruteforce(lp_setup):
    data, E_nodes, E_edges = lp_setup
    raw, flt = distmult.compute_ranks(data, jnp.asarray(E_nodes),
                                      jnp.asarray(E_edges))
    np.testing.assert_array_equal(
        raw, _brute_force_ranks(data, E_nodes, E_edges, filtered=False))
    np.testing.assert_array_equal(
        flt, _brute_force_ranks(data, E_nodes, E_edges, filtered=True))


def test_ranks_chunked_equal_unchunked(lp_setup):
    data, E_nodes, E_edges = lp_setup
    raw1, flt1 = distmult.compute_ranks(data, jnp.asarray(E_nodes),
                                        jnp.asarray(E_edges))
    # budget_elems=1 defeats the chunk-growing budget so chunk_size=7
    # genuinely splits the 20 facts into 3 chunks per direction
    pending = distmult.launch_ranks(data, jnp.asarray(E_nodes),
                                    jnp.asarray(E_edges), chunk_size=7,
                                    budget_elems=1)
    # 3 chunks per direction, dispatched as one scanned stack each
    assert len(pending.parts) == 2
    assert all(raw.shape[0] == 3 for _, raw, _ in pending.parts)
    raw2, flt2 = distmult.collect_many([pending])[0]
    np.testing.assert_array_equal(raw1, raw2)
    np.testing.assert_array_equal(flt1, flt2)


def test_collect_many_matches_sequential(lp_setup):
    """Batched async collection returns exactly what per-subset blocking
    compute_ranks does, across subsets of different sizes and chunkings."""
    data, E_nodes, E_edges = lp_setup
    En, Ee = jnp.asarray(E_nodes), jnp.asarray(E_edges)
    subsets = [data[:5], data[5:8], data[8:]]
    pendings = [distmult.launch_ranks(s, En, Ee, chunk_size=4,
                                      budget_elems=1) for s in subsets]
    batched = distmult.collect_many(pendings)
    for s, (raw_b, flt_b) in zip(subsets, batched):
        raw_s, flt_s = distmult.compute_ranks(s, En, Ee)
        np.testing.assert_array_equal(raw_b, raw_s)
        np.testing.assert_array_equal(flt_b, flt_s)


def test_rank_plan_reuse_across_embeddings(lp_setup):
    """A prepared RankPlan re-dispatched with DIFFERENT embeddings (the
    drivers cache plans across eval epochs while params train) matches a
    fresh launch_ranks every time."""
    data, E_nodes, E_edges = lp_setup
    plan = distmult.prepare_rank_chunks(data, E_nodes.shape[0],
                                        chunk_size=7, budget_elems=1)
    rng = np.random.default_rng(11)
    for _ in range(3):
        En = jnp.asarray(rng.standard_normal(E_nodes.shape)
                         .astype(np.float32))
        Ee = jnp.asarray(rng.standard_normal(E_edges.shape)
                         .astype(np.float32))
        raw_p, flt_p = distmult.collect_many(
            [distmult.launch_ranks_plan(plan, En, Ee)])[0]
        raw_f, flt_f = distmult.compute_ranks(data, En, Ee)
        np.testing.assert_array_equal(raw_p, raw_f)
        np.testing.assert_array_equal(flt_p, flt_f)


def test_tie_handling_exact():
    """Ties place the true triple halfway down, with round-half-to-even
    (reference: link_prediction.py:632-638)."""
    # all-equal embeddings -> every candidate scores identically
    E_nodes = np.ones((5, 4), dtype=np.float32)
    E_edges = np.ones((1, 4), dtype=np.float32)
    data = np.array([[0, 0, 1]], dtype=np.int32)
    raw, _ = distmult.compute_ranks(data, jnp.asarray(E_nodes),
                                    jnp.asarray(E_edges))
    # 5 candidates all tied: greater=0, ties=5, rank = 0 + round(2.0) + 1 = 3
    np.testing.assert_array_equal(raw, [3, 3])


def test_score_shape():
    E_nodes = np.random.default_rng(0).standard_normal((6, 4)).astype(
        np.float32)
    E_edges = np.ones((2, 4), dtype=np.float32)
    s = distmult.score(jnp.asarray([0, 1]), jnp.asarray([0, 1]),
                       jnp.asarray([2, 3]), jnp.asarray(E_nodes),
                       jnp.asarray(E_edges))
    assert s.shape == (2,)
    expected = np.sum(E_nodes[[0, 1]] * E_edges[[0, 1]] * E_nodes[[2, 3]],
                      axis=-1)
    np.testing.assert_allclose(np.asarray(s), expected, rtol=1e-5)


def test_grouped_transform_matches_fused():
    from mrgcn_tpu.encodings.structure import group_by_relation

    rng = np.random.default_rng(8)
    src, dst, rel, norm, H, W = _random_graph(rng)
    n = H.shape[0]

    fused = rspmm.transform_aggregate(jnp.asarray(H), jnp.asarray(src),
                                      jnp.asarray(dst), jnp.asarray(rel),
                                      jnp.asarray(norm), n, jnp.asarray(W))
    g = group_by_relation(src, dst, rel, norm, n, group_size=16)
    grouped = rspmm.transform_aggregate_grouped(
        jnp.asarray(H), jnp.asarray(g.src), jnp.asarray(g.dst),
        jnp.asarray(g.norm), jnp.asarray(g.group_rel), g.group_size, n,
        jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)


def test_grouped_transform_with_bases():
    from mrgcn_tpu.encodings.structure import group_by_relation

    rng = np.random.default_rng(9)
    src, dst, rel, norm, H, _ = _random_graph(rng)
    n, R, B = H.shape[0], 5, 3
    basis = rng.standard_normal((B, H.shape[1], 11)).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)

    W = np.einsum("rb,bio->rio", comp, basis)
    oracle = rspmm.reference_dense_check(jnp.asarray(H), jnp.asarray(src),
                                         jnp.asarray(dst), jnp.asarray(rel),
                                         jnp.asarray(norm), n, R,
                                         jnp.asarray(W))
    g = group_by_relation(src, dst, rel, norm, n, group_size=16)
    grouped = rspmm.transform_aggregate_grouped(
        jnp.asarray(H), jnp.asarray(g.src), jnp.asarray(g.dst),
        jnp.asarray(g.norm), jnp.asarray(g.group_rel), g.group_size, n,
        jnp.asarray(basis), comp=jnp.asarray(comp))
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(oracle),
                               rtol=1e-3, atol=1e-3)


def test_packed_gather_matches_unpacked():
    rng = np.random.default_rng(10)
    n, R, B, E, out_dim = 21, 5, 2, 150, 6
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    basis = rng.standard_normal((B, n, out_dim)).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)

    oracle = rspmm.gather_aggregate(jnp.asarray(basis), jnp.asarray(src),
                                    jnp.asarray(dst), jnp.asarray(rel),
                                    jnp.asarray(norm), n,
                                    comp=jnp.asarray(comp))

    # pack: (B, ceil(n/k), 128), k = 128 // next_pow2(out)
    shape, k = rspmm.packed_identity_shape(B, n, out_dim)
    sub = 128 // k
    packed = np.zeros(shape, dtype=np.float32)
    for b in range(B):
        for d in range(n):
            packed[b, d // k, (d % k) * sub:(d % k) * sub + out_dim] = \
                basis[b, d]

    got = rspmm.gather_aggregate_packed(
        jnp.asarray(packed), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(rel), jnp.asarray(norm), n, out_dim, k,
        comp=jnp.asarray(comp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)

    # no-comp variant
    oracle2 = rspmm.gather_aggregate(
        jnp.asarray(np.einsum("rb,bno->rno", comp, basis)),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
        jnp.asarray(norm), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle2),
                               rtol=1e-4, atol=1e-4)


def test_packing_factor():
    assert rspmm.packing_factor(16) == 8
    assert rspmm.packing_factor(14) == 8   # rounds to 16 lanes per row
    assert rspmm.packing_factor(64) == 2
    assert rspmm.packing_factor(65) == 1
    assert rspmm.packing_factor(200) == 1
