"""Native BFS sampler vs the numpy reference path.

The native C++ hop (mrgcn_tpu/native/sampler.cpp) must agree exactly with
the vectorised numpy expansion on edge ids and neighbour sets, repeated
calls included (the visited-marks scratch must self-clean).
"""

import numpy as np
import pytest

from mrgcn_tpu.data.batching import EdgeIndex
from mrgcn_tpu.data.native import get_sampler_lib
from mrgcn_tpu.encodings.structure import GraphStructure


def random_structure(rng, n=200, E=1500, R=7):
    return GraphStructure(
        num_nodes=n, num_relations=R,
        src=rng.integers(0, n, E).astype(np.int32),
        dst=rng.integers(0, n, E).astype(np.int32),
        rel=rng.integers(0, R, E).astype(np.int32),
        norm=rng.random(E).astype(np.float32))


def numpy_hop(index, nodes):
    eids = index.out_edges(nodes)
    return eids, np.unique(index.dst[eids]).astype(np.int32)


def test_out_edges_vectorised_matches_bruteforce():
    rng = np.random.default_rng(0)
    index = EdgeIndex(random_structure(rng))
    nodes = rng.choice(index.num_nodes, 37, replace=False)
    got = index.out_edges(nodes)
    want = np.concatenate(
        [np.arange(index.indptr[v], index.indptr[v + 1]) for v in nodes]
    ) if len(nodes) else np.empty(0, np.int64)
    assert np.array_equal(got, want)


def test_out_edges_empty_frontier():
    index = EdgeIndex(random_structure(np.random.default_rng(1)))
    assert index.out_edges(np.empty(0, dtype=np.int64)).size == 0


@pytest.mark.skipif(get_sampler_lib() is None,
                    reason="native sampler unavailable")
def test_native_hop_matches_numpy_repeatedly():
    rng = np.random.default_rng(2)
    index = EdgeIndex(random_structure(rng))
    frontier = rng.choice(index.num_nodes, 25, replace=False)
    for _ in range(3):  # repeats catch stale marks in the scratch buffer
        eids_n, neigh_n = index.hop(frontier)
        eids_p, neigh_p = numpy_hop(index, frontier)
        assert sorted(eids_n.tolist()) == sorted(eids_p.tolist())
        assert np.array_equal(neigh_n, neigh_p)
        frontier = neigh_n[: max(1, len(neigh_n) // 2)]


@pytest.mark.skipif(get_sampler_lib() is None,
                    reason="native sampler unavailable")
def test_native_hop_rejects_bad_frontier():
    index = EdgeIndex(random_structure(np.random.default_rng(3)))
    with pytest.raises(ValueError):
        index.hop(np.array([index.num_nodes + 5], dtype=np.int32))
    # scratch still clean afterwards
    eids, neigh = index.hop(np.array([0], dtype=np.int32))
    _, want = numpy_hop(index, np.array([0]))
    assert np.array_equal(neigh, want)


def test_hop_used_by_sample_minibatch():
    from mrgcn_tpu.data.batching import sample_minibatch
    rng = np.random.default_rng(4)
    index = EdgeIndex(random_structure(rng))
    mb = sample_minibatch(index, rng.choice(index.num_nodes, 8,
                                            replace=False).astype(np.int32),
                          num_layers=2)
    assert mb.num_batch == 8
    assert len(mb.layer_edges) == 2
