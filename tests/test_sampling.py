"""Neighbour-sampled mini-batching (``[task] neighbor_fanout``).

TPU-scale extension beyond the reference (which always expands full L-hop
neighbourhoods, reference: mrgcn/data/batch.py:185-197): each hop keeps at
most ``fanout`` out-edges per frontier node, importance-rescaling the kept
norms so the sampled aggregation is an unbiased estimator of the full one.
These tests pin (1) the no-drop identity, (2) estimator unbiasedness,
(3) the shape bound that motivates the feature, and (4) driver-level
integration incl. bit-equality when the cap never binds.
"""

import copy

import numpy as np
import pytest

from mrgcn_tpu.config import apply_defaults
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data import batching
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.encodings.structure import GraphStructure
from mrgcn_tpu.mkdataset import build
from mrgcn_tpu.tasks import link_prediction, node_classification

from tests import synth


def _star_plus_chain(hub_degree: int = 12, num_rels: int = 3):
    """A hub with ``hub_degree`` out-edges (mixed relations) plus a chain,
    norms distinct per edge so re-scaling errors are visible."""
    src, dst, rel = [0] * hub_degree, [], []
    for i in range(hub_degree):
        dst.append(1 + i)
        rel.append(i % num_rels)
    # chain off the hub's first neighbour
    src += [1, 2]
    dst += [2, 3]
    rel += [0, 1]
    n = hub_degree + 2
    norm = (np.arange(len(src), dtype=np.float32) + 1.0) / len(src)
    return GraphStructure(
        src=np.asarray(src, dtype=np.int32),
        dst=np.asarray(dst, dtype=np.int32),
        rel=np.asarray(rel, dtype=np.int32),
        norm=norm, num_nodes=n, num_relations=num_rels)


def test_normalize_fanout():
    nf = batching.normalize_fanout
    assert nf(None, 2) is None
    assert nf(-1, 2) is None
    assert nf(10, 2) == [10, 10]
    assert nf([25, 10], 2) == [25, 10]
    assert nf([25, -1], 2) == [25, None]
    assert nf(nf([25, -1], 2), 2) == [25, None]   # idempotent (run() -> make_batches re-normalizes)
    assert nf([-1, 0], 2) is None
    with pytest.raises(ValueError):
        nf([25], 2)


def test_fanout_no_drop_identity():
    """fanout >= max degree: identical edges, neighbours and norms."""
    structure = _star_plus_chain()
    index = batching.EdgeIndex(structure)
    nodes = np.asarray([0, 1], dtype=np.int32)
    full_eids, full_neigh = index.hop(nodes)
    rng = np.random.default_rng(0)
    eids, neigh, scale = index.hop_sampled(nodes, fanout=64, rng=rng)
    np.testing.assert_array_equal(np.sort(eids), np.sort(full_eids))
    np.testing.assert_array_equal(neigh, full_neigh)
    np.testing.assert_array_equal(scale, np.ones(len(eids), np.float32))

    mb_full = batching.sample_minibatch(index, nodes, num_layers=2)
    mb_samp = batching.sample_minibatch(index, nodes, num_layers=2,
                                        fanout=64,
                                        rng=np.random.default_rng(0))
    for a, b in zip(mb_full.layer_edges, mb_samp.layer_edges):
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.dst, b.dst)
        np.testing.assert_array_equal(a.rel, b.rel)
        np.testing.assert_array_equal(a.norm, b.norm)
        np.testing.assert_array_equal(a.grp_norm, b.grp_norm)


def test_fanout_zero_degree_frontier():
    """A zero-out-degree frontier node alongside a capped hub: no warning,
    no nan/inf scales (regression — 0/0 in the importance rescale)."""
    structure = _star_plus_chain(hub_degree=12)
    index = batching.EdgeIndex(structure)
    # node 3 ends the chain: no out-edges; hub 0 exceeds the cap
    nodes = np.asarray([0, 3], dtype=np.int32)
    with np.errstate(all="raise"):
        eids, neigh, scale = index.hop_sampled(
            nodes, fanout=4, rng=np.random.default_rng(3))
    assert len(eids) == 4
    assert np.all(np.isfinite(scale))
    np.testing.assert_allclose(scale, np.full(4, 3.0))   # deg 12 / kept 4


def test_fanout_unbiased_estimator():
    """E[sum of rescaled norms per (src, dst)] == full per-edge norm: every
    out-edge of a degree-d node is kept w.p. k/d and rescaled by d/k."""
    structure = _star_plus_chain(hub_degree=10)
    index = batching.EdgeIndex(structure)
    nodes = np.asarray([0], dtype=np.int32)
    fanout, draws = 4, 8000
    rng = np.random.default_rng(42)
    acc = np.zeros(len(structure.src), dtype=np.float64)
    for _ in range(draws):
        eids, _, scale = index.hop_sampled(nodes, fanout, rng)
        assert len(eids) == fanout          # degree 10 > 4: always capped
        # hop_sampled indexes the src-sorted edge arrays; map back through
        # the index's own ordering for the accumulation
        acc_idx = np.asarray(eids)
        np.add.at(acc, acc_idx, scale * index.norm[acc_idx])
    est = acc / draws
    full = np.zeros_like(est)
    hub_eids = index.out_edges(nodes)
    full[hub_eids] = index.norm[hub_eids]
    # per-edge std of the mean ~= norm * sqrt(1.5/draws) <= 0.014; 0.05 = 3.6σ
    np.testing.assert_allclose(est, full, atol=0.05)


def test_fanout_bounds_shapes():
    """Per-hop edge count <= frontier * fanout — the HBM bound."""
    structure = _star_plus_chain(hub_degree=64)
    index = batching.EdgeIndex(structure)
    mb = batching.sample_minibatch(index, np.asarray([0], dtype=np.int32),
                                   num_layers=2, fanout=4,
                                   rng=np.random.default_rng(1),
                                   edge_bucket=8, node_bucket=8)
    # layer order is reversed (model layer l consumes hop L-1-l): the LAST
    # layer block is hop 0 (frontier = 1 batch node)
    hop0 = mb.layer_edges[-1]
    real0 = int((hop0.norm != 0).sum())
    assert real0 <= 4
    hop1 = mb.layer_edges[0]
    real1 = int((hop1.norm != 0).sum())
    assert real1 <= 4 * 4                   # <= |hop-0 neighbours| * fanout
    # vs full expansion: hop 0 alone would carry 64 edges
    full = batching.sample_minibatch(index, np.asarray([0], dtype=np.int32),
                                     num_layers=2)
    assert int((full.layer_edges[-1].norm != 0).sum()) == 64


def test_fanout_per_hop_list():
    structure = _star_plus_chain(hub_degree=16)
    index = batching.EdgeIndex(structure)
    mb = batching.sample_minibatch(index, np.asarray([0], dtype=np.int32),
                                   num_layers=2, fanout=[2, -1],
                                   rng=np.random.default_rng(7),
                                   edge_bucket=8, node_bucket=8)
    assert int((mb.layer_edges[-1].norm != 0).sum()) == 2   # hop 0 capped
    # hop 1 uncapped: all out-edges of the 2 sampled neighbours survive
    # with unit scale (norms match the index's exactly)
    hop1 = mb.layer_edges[0]
    real = hop1.norm[hop1.norm != 0]
    assert np.all(np.isin(real, index.norm))


@pytest.fixture(scope="module")
def nc_artifact(tmp_path_factory):
    d = tmp_path_factory.mktemp("nc_sampling")
    paths = synth.make_nc_dataset(str(d))
    config = apply_defaults(synth.nc_config(paths))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "dataset.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


def _run_nc(art, config, **task_overrides):
    config = copy.deepcopy(config)
    config["task"].update(task_overrides)
    config["model"]["epoch"] = 8
    tsv = TSV("/dev/null", "w", dry_run=True)
    return node_classification.run(art, config, tsv, featureless=False,
                                   test_split="test", checkpoint=None,
                                   seed=5)


def test_nc_driver_fanout_smoke(nc_artifact):
    """Capped training runs end-to-end and still learns the literal signal.
    The mixed per-hop list form pins the double-normalization path
    (run() normalizes, make_batches normalizes again — must be
    idempotent)."""
    art, config = nc_artifact
    _, _, loss, acc, _, _ = _run_nc(art, config, batchsize=8,
                                    neighbor_fanout=[4, -1],
                                    neighbor_fanout_rounds=2)
    assert np.isfinite(loss)
    assert acc >= 0.6, f"sampled-training accuracy {acc}"


@pytest.mark.slow      # two full driver runs (~30 s); quick tier keeps the smoke
def test_nc_driver_huge_fanout_bit_equal(nc_artifact):
    """A cap that never binds must reproduce the unsampled run exactly
    (same jax seed, no rng consumed by the no-drop fast path)."""
    art, config = nc_artifact
    base = _run_nc(art, config, batchsize=8)
    capped = _run_nc(art, config, batchsize=8, neighbor_fanout=100000)
    assert base[2] == capped[2] and base[3] == capped[3]
    np.testing.assert_array_equal(base[4], capped[4])


# ---------------------------------------------------------------------------
# link prediction: neighbor_fanout on node-sliced (gcn_batchsize) training
# batches; valid/test batches and ranking always expand fully
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lp_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("lp_sampling")
    paths = synth.make_lp_dataset(str(d))
    config = apply_defaults(synth.lp_config(paths, epochs=6))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "ds.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


def _real_edges(batch) -> int:
    return sum(int((np.asarray(eb.norm) != 0).sum()) for eb in batch.edges)


def test_lp_fanout_bounds_train_batches(lp_setup):
    """Same facts, pools and candidate counts — only the subgraph edge
    arrays shrink under the cap."""
    art, config = lp_setup
    from mrgcn_tpu.tasks.common import prepare_inputs
    inputs = prepare_inputs(art, config, featureless=True)
    data = np.asarray(art.data["train"])
    kw = dict(gcn_batchsize=10, test_batchsize=25, num_layers=2)
    full = link_prediction.make_lp_batches(inputs, data, **kw)
    capped = link_prediction.make_lp_batches(
        inputs, data, fanout=[2, 2], rng=np.random.default_rng(0), **kw)
    assert len(full) == len(capped) > 1
    for f, c in zip(full, capped):
        np.testing.assert_array_equal(np.asarray(f.data), np.asarray(c.data))
        np.testing.assert_array_equal(np.asarray(f.corrupt_pool),
                                      np.asarray(c.corrupt_pool))
        assert f.num_valid == c.num_valid
        assert _real_edges(c) <= _real_edges(f)
    assert (sum(_real_edges(c) for c in capped)
            < sum(_real_edges(f) for f in full))


def test_lp_driver_fanout_smoke(lp_setup):
    """Sampled LP training end-to-end: node-sliced batches, mixed per-hop
    cap, two resample rounds; ranking stays sane."""
    art, config = lp_setup
    config = copy.deepcopy(config)
    config["task"].update({"gcn_batchsize": 16, "test_batchsize": 30,
                           "neighbor_fanout": 3,
                           "neighbor_fanout_rounds": 2})
    config["model"]["epoch"] = 6
    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss, mrr, hits, ranks = link_prediction.run(
        art, config, tsv, featureless=True, test_split="test",
        checkpoint=None, seed=3)
    assert np.isfinite(loss)
    assert 0.0 < mrr["raw"] <= 1.0
    assert all(r >= 1 for r in ranks["raw"])


def test_lp_fanout_full_graph_warns(lp_setup, caplog):
    """Full-graph LP mode ignores the cap loudly (ranking exactness)."""
    art, config = lp_setup
    config = copy.deepcopy(config)
    config["task"].update({"neighbor_fanout": 4})
    config["model"]["epoch"] = 1
    tsv = TSV("/dev/null", "w", dry_run=True)
    import logging as _logging
    with caplog.at_level(_logging.WARNING,
                         logger="mrgcn_tpu.tasks.link_prediction"):
        link_prediction.run(art, config, tsv, featureless=True,
                            test_split="test", checkpoint=None, seed=3)
    assert any("neighbor_fanout is ignored" in r.message
               for r in caplog.records)


@pytest.mark.slow      # two full driver runs; quick tier keeps the smoke
def test_lp_driver_huge_fanout_bit_equal(lp_setup):
    """A cap that never binds reproduces the unsampled mini-batch run
    exactly (no rng consumed by the no-drop fast path)."""
    art, config = lp_setup

    def _run(**overrides):
        cfg = copy.deepcopy(config)
        cfg["task"].update({"gcn_batchsize": 16, "test_batchsize": 30,
                            **overrides})
        cfg["model"]["epoch"] = 4
        tsv = TSV("/dev/null", "w", dry_run=True)
        return link_prediction.run(art, cfg, tsv, featureless=True,
                                   test_split="test", checkpoint=None,
                                   seed=3)

    base = _run()
    capped = _run(neighbor_fanout=100000)
    assert base[2] == capped[2]
    assert base[3] == capped[3]
    np.testing.assert_array_equal(base[5]["raw"], capped[5]["raw"])
