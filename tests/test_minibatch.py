"""Mini-batch (L-hop BFS) tests: sampling invariants + end-to-end parity."""

import copy

import numpy as np
import pytest

from mrgcn_tpu.data import batching
from mrgcn_tpu.data.kg import KnowledgeGraph
from mrgcn_tpu.data.rdf import IRI
from mrgcn_tpu.encodings import structure as structure_mod


def _line_graph(n=10):
    """0 -> 1 -> 2 -> ... with a single property."""
    t = [(IRI(f"http://x/e{i}"), IRI("http://x/p"), IRI(f"http://x/e{i+1}"))
         for i in range(n - 1)]
    cfg = {"graph": {"structural": {
        "include_inverse_properties": False,
        "exclude_properties": [], "separate_literals": False,
        "multiprocessing": False}}}
    s, nodes_map, _ = structure_mod.generate(KnowledgeGraph(t), cfg)
    return s, nodes_map


def test_bfs_hops_follow_edges():
    s, nodes_map = _line_graph()
    index = batching.EdgeIndex(s)
    e0 = nodes_map[IRI("http://x/e0")]
    e1 = nodes_map[IRI("http://x/e1")]
    e2 = nodes_map[IRI("http://x/e2")]

    mb = batching.sample_minibatch(index, np.array([e0]), num_layers=2)
    # outermost hop reaches 2 steps from e0: {e0, e1, e2} via self-loops
    assert e2 in mb.outer_nodes and e1 in mb.outer_nodes
    assert mb.num_batch == 1
    assert len(mb.layer_edges) == 2


def test_minibatch_forward_matches_fullbatch():
    """A mini-batch forward over the full node set must equal the full-batch
    forward (same weights, eval mode)."""
    import jax
    import jax.numpy as jnp
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock

    s, nodes_map = _line_graph(8)
    n, R = s.num_nodes, s.num_relations
    full_edges = EdgeBlock(src=jnp.asarray(s.src), dst=jnp.asarray(s.dst),
                           rel=jnp.asarray(s.rel), norm=jnp.asarray(s.norm),
                           num_out=n)
    model = RGCN(hidden_dims=(6, 4), num_relations=R, num_nodes=n,
                 featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, full_edges)
    full_out = np.asarray(model.apply(params, None, full_edges))

    index = batching.EdgeIndex(s)
    batch_nodes = np.arange(n, dtype=np.int32)
    mb = batching.sample_minibatch(index, batch_nodes, num_layers=2,
                                   edge_bucket=32, node_bucket=8)
    mini_out = np.asarray(model.apply(params, None, mb.layer_edges))
    np.testing.assert_allclose(mini_out[:n], full_out, rtol=1e-5, atol=1e-5)


def test_subset_features_remaps_to_local():
    import jax.numpy as jnp
    feats = {"xsd_numeric_0": (jnp.asarray(np.arange(10.0).reshape(5, 2)),
                               jnp.asarray([1, 3, 5, 7, 9]))}
    outer = np.array([3, 5, 9])
    sub = batching.subset_features(feats, outer, row_bucket=4)
    data, local = sub["xsd_numeric_0"]
    # rows for nodes 3, 5, 9 -> local positions 0, 1, 2; padded to 4 rows
    assert data.shape[0] == 4
    np.testing.assert_array_equal(np.asarray(local)[:3], [0, 1, 2])
    assert int(np.asarray(local)[3]) > len(outer)  # pad points out of range


def test_nc_minibatch_end_to_end(tmp_path):
    from mrgcn_tpu.config import apply_defaults
    from mrgcn_tpu.data import artifact as artifact_io
    from mrgcn_tpu.data.tsv import TSV
    from mrgcn_tpu.mkdataset import build
    from mrgcn_tpu.tasks import node_classification
    from tests import synth

    paths = synth.make_nc_dataset(str(tmp_path))
    config = apply_defaults(synth.nc_config(paths, epochs=30))
    config["task"]["batchsize"] = 16  # mini-batch mode

    A, F, Y, data, sample_map, class_map = build(config)
    path = str(tmp_path / "ds.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    art = artifact_io.load(path)

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss, acc, labels, targets = node_classification.run(
        art, config, tsv, featureless=False, test_split="test",
        checkpoint=None, seed=3)
    assert np.isfinite(loss)
    assert acc >= 0.7, f"mini-batch test accuracy {acc}"
    assert labels.shape == targets.shape
