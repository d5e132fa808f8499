"""Multi-chip training parity: the real task drivers under a device mesh.

tests/conftest.py forces a virtual 8-device CPU platform, so these tests
exercise the actual GSPMD partitioning (sharded edges/features, sharded
params, psum-ed aggregation) that runs on a real TPU slice — and assert the
sharded run reproduces the single-device metrics (same seeds, same data;
only floating-point reduction order differs).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import copy

import numpy as np
import pytest

import jax

from mrgcn_tpu.config import apply_defaults
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.mkdataset import build
from mrgcn_tpu.tasks import link_prediction, node_classification

from tests import synth


@pytest.fixture(scope="module")
def nc_artifact(tmp_path_factory):
    d = tmp_path_factory.mktemp("nc_mesh")
    paths = synth.make_nc_dataset(str(d))
    config = apply_defaults(synth.nc_config(paths))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "dataset.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


@pytest.fixture(scope="module")
def lp_artifact(tmp_path_factory):
    d = tmp_path_factory.mktemp("lp_mesh")
    paths = synth.make_lp_dataset(str(d))
    config = apply_defaults(synth.lp_config(paths))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "dataset.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


def _with_mesh(config, spec):
    config = copy.deepcopy(config)
    config["task"]["mesh"] = spec
    return config


def test_mesh_from_config_specs():
    from mrgcn_tpu.parallel import mesh as pmesh
    assert pmesh.mesh_from_config({"task": {}}) is None
    m = pmesh.mesh_from_config({"task": {"mesh": "8"}})
    assert dict(m.shape) == {"data": 8, "model": 1}
    m = pmesh.mesh_from_config({"task": {"mesh": "4x2"}})
    assert dict(m.shape) == {"data": 4, "model": 2}
    m = pmesh.mesh_from_config({"task": {"mesh": "auto"}})
    assert dict(m.shape) == {"data": len(jax.devices()), "model": 1}


@pytest.mark.parametrize("spec", ["8", "4x2"])
def test_nc_mesh_parity(nc_artifact, spec, monkeypatch):
    art, config = nc_artifact
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 8
    # hold the execution path fixed: gather plans change the FP summation
    # order, which chaotic multi-epoch training amplifies; the mesh itself
    # reproduces the single-device run bit-for-bit
    monkeypatch.setenv("MRGCN_GATHER_PLAN", "0")

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss1, acc1, labels1, _ = node_classification.run(
        art, config, tsv, featureless=False, test_split="test",
        checkpoint=None, seed=3)

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss8, acc8, labels8, _ = node_classification.run(
        art, _with_mesh(config, spec), tsv, featureless=False,
        test_split="test", checkpoint=None, seed=3)

    assert abs(loss1 - loss8) < 5e-3, (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6, (acc1, acc8)
    np.testing.assert_array_equal(labels1, labels8)


def test_nc_mesh_minibatch_parity(nc_artifact):
    """Mini-batch NC under the mesh reproduces the single-device run (the
    mesh replicates params for the bucketed mini-batch programs)."""
    art, config = nc_artifact
    config = copy.deepcopy(config)
    config["task"]["batchsize"] = 16
    config["model"]["epoch"] = 6

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss1, acc1, _, _ = node_classification.run(
        art, config, tsv, featureless=False, test_split="test",
        checkpoint=None, seed=3)
    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss8, acc8, _, _ = node_classification.run(
        art, _with_mesh(config, "8"), tsv, featureless=False,
        test_split="test", checkpoint=None, seed=3)
    assert np.isfinite(loss1)
    assert abs(loss1 - loss8) < 5e-3, (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6, (acc1, acc8)


def test_artifact_survives_repeated_runs(nc_artifact):
    """Regression: the run driver must not consume the loaded artifact —
    construct_feature_matrix used to pop F and noise arrays in place, so a
    second run on the same Artifact silently trained featureless."""
    art, config = nc_artifact
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 2
    keys_before = set(art.F.keys())

    def once():
        tsv = TSV("/dev/null", "w", dry_run=True)
        _, _, loss, acc, _, _ = node_classification.run(
            art, config, tsv, featureless=False, test_split="test",
            checkpoint=None, seed=3)
        return loss, acc

    r1, r2 = once(), once()
    assert set(art.F.keys()) == keys_before
    assert r1 == r2, f"artifact mutated between runs: {r1} vs {r2}"


def test_lp_mesh_parity(lp_artifact, monkeypatch):
    art, config = lp_artifact
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 10
    monkeypatch.setenv("MRGCN_GATHER_PLAN", "0")

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss1, mrr1, hits1, ranks1 = link_prediction.run(
        art, config, tsv, featureless=True, test_split="test",
        checkpoint=None, seed=3)

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss8, mrr8, hits8, ranks8 = link_prediction.run(
        art, _with_mesh(config, "8"), tsv, featureless=True,
        test_split="test", checkpoint=None, seed=3)

    assert abs(loss1 - loss8) < 5e-3, (loss1, loss8)
    # ranking (incl. tie handling and filtering) must agree rank-for-rank
    assert abs(mrr1["raw"] - mrr8["raw"]) < 5e-3, (mrr1, mrr8)
    assert abs(mrr1["flt"] - mrr8["flt"]) < 5e-3
    agree = np.mean(np.asarray(ranks1["raw"]) == np.asarray(ranks8["raw"]))
    assert agree > 0.95, f"only {agree:.2%} of raw ranks agree"
