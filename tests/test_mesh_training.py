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


def _one_nc_step(art, config, mesh_spec, optimizer=None):
    """One full-batch NC train step through the driver's own assembly
    (prepare_inputs -> shard_inputs -> make_batches -> make_steps).
    Returns (loss, acc, params_after) — params_after captures the
    gradients through the optimizer update. Pass an SGD ``optimizer``
    when comparing runs with bf16 modules: Adam turns near-zero-gradient
    sign flips (bf16 reduction-order noise) into full ±lr steps."""
    import jax.numpy as jnp

    from mrgcn_tpu.parallel import mesh as pmesh
    from mrgcn_tpu.tasks import utils as tutils
    from mrgcn_tpu.tasks.common import prepare_inputs
    from mrgcn_tpu.tasks.node_classification import (build_model,
                                                     make_batches,
                                                     make_steps)

    config = _with_mesh(config, mesh_spec) if mesh_spec else \
        copy.deepcopy(config)
    inputs = prepare_inputs(art, config, featureless=False)
    mesh = pmesh.mesh_from_config(config)
    if mesh is not None:
        inputs = pmesh.shard_inputs(mesh, inputs)

    Y_train = np.asarray(art.Y["train"]).reshape(-1, 2)
    model = build_model(inputs, config, len(art.class_map))
    variables = model.init(jax.random.PRNGKey(3), inputs.features,
                           inputs.edges)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh is not None:
        params = pmesh.shard_params(mesh, params)
    import optax
    if optimizer is None:
        optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    model = tutils.with_gate_skip(model, params)
    train_step, _, _, _ = make_steps(model, optimizer, config)

    num_layers = len(model.hidden_dims)
    batches = make_batches(inputs, Y_train, -1, num_layers)
    assert len(batches) == 1
    b = batches[0]
    params, batch_stats, opt_state, loss, acc = train_step(
        params, batch_stats, opt_state, b.features, b.edges, b.idx,
        b.targets, b.weights, jax.random.PRNGKey(7))
    return float(loss), float(acc), jax.tree.map(np.asarray, params), b


def _assert_params_close(p1, p8, tol=2e-4, bf16_tol=None):
    """``bf16_tol`` (when given) applies to the bf16-compute subtrees
    (image CNN, text transformer body): their gradients carry bf16
    reduction-order noise (~0.4% relative), so a handful of elements can
    exceed the f32-grade tolerance without any semantic divergence."""
    leaves1 = jax.tree_util.tree_leaves_with_path(p1)
    leaves8 = jax.tree_util.tree_leaves(p8)
    assert len(leaves1) == len(leaves8)
    for (path, a), b in zip(leaves1, leaves8):
        key = jax.tree_util.keystr(path)
        t = tol
        if bf16_tol is not None and (
                "blob_image" in key or "xsd_string" in key
                or "xsd_anyURI" in key):
            t = bf16_tol
        np.testing.assert_allclose(
            a, b, rtol=t, atol=t,
            err_msg=f"param {key} diverged")


def test_nc_mesh_plans_on_step_parity(nc_artifact, monkeypatch):
    """VERDICT r3 item 3: the plan ENGINE under the mesh, at driver level.
    One train step with MRGCN_GATHER_PLAN=1 (default) and frontier
    restriction OFF: 8-device mesh == single device to a tolerance that
    absorbs psum reduction order (op-level pins show 1e-4 holds)."""
    art, config = nc_artifact
    monkeypatch.setenv("MRGCN_GATHER_PLAN", "1")
    monkeypatch.setenv("MRGCN_RESTRICT_OUT", "0")
    loss1, acc1, p1, _ = _one_nc_step(art, config, None)
    loss8, acc8, p8, _ = _one_nc_step(art, config, "8")
    assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1)), (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6
    _assert_params_close(p1, p8)


def test_nc_mesh_restricted_step_parity(nc_artifact, monkeypatch):
    """VERDICT r3 item 2: the frontier-restricted chain under the mesh.
    The restricted mesh step must match BOTH the restricted single-device
    step and the unrestricted mesh step (restriction is exact: dropped
    rows receive zero cotangent either way)."""
    art, config = nc_artifact
    monkeypatch.setenv("MRGCN_GATHER_PLAN", "1")
    monkeypatch.setenv("MRGCN_RESTRICT_OUT", "1")
    loss1, acc1, p1, b1 = _one_nc_step(art, config, None)
    loss8, acc8, p8, b8 = _one_nc_step(art, config, "8")
    # the mesh run must actually BE restricted (per-layer blocks), with
    # per-shard stacked layer-0 plans
    assert isinstance(b8.edges, tuple)
    l0 = b8.edges[0]
    assert l0.plans and next(iter(l0.plans.values())).num_shards == 8
    assert l0.mesh is not None
    assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1)), (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6
    _assert_params_close(p1, p8)

    monkeypatch.setenv("MRGCN_RESTRICT_OUT", "0")
    loss8u, _, p8u, _ = _one_nc_step(art, config, "8")
    assert abs(loss8 - loss8u) < 1e-4 * max(1.0, abs(loss8)), (loss8,
                                                               loss8u)
    _assert_params_close(p8, p8u, tol=5e-4)


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


def test_lp_mesh_minibatch_ranking_parity(lp_artifact, monkeypatch):
    """VERDICT r3 item 7: LP ranking under a mini-batch mesh — node-sliced
    gcn_batchsize batches with locally remapped triples, filtered ranking
    via distmult.launch_ranks over sharded embeddings. Rank-for-rank
    agreement with the single-device run pins the candidate masking."""
    art, config = lp_artifact
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 6
    config["task"]["gcn_batchsize"] = 12
    config["task"]["mrr_batchsize"] = 20

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss1, mrr1, hits1, ranks1 = link_prediction.run(
        art, config, tsv, featureless=True, test_split="test",
        checkpoint=None, seed=5)

    tsv = TSV("/dev/null", "w", dry_run=True)
    _, _, loss8, mrr8, hits8, ranks8 = link_prediction.run(
        art, _with_mesh(config, "8"), tsv, featureless=True,
        test_split="test", checkpoint=None, seed=5)

    assert abs(loss1 - loss8) < 5e-3, (loss1, loss8)
    assert abs(mrr1["raw"] - mrr8["raw"]) < 5e-3, (mrr1, mrr8)
    assert abs(mrr1["flt"] - mrr8["flt"]) < 5e-3
    for kind in ("raw", "flt"):
        agree = np.mean(np.asarray(ranks1[kind])
                        == np.asarray(ranks8[kind]))
        assert agree > 0.95, f"only {agree:.2%} of {kind} ranks agree"


@pytest.fixture(scope="module")
def mm_artifact(tmp_path_factory):
    """Full-multimodal NC: all six encoder families (MLP1/MLP2/text/
    TCNN-WKT/image) — the modalities round 4 never ran under a mesh."""
    d = tmp_path_factory.mktemp("mm_mesh")
    paths, config = synth.make_full_mm_nc(str(d), epochs=4)
    config = apply_defaults(config)
    A, F, Y, data, sample_map, class_map = build(config)
    assert {"xsd.string", "ogc.wktLiteral", "blob.image"} <= set(F.keys())
    path = str(d / "dataset.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


@pytest.mark.parametrize("spec", ["8", "4x2"])
def test_nc_mesh_full_multimodal_step_parity(mm_artifact, spec,
                                             monkeypatch):
    """VERDICT r4 item 1: string + image + WKT encoders under the mesh.
    One driver-level train step (losses, accuracies AND updated params)
    must match the single-device step at 1e-4."""
    import optax
    art, config = mm_artifact
    monkeypatch.setenv("MRGCN_RESTRICT_OUT", "0")
    sgd = lambda: optax.sgd(0.1)
    loss1, acc1, p1, _ = _one_nc_step(art, config, None, optimizer=sgd())
    loss8, acc8, p8, _ = _one_nc_step(art, config, spec, optimizer=sgd())
    assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1)), (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6
    _assert_params_close(p1, p8, bf16_tol=1e-3)


def test_nc_mesh_multimodal_pallas_kernels_step_parity(mm_artifact,
                                                       monkeypatch):
    """The encoder Pallas kernels (fused attention core, fused MLP)
    executing INSIDE shard_map over the mesh (interpret mode on CPU)
    reproduce the single-device kernel step — validates the lifted
    under_mesh gate end-to-end, params included."""
    import optax
    art, config = mm_artifact
    monkeypatch.setenv("MRGCN_RESTRICT_OUT", "0")
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    sgd = lambda: optax.sgd(0.1)
    loss1, acc1, p1, _ = _one_nc_step(art, config, None, optimizer=sgd())
    loss8, acc8, p8, _ = _one_nc_step(art, config, "4x2", optimizer=sgd())
    assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1)), (loss1, loss8)
    assert abs(acc1 - acc8) < 1e-6
    _assert_params_close(p1, p8, bf16_tol=1e-3)


def test_nc_mesh_full_multimodal_training_parity(mm_artifact, monkeypatch,
                                                 tmp_path):
    """Multi-epoch driver run, mesh vs single device, full modality
    surface (slow-tier companion of the step-parity pins).

    Exactness per step is pinned by the step-parity tests (1e-4); over
    multiple epochs the two shardings accumulate float-reduction-order
    drift that a tiny 11-node test split amplifies chaotically (one
    flipped prediction = 9% accuracy). So this test asserts what the
    multi-epoch property actually is: the TRAIN-loss trajectory tracks
    epoch for epoch, and the final evaluation stays in the same
    neighbourhood."""
    import csv
    art, config = mm_artifact
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 4
    monkeypatch.setenv("MRGCN_GATHER_PLAN", "0")

    def run(cfg, tag):
        path = tmp_path / f"{tag}.tsv"
        tsv = TSV(str(path), "w")
        out = node_classification.run(art, cfg, tsv, featureless=False,
                                      test_split="test", checkpoint=None,
                                      seed=3)
        tsv.close()
        with open(path) as f:
            rows = list(csv.reader(f, delimiter="\t"))[1:]
        train = [float(r[1]) for r in rows if r[0] != "-1"]
        return out[2], out[3], train

    loss1, acc1, train1 = run(config, "single")
    loss8, acc8, train8 = run(_with_mesh(config, "4x2"), "mesh")
    assert len(train1) == len(train8) == 4
    for a, b in zip(train1, train8):
        assert abs(a - b) < 2e-2 * max(1.0, abs(a)), (train1, train8)
    assert abs(loss1 - loss8) < 0.1, (loss1, loss8)
    # at most one of the 11 test nodes may flip under float drift
    assert abs(acc1 - acc8) <= 1.0 / 11 + 1e-6, (acc1, acc8)
