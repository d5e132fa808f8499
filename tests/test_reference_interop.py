"""Reference-artifact interop: tarballs written by the UPSTREAM mkdataset
load and train here, matching our own npz-artifact pipeline.

The reference implementation runs in a subprocess against the rdflib/toml
shims (benchmarks/parity/shims) — the same harness PARITY.md's accuracy
runs use — so the tarballs under test are produced by the actual upstream
writer (reference: mrgcn/data/io/tarball.py, mkdataset.py:119-122), not a
reimplementation of it.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
SHIMS = os.path.join(REPO, "benchmarks", "parity", "shims")
NC_CONFIG = os.path.join(REPO, "benchmarks", "parity", "nc_config.toml")
LP_CONFIG = os.path.join(REPO, "benchmarks", "parity", "lp_config.toml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "mrgcn")),
    reason="reference checkout not available")


def _reference_tar(config: str, out_dir: str) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS + ":" + REFERENCE
    env.pop("JAX_PLATFORMS", None)
    subprocess.run(
        [sys.executable, "mrgcn/mkdataset.py", "-c", config,
         "-o", out_dir + "/"],
        cwd=REFERENCE, env=env, check=True, capture_output=True,
        timeout=600)
    return max((os.path.join(out_dir, f) for f in os.listdir(out_dir)
                if f.endswith(".tar")), key=os.path.getmtime)


@pytest.fixture(scope="module")
def nc_pair(tmp_path_factory):
    """(reference-tar Artifact, our-build Artifact, config) on the
    bundled NC smoke dataset."""
    d = str(tmp_path_factory.mktemp("reftar_nc"))
    from mrgcn_tpu.config import load_config
    from mrgcn_tpu.data import artifact as artifact_io
    from mrgcn_tpu.data.reference_tar import artifact_from_reference_tar
    from mrgcn_tpu.mkdataset import build

    tar = _reference_tar(NC_CONFIG, d)
    theirs = artifact_from_reference_tar(tar)

    config = load_config(NC_CONFIG)
    A, F, Y, data, sample_map, class_map = build(config)
    path = os.path.join(d, "ours.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return theirs, artifact_io.load(path), config


def _canon(structure):
    order = np.lexsort((structure.dst, structure.src, structure.rel))
    return (structure.src[order], structure.dst[order],
            structure.rel[order], structure.norm[order])


def test_reference_tar_structure_matches_ours(nc_pair):
    theirs, ours, _ = nc_pair
    assert theirs.structure.num_nodes == ours.structure.num_nodes
    assert theirs.structure.num_relations == ours.structure.num_relations
    ts, td, tr, tn = _canon(theirs.structure)
    os_, od, orr, on = _canon(ours.structure)
    np.testing.assert_array_equal(ts, os_)
    np.testing.assert_array_equal(td, od)
    np.testing.assert_array_equal(tr, orr)
    np.testing.assert_allclose(tn, on, rtol=1e-6, atol=1e-7)


def test_reference_tar_features_and_labels_match_ours(nc_pair):
    theirs, ours, _ = nc_pair
    assert set(theirs.F) == set(ours.F)
    for datatype in ours.F:
        assert len(theirs.F[datatype]) == len(ours.F[datatype])
        for (te, ti, _), (oe, oi, _) in zip(theirs.F[datatype],
                                            ours.F[datatype]):
            # per-set rows may be ordered differently; compare as keyed
            # rows (node_idx -> encoding)
            t = {int(i): tuple(np.asarray(r, dtype=np.float64))
                 for i, r in zip(ti, te)}
            o = {int(i): tuple(np.asarray(r, dtype=np.float64))
                 for i, r in zip(oi, oe)}
            assert set(t) == set(o)
            for k in t:
                np.testing.assert_allclose(t[k], o[k], rtol=1e-5,
                                           atol=1e-6)
    assert theirs.class_map == ours.class_map
    assert set(theirs.Y) == set(ours.Y)
    for split in ours.Y:
        t = {tuple(r) for r in np.asarray(theirs.Y[split])}
        o = {tuple(r) for r in np.asarray(ours.Y[split])}
        assert t == o, f"Y[{split}] differs"
    for split, samples in ours.sample_map.items():
        assert sorted(theirs.sample_map[split]) == sorted(samples)


@pytest.mark.slow  # tiering: training round trip; structural round trips stay quick
def test_reference_tar_trains_like_npz_artifact(nc_pair):
    """The VERDICT round trip: train on the reference tarball, train on
    our npz artifact — identical seeds must give identical metrics."""
    import copy

    from mrgcn_tpu.data.tsv import TSV
    from mrgcn_tpu.tasks import node_classification

    theirs, ours, config = nc_pair
    config = copy.deepcopy(config)
    config["model"]["epoch"] = 8

    def train(art):
        tsv = TSV("/dev/null", "w", dry_run=True)
        _, _, loss, acc, labels, _ = node_classification.run(
            art, config, tsv, featureless=False, test_split="test",
            checkpoint=None, seed=3)
        return loss, acc, np.asarray(labels)

    loss_t, acc_t, labels_t = train(theirs)
    loss_o, acc_o, labels_o = train(ours)
    assert abs(loss_t - loss_o) < 1e-5, (loss_t, loss_o)
    assert abs(acc_t - acc_o) < 1e-6, (acc_t, acc_o)


@pytest.mark.slow
def test_reference_lp_tar_trains(tmp_path):
    """LP tarball: triple index arrays import and the LP driver trains
    and ranks on them, matching our npz path."""
    import copy

    from mrgcn_tpu.config import load_config
    from mrgcn_tpu.data import artifact as artifact_io
    from mrgcn_tpu.data.reference_tar import artifact_from_reference_tar
    from mrgcn_tpu.data.tsv import TSV
    from mrgcn_tpu.mkdataset import build
    from mrgcn_tpu.tasks import link_prediction

    tar = _reference_tar(LP_CONFIG, str(tmp_path))
    theirs = artifact_from_reference_tar(tar)

    config = load_config(LP_CONFIG)
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(tmp_path / "ours.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    ours = artifact_io.load(path)

    assert set(theirs.data) == set(ours.data)
    for split in ours.data:
        t = {tuple(r) for r in np.asarray(theirs.data[split])}
        o = {tuple(r) for r in np.asarray(ours.data[split])}
        assert t == o, f"data[{split}] differs"

    # triple row ORDER differs between the writers (each follows its own
    # graph-iteration order) and only seeds which rows the in-jit
    # corruption picks — canonicalize both so the training comparison is
    # deterministic
    def canon(art):
        for split, mat in art.data.items():
            mat = np.asarray(mat)
            art.data[split] = mat[np.lexsort(mat.T[::-1])]
        return art

    theirs, ours = canon(theirs), canon(ours)

    config = copy.deepcopy(config)
    config["model"]["epoch"] = 4

    def train(art):
        tsv = TSV("/dev/null", "w", dry_run=True)
        _, _, loss, mrr, hits, ranks = link_prediction.run(
            art, config, tsv, featureless=True, test_split="test",
            checkpoint=None, seed=3)
        return loss, mrr, ranks

    loss_t, mrr_t, ranks_t = train(theirs)
    loss_o, mrr_o, ranks_o = train(ours)
    assert abs(loss_t - loss_o) < 1e-5, (loss_t, loss_o)
    assert abs(mrr_t["raw"] - mrr_o["raw"]) < 1e-6
    assert ranks_t["raw"] == ranks_o["raw"]


def test_pack_identity_layout():
    """_pack_identity places logical (S, n, out) rows at the packed
    coordinates the gather engine reads (rspmm.packed_identity_shape:
    node r*k + lane//sub at lanes lane%sub < out), zeros elsewhere."""
    from mrgcn_tpu.ops.rspmm import packed_identity_shape, packing_factor
    from mrgcn_tpu.tasks.torch_import import _pack_identity

    S, n, out = 3, 37, 16
    shape, k = packed_identity_shape(S, n, out)
    assert k == packing_factor(out) and k > 1
    rng = np.random.default_rng(0)
    W = rng.standard_normal((S, n, out)).astype(np.float32)
    packed = _pack_identity(W, shape, n, out)
    sub = shape[2] // k
    for (s, node, c) in [(0, 0, 0), (1, 36, 15), (2, 17, 3)]:
        r, lane = node // k, (node % k) * sub + c
        assert packed[s, r, lane] == W[s, node, c]
    # padding slots (beyond out, beyond n) are zero
    assert packed[:, :, out:sub].sum() == 0
    assert np.abs(packed).sum() == pytest.approx(np.abs(W).sum(), rel=1e-6)


@pytest.mark.slow
def test_torch_checkpoint_import_matches_reference_math(tmp_path):
    """VERDICT round trip for checkpoints: the reference trains and saves
    a torch checkpoint ({epoch, model_state_dict, optimizer_state_dict,
    loss}, reference run.py:230-236); importing it here (tar dataset +
    torch state dict) reproduces the reference's DOCUMENTED forward math
    to float tolerance.

    The oracle is an independent numpy implementation of that math
    (gated MLP encoders -> X assembly -> A@W_I + A@(X W_F) -> ReLU ->
    A@(H W_F)) over the FLOAT normalised adjacency. It deliberately does
    NOT compare against the reference binary's own logits: the reference
    casts the normalised A to **int8** when tensorising batches
    (reference data/batch.py:148-149, 225 — `scipy_sparse_to_pytorch_
    sparse(..., dtype=torch.int8)`), truncating every fractional D^-1
    norm to zero, so its runtime aggregates only over degree-1 relations
    and self-loops. That defect is documented in PARITY.md; this
    framework implements the documented semantics."""
    import copy
    import glob
    import re as _re

    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.config import load_config
    from mrgcn_tpu.data.reference_tar import artifact_from_reference_tar
    from mrgcn_tpu.models.mrgcn import module_names
    from mrgcn_tpu.tasks import utils as tutils
    from mrgcn_tpu.tasks.common import prepare_inputs
    from mrgcn_tpu.tasks.node_classification import build_model
    from mrgcn_tpu.tasks.torch_import import map_state_dict

    d = str(tmp_path)
    tar = _reference_tar(NC_CONFIG, d)

    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS + ":" + REFERENCE
    env.pop("JAX_PLATFORMS", None)
    subprocess.run(
        [sys.executable, "mrgcn/run.py", "-c", NC_CONFIG, "-i", tar,
         "-o", d + "/", "--test", "--save_checkpoint"],
        cwd=REFERENCE, env=env, check=True, capture_output=True,
        text=True, timeout=600)
    ckpt = max(glob.glob(os.path.join(d, "*_model_state_*.pkl")),
               key=os.path.getmtime)

    art = artifact_from_reference_tar(tar)
    config = load_config(NC_CONFIG)
    inputs = prepare_inputs(art, config, featureless=False)
    model = build_model(inputs, config, len(art.class_map))
    variables = model.init(jax.random.PRNGKey(0), inputs.features,
                           inputs.edges)
    state = tutils.load_checkpoint(ckpt)
    assert state["format"] == "torch" and state["epoch"] > 0
    params, batch_stats, unmapped = map_state_dict(
        state["model_state_dict"], model, variables["params"],
        variables.get("batch_stats", {}))
    assert unmapped == []

    ours = np.asarray(model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": batch_stats},
        inputs.features, inputs.edges, train=False))

    # --- independent numpy oracle over the float adjacency ---
    sd = state["model_state_dict"]
    n = art.structure.num_nodes
    Acsr = art.structure.to_scipy_hstack()
    gates = np.asarray(sd["gate_weights"])
    cols = []
    names = module_names(inputs.modules_config)
    for i, (name, (datatype, _)) in enumerate(zip(names,
                                                  inputs.modules_config)):
        enc, node_idx, _ = art.F[datatype][0]
        h = np.asarray(enc, dtype=np.float32)
        j = 0
        while f"module_dict.{name}.mlp.{j}.weight" in sd:
            W = sd[f"module_dict.{name}.mlp.{j}.weight"]
            b = sd[f"module_dict.{name}.mlp.{j}.bias"]
            h = np.maximum(h @ W.T + b, 0.0)
            j += 3  # Linear, Dropout, ReLU triples
        placed = np.zeros((n, h.shape[1]), dtype=np.float32)
        placed[np.asarray(node_idx)] = h * gates[i]
        cols.append(placed)
    X = np.concatenate(cols, axis=1)

    W_I = sd["rgcn.layers.layer_0.weight_I"]
    W_F0 = sd["rgcn.layers.layer_0.weight_F"]
    W_F1 = sd["rgcn.layers.layer_1.weight_F"]
    H = Acsr @ W_I \
        + Acsr @ np.einsum("ij,bjk->bik", X, W_F0).reshape(
            W_F0.shape[0] * n, -1)
    H = np.maximum(H, 0.0)
    oracle = Acsr @ np.einsum("ij,bjk->bik", H, W_F1).reshape(
        W_F1.shape[0] * n, -1)

    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
