"""Smaller subsystems: platform override, artifact versioning, layer-dim
derivation, module naming, TSV."""

import json

import numpy as np
import pytest

from mrgcn_tpu.config import apply_defaults
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.models.mrgcn import module_names
from mrgcn_tpu.tasks.common import hidden_dims_from_config


def test_hidden_dims_nc_two_layers():
    cfg = {"model": {"layers": [{"hidden_nodes": 16}, {}]}}
    assert hidden_dims_from_config(cfg, 4) == (16, 4)


def test_hidden_dims_nc_three_layers():
    cfg = {"model": {"layers": [{"hidden_nodes": 32},
                                {"hidden_nodes": 16}, {}]}}
    assert hidden_dims_from_config(cfg, 7) == (32, 16, 7)


def test_hidden_dims_lp_single_entry():
    # LP: the final config entry is not a layer
    # (reference: link_prediction.py:449-464)
    cfg = {"model": {"layers": [{"hidden_nodes": 200}]}}
    assert hidden_dims_from_config(cfg, None) == (200,)


def test_hidden_dims_lp_two_entries():
    cfg = {"model": {"layers": [{"hidden_nodes": 200}, {}]}}
    assert hidden_dims_from_config(cfg, None) == (200,)


def test_module_names_per_family_counters():
    cfg = (
        ("xsd.boolean", (1, 2, 0.0)),
        ("xsd.numeric", (1, 2, 0.0)),      # shares the numeric counter
        ("xsd.date", (10, 2, 0.0)),
        ("xsd.gYear", (6, 2, 0.0)),        # shares the temporal counter
        ("xsd.string", (None, 2, 0.0)),
        ("xsd.anyURI", (None, 2, 0.0)),    # shares the llm counter
    )
    assert module_names(cfg) == (
        "xsd_boolean_0", "xsd_numeric_1", "xsd_date_0", "xsd_gYear_1",
        "xsd_string_0", "xsd_anyURI_1")


def test_artifact_rejects_newer_format(tmp_path):
    from mrgcn_tpu.encodings.structure import GraphStructure
    s = GraphStructure(num_nodes=2, num_relations=1,
                       src=np.array([0], dtype=np.int32),
                       dst=np.array([1], dtype=np.int32),
                       rel=np.array([0], dtype=np.int32),
                       norm=np.array([1.0], dtype=np.float32))
    path = str(tmp_path / "a.npz")
    artifact_io.save(path, s, {})

    # tamper: bump the version
    data = dict(np.load(path, allow_pickle=False))
    manifest = json.loads(bytes(data["manifest"]).decode())
    manifest["format_version"] = 999
    data["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez_compressed(path, **data)

    with pytest.raises(ValueError, match="newer format"):
        artifact_io.load(path)


def test_platform_override_noop_without_env(monkeypatch):
    from mrgcn_tpu.utils.platform import apply_platform_override
    monkeypatch.delenv("MRGCN_PLATFORM", raising=False)
    apply_platform_override()  # must not raise nor touch jax config


def test_tsv_dry_run_writes_nothing(tmp_path):
    path = str(tmp_path / "x.tsv")
    w = TSV(path, "w", dry_run=True)
    w.writerow(["a", "b"])
    import os
    assert not os.path.exists(path)


def test_phase_timer():
    from mrgcn_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase("alpha"):
        pass
    with t.phase("alpha"):
        pass
    assert t.counts["alpha"] == 2
    assert "alpha" in t.summary()


def test_nc_tsv_format(tmp_path):
    """The NC metrics TSV keeps the reference's 7-column layout."""
    from mrgcn_tpu.config import apply_defaults
    from mrgcn_tpu.data import artifact as artifact_io
    from mrgcn_tpu.mkdataset import build
    from mrgcn_tpu.tasks import node_classification
    from tests import synth

    paths = synth.make_nc_dataset(str(tmp_path), num_entities=20)
    config = apply_defaults(synth.nc_config(paths, epochs=2))
    A, F, Y, data, sample_map, class_map = build(config)
    p = str(tmp_path / "d.npz")
    artifact_io.save(p, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)

    out = str(tmp_path / "acc.tsv")
    w = TSV(out, "w")
    node_classification.run(artifact_io.load(p), config, w,
                            featureless=False, test_split="valid",
                            checkpoint=None, seed=1)
    lines = open(out).read().strip().split("\n")
    header = lines[0].split("\t")
    assert header == ["epoch", "training_loss", "training_accurary",
                      "validation_loss", "validation_accuracy",
                      "test_loss", "test_accuracy"]
    assert all(len(line.split("\t")) == 7 for line in lines)
    assert len(lines) == 1 + 2 + 1  # header + 2 epochs + final test row
