"""mrgcn_tpu — a TPU-native Multimodal Relational Graph Convolutional Network
framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of wxwilcke/mrgcn
(reference: /root/reference, v3.0.0): N-Triples ingestion, XSD/OGC/kgbench
datatype inference across six modalities, per-modality neural encoders fused
into a relational GCN, and node-classification / link-prediction task drivers
with bit-comparable evaluation semantics.

Design stance (TPU-first, not a port):
  * the reference's hstacked ``n x (R*n)`` sparse adjacency
    (reference: mrgcn/encodings/graph_structure.py:38) becomes a
    relation-partitioned COO edge list with precomputed D^-1 edge weights,
    consumed by fused gather/segment-sum XLA programs and Pallas kernels;
  * the reference's manual per-module CPU/GPU placement
    (reference: mrgcn/models/mrgcn.py:136-180) dissolves into one jitted
    XLA program, sharded over a ``jax.sharding.Mesh`` for multi-chip runs;
  * ragged per-predicate encoding sets become dense padded per-modality
    tensors fixed at dataset-build time, so every training step compiles to
    a single static-shape program.
"""

def _version() -> str:
    """Single source of truth for the version: installed metadata first,
    then the in-repo pyproject (the package runs uninstalled from the
    repo root). Mirrors the reference's read_version
    (reference: mrgcn/run.py:160-175)."""
    try:
        from importlib.metadata import PackageNotFoundError, version
        try:
            return version("mrgcn_tpu")
        except PackageNotFoundError:
            pass
    except Exception:
        pass
    import pathlib
    import tomllib
    pyproject = pathlib.Path(__file__).resolve().parent.parent \
        / "pyproject.toml"
    try:
        with open(pyproject, "rb") as f:
            return tomllib.load(f)["project"]["version"]
    except OSError:
        return "0+unknown"


__version__ = _version()
