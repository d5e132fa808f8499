"""Shared run-time assembly: artifact -> static model inputs.

Bridges the dataset artifact and the jitted model: runs the reference's
``setup_features`` pipeline (merge/noise/outliers → module configs), pads
ragged sets to static shapes once, and builds the edge block + per-encoder
feature arrays the MRGCN consumes.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mrgcn_tpu.data.artifact import Artifact
from mrgcn_tpu.encodings.features import (densify, getDatatypeConfig,
                                          isDatatypeIncluded, setup_features)
from mrgcn_tpu.encodings.xsd.string import ByteTokenizer, pad_symbol_for
from mrgcn_tpu.models.encoders import TCNN_MINIMAL_LENGTH
from mrgcn_tpu.models.mrgcn import module_names
from mrgcn_tpu.models.rgcn import EdgeBlock

logger = logging.getLogger(__name__)


@dataclass
class RunInputs:
    edges: EdgeBlock
    features: Dict[str, Tuple]           # encoder name -> (data, node_idx)
    modules_config: Tuple                 # static, sorted by datatype
    optimizer_config: Dict
    X_width: int
    featureless: bool
    text_vocab_size: int = 259
    text_pad_id: int = 256
    num_nodes: int = 0
    num_relations: int = 0
    structure: object = None              # GraphStructure (for mini-batching)
    hidden_dims: Tuple = ()               # layer widths (for restricted plans)
    identity_basis: bool = False          # featureless plan kind decision


def prepare_inputs(artifact: Artifact, config: Dict,
                   featureless: bool) -> RunInputs:
    structure = artifact.structure
    n = structure.num_nodes

    X, X_width, modules_config, optimizer_config = setup_features(
        artifact.F, n, featureless, config)
    if X_width <= 0:
        featureless = True

    # stable datatype order so encoder instance ids match across runs
    # (reference: run.py:77-78)
    modules_config = sorted(modules_config, key=lambda t: t[0])

    # pad symbols for token sequences (reference:
    # node_classification.py:61-70)
    pad_symbols: Dict[str, int] = {}
    text_pad_id, text_vocab = ByteTokenizer.PAD, ByteTokenizer.VOCAB_SIZE
    for datatype in ("xsd.string", "xsd.anyURI"):
        if isDatatypeIncluded(config, datatype):
            feature_config = getDatatypeConfig(config, datatype) or {}
            pad_symbols[datatype] = pad_symbol_for(feature_config)
            text_pad_id = pad_symbols[datatype]

    # minimum padded lengths so every conv stack fits its input
    min_lengths = {"ogc.wktLiteral": 1}
    for datatype, args in modules_config:
        if datatype == "ogc.wktLiteral":
            size = args[2]
            min_lengths["ogc.wktLiteral"] = max(
                min_lengths["ogc.wktLiteral"], TCNN_MINIMAL_LENGTH[size])

    X = densify(X, pad_symbols=pad_symbols, min_lengths=min_lengths)

    # flatten encoding sets in (sorted-datatype, set) order — the same order
    # modules_config was emitted in — and key them by encoder instance name
    flat_sets: List = []
    for datatype, sets in sorted(X[1:], key=lambda e: e[0]):
        for s in sets:
            flat_sets.append((datatype, s))
    names = module_names(tuple(modules_config))
    assert len(flat_sets) == len(names), \
        f"{len(flat_sets)} encoding sets vs {len(names)} modules"

    features: Dict[str, Tuple] = {}
    for name, (datatype, (enc, node_idx, _)) in zip(names, flat_sets):
        if len(enc) == 0:
            continue
        data = jnp.asarray(enc)
        if datatype in ("xsd.string", "xsd.anyURI"):
            text_vocab = max(text_vocab, int(np.max(enc)) + 1)
        idx_np = np.asarray(node_idx)
        from mrgcn_tpu.ops.placement import build_rows
        features[name] = (data, jnp.asarray(idx_np, dtype=jnp.int32),
                          jnp.asarray(build_rows(idx_np, n)))

    from mrgcn_tpu.encodings.structure import group_by_relation
    grouping = group_by_relation(structure.src, structure.dst,
                                 structure.rel, structure.norm, n)

    # sorted-stream layer plans: static edge layouts for the Pallas
    # scatter/gather engine (ops/relational.py), one per layer shape
    import os
    from mrgcn_tpu.ops import relational as rl
    task = config.get("task", {}).get("type", "")
    out_final = len(artifact.class_map) \
        if task == "node classification" and artifact.class_map \
        else None
    dims = tuple(hidden_dims_from_config(config, out_final))
    # when the composed identity table would not fit HBM and the basis
    # count is stream-friendly, build the identity plans with the
    # dst-sorted bwd_h stream featureless_basis needs (key ":idb")
    num_bases = int(config["model"]["num_bases"])
    basis = rl.basis_stream_wanted(structure.num_relations, n,
                                   dims[0], num_bases)
    plans = None
    if os.environ.get("MRGCN_GATHER_PLAN", "1") != "0":
        shapes = [(None, dims[0])]                     # identity gather
        if not featureless and X_width > 0:
            shapes.append((X_width, dims[0]))
        shapes.extend((dims[i - 1], dims[i]) for i in range(1, len(dims)))
        plans = rl.plans_for_layers(structure.src, structure.dst,
                                    structure.rel, structure.norm, n,
                                    shapes, identity_basis=basis)

    edges = EdgeBlock(plans=plans,
                      src=jnp.asarray(structure.src),
                      dst=jnp.asarray(structure.dst),
                      rel=jnp.asarray(structure.rel),
                      norm=jnp.asarray(structure.norm),
                      num_out=n,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size)

    return RunInputs(edges=edges, features=features,
                     modules_config=tuple(modules_config),
                     optimizer_config=optimizer_config,
                     X_width=X_width, featureless=featureless,
                     text_vocab_size=text_vocab, text_pad_id=text_pad_id,
                     num_nodes=n, num_relations=structure.num_relations,
                     structure=structure, hidden_dims=dims,
                     identity_basis=basis)


def _filter_remap(src, dst, rel, norm, out_nodes):
    """Keep edges whose output node is in ``out_nodes`` (sorted unique);
    remap src to positions in ``out_nodes``. dst stays as given."""
    keep_pos = np.searchsorted(out_nodes, src)
    keep_pos = np.minimum(keep_pos, len(out_nodes) - 1)
    keep = out_nodes[keep_pos] == src
    return (keep_pos[keep].astype(np.int32), dst[keep].astype(np.int32),
            rel[keep].astype(np.int32), norm[keep].astype(np.float32))


def restricted_layer_edges(structure, out_nodes: np.ndarray,
                           num_layers: int, full_edges: EdgeBlock,
                           first_dim: Optional[int] = None,
                           X_width: int = 0, featureless: bool = True,
                           identity_basis: bool = False,
                           group_size: int = 64,
                           min_shrink: float = 0.9,
                           mesh=None) -> Tuple:
    """Per-layer EdgeBlocks for a full-batch pass whose loss reads only
    ``out_nodes`` (sorted unique global node ids).

    Walks frontiers backwards from the labels: each layer aggregates only
    at the rows the layer above actually reads (output restriction is
    exact — dropped rows receive zero cotangent either way; per-edge
    D^-1 norms are untouched). The INPUT layer keeps its global input
    space (identity weight table / feature matrix) and carries
    rectangular sorted-stream plans (ops/relational.build_layer_plans
    with num_out_nodes); the other restricted layers run the
    relation-grouped path at frontier scale. When a frontier stops
    shrinking (>= min_shrink * num_nodes) the remaining layers reuse
    ``full_edges`` and the boundary layer keeps global dst indexing.

    This is the full-batch analogue of the reference's mini-batch BFS
    sampling (reference: mrgcn/data/batch.py:185-197) — same restriction,
    but compiled once as static streams instead of per-batch subgraphs.

    ``mesh``: a ``jax.sharding.Mesh`` — the restricted chain is built for
    multi-chip training: layer-0 plans become per-shard stacked streams
    (the shard_map engine, same as relational.shard_layer_plans for the
    full edge set) and every restricted block's edge/grouped arrays are
    padded and sharded over the data axis.
    """
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import relational as rl

    src = np.asarray(structure.src)
    dst = np.asarray(structure.dst)
    rel = np.asarray(structure.rel)
    norm = np.asarray(structure.norm)
    n = structure.num_nodes

    blocks = [full_edges] * num_layers
    F_next = np.asarray(out_nodes)
    for layer in range(num_layers - 1, -1, -1):
        src_l, dst_l, rel_l, norm_l = _filter_remap(src, dst, rel, norm,
                                                    F_next)
        num_out = int(len(F_next))
        if layer == 0:
            # input layer: dst indexes the GLOBAL identity table / X rows
            plans = None
            if full_edges.plans is not None and first_dim is not None:
                shapes = [(None, first_dim)]
                if not featureless and X_width > 0:
                    shapes.append((X_width, first_dim))
                plans = rl.plans_for_layers(
                    src_l, dst_l, rel_l, norm_l, n, shapes,
                    identity_basis=identity_basis,
                    num_out_nodes=num_out,
                    num_shards=(mesh.shape["data"] if mesh is not None
                                else 1))
            grouping = group_by_relation(src_l, dst_l, rel_l, norm_l,
                                         num_out, group_size=group_size)
            blocks[0] = EdgeBlock(
                src=jnp.asarray(src_l), dst=jnp.asarray(dst_l),
                rel=jnp.asarray(rel_l), norm=jnp.asarray(norm_l),
                num_out=num_out, num_in=None, plans=plans,
                grp_src=jnp.asarray(grouping.src),
                grp_dst=jnp.asarray(grouping.dst),
                grp_norm=jnp.asarray(grouping.norm),
                group_rel=jnp.asarray(grouping.group_rel),
                group_size=grouping.group_size)
            break

        F_cur = np.unique(dst_l)
        if len(F_cur) >= min_shrink * n:
            # frontier covers ~everything: keep global dst, full layers
            # below (their output space is the full node set)
            grouping = group_by_relation(src_l, dst_l, rel_l, norm_l,
                                         num_out, group_size=group_size)
            blocks[layer] = EdgeBlock(
                src=jnp.asarray(src_l), dst=jnp.asarray(dst_l),
                rel=jnp.asarray(rel_l), norm=jnp.asarray(norm_l),
                num_out=num_out, num_in=None,
                grp_src=jnp.asarray(grouping.src),
                grp_dst=jnp.asarray(grouping.dst),
                grp_norm=jnp.asarray(grouping.norm),
                group_rel=jnp.asarray(grouping.group_rel),
                group_size=grouping.group_size)
            break

        dst_local = np.searchsorted(F_cur, dst_l).astype(np.int32)
        grouping = group_by_relation(src_l, dst_local, rel_l, norm_l,
                                     num_out, group_size=group_size)
        blocks[layer] = EdgeBlock(
            src=jnp.asarray(src_l), dst=jnp.asarray(dst_local),
            rel=jnp.asarray(rel_l), norm=jnp.asarray(norm_l),
            num_out=num_out, num_in=int(len(F_cur)),
            grp_src=jnp.asarray(grouping.src),
            grp_dst=jnp.asarray(grouping.dst),
            grp_norm=jnp.asarray(grouping.norm),
            group_rel=jnp.asarray(grouping.group_rel),
            group_size=grouping.group_size)
        F_next = F_cur
    if mesh is not None:
        from mrgcn_tpu.parallel.mesh import shard_restricted_block
        blocks = [b if b is full_edges
                  else shard_restricted_block(mesh, b) for b in blocks]
    return tuple(blocks)


def output_edge_block(structure, out_nodes: np.ndarray,
                      group_size: int = 64) -> EdgeBlock:
    """EdgeBlock computing the final layer's aggregation ONLY at
    ``out_nodes`` (sorted unique global node ids).

    Full-batch NC loss reads logits at labelled nodes alone, yet the
    reference materialises the output layer for every node
    (reference: node_classification.py:229-310 picks rows after a full
    forward). Restricting the output layer's edge set to edges whose
    target is labelled keeps the gradients bit-comparable (the dropped
    outputs receive zero cotangent either way) while cutting the layer's
    edge traffic by ``n / len(out_nodes)`` — the bench-scale output layer
    was a third of the train step (benchmarks/micro_layer2_parts.py).

    Per-edge norms are unchanged: D^-1 is a property of each output
    node's in-degree, which restriction does not alter. ``group_size=64``
    matches the mini-batch sampler's choice (padding halves vs 128 and
    the matmuls are sub-millisecond at restricted scale).
    """
    from mrgcn_tpu.encodings.structure import group_by_relation

    out_nodes = np.asarray(out_nodes)
    src = np.asarray(structure.src)
    keep_pos = np.searchsorted(out_nodes, src)
    keep_pos = np.minimum(keep_pos, len(out_nodes) - 1)
    keep = out_nodes[keep_pos] == src
    src_local = keep_pos[keep].astype(np.int32)
    dst = np.asarray(structure.dst)[keep].astype(np.int32)
    rel = np.asarray(structure.rel)[keep].astype(np.int32)
    norm = np.asarray(structure.norm)[keep].astype(np.float32)

    num_out = int(len(out_nodes))
    grouping = group_by_relation(src_local, dst, rel, norm, num_out,
                                 group_size=group_size)
    return EdgeBlock(src=jnp.asarray(src_local), dst=jnp.asarray(dst),
                     rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                     num_out=num_out, num_in=structure.num_nodes,
                     grp_src=jnp.asarray(grouping.src),
                     grp_dst=jnp.asarray(grouping.dst),
                     grp_norm=jnp.asarray(grouping.norm),
                     group_rel=jnp.asarray(grouping.group_rel),
                     group_size=grouping.group_size)


def hidden_dims_from_config(config: Dict, output_dim: Optional[int]
                            ) -> Tuple[int, ...]:
    """Layer widths from ``[[model.layers]]``; the output layer's width is
    the class count for NC (reference: node_classification.py:398-419) and
    the last configured hidden size for LP
    (reference: link_prediction.py:449-464)."""
    layers = config["model"]["layers"]
    if output_dim is not None:  # node classification
        dims = [layer["hidden_nodes"] for layer in layers[:-1]]
        dims.append(output_dim)
    else:  # link prediction: the final config entry is not a layer
        dims = [layer["hidden_nodes"] for layer in layers[:-1]]
        if not dims:
            dims = [layers[0]["hidden_nodes"]]
    return tuple(dims)
