"""Graph-structure encoding: relation-partitioned COO adjacency.

The reference builds one row-normalised CSR matrix per relation and hstacks
them into a single ``n x (R*n)`` sparse matrix
(reference: mrgcn/encodings/graph_structure.py:13-169). On TPU a giant sparse
matmul against that layout wastes the MXU; instead we keep the graph as flat
edge arrays — ``(src, dst, rel, norm)`` — where ``norm`` carries the per-
relation in-row degree normalisation ``D^-1 A`` precomputed at build time.
The R-GCN layer consumes these arrays with gather + segment-sum programs
(see :mod:`mrgcn_tpu.ops.rspmm`), which XLA fuses and which shard cleanly
over a device mesh along the edge dimension.

Semantics preserved exactly:
  * deterministic node order: atoms sorted by string form
    (reference: graph_structure.py:16-20);
  * relation order: properties sorted by string form; for each included
    property the forward relation, then (optionally) its inverse; the
    self-loop identity relation last (reference: graph_structure.py:33-38,
    78-106);
  * ``norm[e] = 1 / rowdegree_r(src[e])`` computed per relation
    (reference: graph_structure.py:162-169) — the identity relation has
    norm 1.
"""

from __future__ import annotations

import itertools
import logging
import os
from dataclasses import dataclass, field
from multiprocessing import Pool
from typing import Dict, List, Optional, Tuple

import numpy as np

from mrgcn_tpu.data.kg import KnowledgeGraph

logger = logging.getLogger(__name__)


@dataclass
class GraphStructure:
    """Relation-partitioned COO adjacency with precomputed D^-1 weights.

    ``num_relations`` counts forward (+ inverse) property relations plus the
    trailing self-loop relation, i.e. it equals ``A.shape[1] / num_nodes`` of
    the reference's hstacked matrix
    (reference: mrgcn/tasks/node_classification.py:396).
    """

    num_nodes: int
    num_relations: int
    src: np.ndarray   # (E,) int32 — message destination row (triple subject)
    dst: np.ndarray   # (E,) int32 — message source column (triple object)
    rel: np.ndarray   # (E,) int32 — relation index in [0, num_relations)
    norm: np.ndarray  # (E,) float32 — 1/rowdegree within the relation
    nodes_map: Dict = field(repr=False, default_factory=dict)
    properties_map: Dict = field(repr=False, default_factory=dict)

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])

    def flat_col(self) -> np.ndarray:
        """Column index into the reference's flattened ``(R*n)`` layout:
        ``rel * num_nodes + dst``."""
        return self.rel.astype(np.int64) * self.num_nodes + \
            self.dst.astype(np.int64)

    def to_scipy_hstack(self):
        """Densifiable ``n x (R*n)`` CSR, for parity tests against the
        reference layout (reference: graph_structure.py:38)."""
        import scipy.sparse as sp
        return sp.csr_matrix(
            (self.norm, (self.src.astype(np.int64), self.flat_col())),
            shape=(self.num_nodes, self.num_relations * self.num_nodes))


def generate(kg: KnowledgeGraph, config: dict) -> Tuple[GraphStructure,
                                                        Dict, Dict]:
    """Build the graph structure from a knowledge graph.

    Returns ``(structure, nodes_map, properties_map)`` where ``properties_map``
    enumerates *all* properties (including excluded ones) in sorted order —
    the reference does the same and uses it as the edge index for link
    prediction (reference: graph_structure.py:16-17, mkdataset.py:49-57).
    """
    structural = config["graph"]["structural"]
    separate_literals = structural["separate_literals"]
    include_inverse = structural["include_inverse_properties"]
    exclude_properties = set(structural.get("exclude_properties", []))

    # columnar scan: one zip over the triple set instead of per-triple
    # generators (~4x on the whole generate() at 160k triples)
    s_col, p_col, o_col = kg.columns()
    properties = sorted(set(p_col), key=str)
    properties_map = {p: i for i, p in enumerate(properties)}

    if separate_literals:
        atoms = KnowledgeGraph.sort_atoms(kg.atoms(True))
    else:
        # same dedup semantics AND ORDER as atoms(False) (s, o per triple,
        # first appearance), C-speed via dict.fromkeys. Order matters:
        # sort_atoms is a stable str-keyed sort, so atoms whose str() ties
        # (e.g. "2000"^^gYear vs "2000"^^integer) keep their encounter
        # order — a plain set here made node indexing depend on randomized
        # str hashing across processes (round-5 review finding).
        interleaved = itertools.chain.from_iterable(zip(s_col, o_col))
        atoms = KnowledgeGraph.sort_atoms(dict.fromkeys(interleaved))
    nodes_map = {node: i for i, node in enumerate(atoms)}
    num_nodes = len(nodes_map)

    included = [p for p in properties if str(p) not in exclude_properties
                and p not in exclude_properties]
    included_rank = {p: k for k, p in enumerate(included)}
    rel_stride = 2 if include_inverse else 1
    num_relations = len(included) * rel_stride + 1  # + self-loop identity

    logger.debug("Generating %d relation partitions over %d nodes",
                 num_relations, num_nodes)

    # Single pass over the triples: map to (s, k, o) index rows, then group
    # per relation with numpy. (The reference re-scans the whole graph once
    # per property — reference: graph_structure.py:78-91 — and offers a
    # multiprocessing pool to compensate; one pass makes that moot, but the
    # mapping stage still honours the config flag.)
    use_mp = bool(structural.get("multiprocessing", False))
    s_idx, k_idx, o_idx = _index_triples(kg, nodes_map, included_rank,
                                         separate_literals, use_mp)

    src_parts: List[np.ndarray] = []
    dst_parts: List[np.ndarray] = []
    rel_parts: List[np.ndarray] = []
    if len(s_idx):
        order = np.argsort(k_idx, kind="stable")
        s_sorted, k_sorted, o_sorted = s_idx[order], k_idx[order], \
            o_idx[order]
        src_parts.append(s_sorted)
        dst_parts.append(o_sorted)
        rel_parts.append(k_sorted * rel_stride)
        if include_inverse:
            src_parts.append(o_sorted)
            dst_parts.append(s_sorted)
            rel_parts.append(k_sorted * rel_stride + 1)

    # Self-loop identity relation, normalised weight 1
    # (reference: graph_structure.py:33-35).
    loop = np.arange(num_nodes, dtype=np.int32)
    src_parts.append(loop)
    dst_parts.append(loop)
    rel_parts.append(np.full(num_nodes, num_relations - 1, dtype=np.int32))

    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    rel = np.concatenate(rel_parts)
    norm = compute_norm(src, rel, num_nodes, num_relations)

    structure = GraphStructure(num_nodes=num_nodes,
                               num_relations=num_relations,
                               src=src, dst=dst, rel=rel, norm=norm,
                               nodes_map=nodes_map,
                               properties_map=properties_map)
    return structure, nodes_map, properties_map


def _map_chunk(args):
    """Worker: map a chunk of triples to index rows (module-level for
    pickling)."""
    chunk, nodes_map, included_rank = args
    rows = [(nodes_map[s], included_rank[p], nodes_map[o])
            for s, p, o in chunk if p in included_rank]
    return rows


def _index_triples(kg: KnowledgeGraph, nodes_map: Dict, included_rank: Dict,
                   separate_literals: bool, use_mp: bool):
    """One pass: triples -> (s_idx, prop_rank, o_idx) int32 arrays.

    ``use_mp`` fans the dictionary-lookup stage over a process pool
    (capability parity with reference: graph_structure.py:110-134); the
    single-process path is already one linear scan.
    """
    nproc = len(os.sched_getaffinity(0))
    if not (use_mp and nproc > 1 and len(kg) > 10_000):
        # columnar fast path: dict lookups via C-level map over the
        # zipped columns (no per-triple tuple unpack, no generator) —
        # ~3x the list-comprehension loop at 160k triples
        s_col, p_col, o_col = kg.columns()
        if separate_literals:
            from mrgcn_tpu.data.rdf import Literal, UniqueLiteral
            o_col = tuple(UniqueLiteral(s, p, o)
                          if isinstance(o, Literal) else o
                          for s, p, o in zip(s_col, p_col, o_col))
        n = len(s_col)
        if n == 0:
            empty = np.empty(0, dtype=np.int32)
            return empty, empty, empty
        k_arr = np.fromiter(
            (v if v is not None else -1
             for v in map(included_rank.get, p_col)),
            dtype=np.int32, count=n)
        s_arr = np.fromiter(map(nodes_map.__getitem__, s_col),
                            dtype=np.int32, count=n)
        o_arr = np.fromiter(map(nodes_map.__getitem__, o_col),
                            dtype=np.int32, count=n)
        if (k_arr < 0).any():  # excluded properties
            keep = k_arr >= 0
            return s_arr[keep], k_arr[keep], o_arr[keep]
        return s_arr, k_arr, o_arr

    triples = list(kg.triples(separate_literals=separate_literals))
    chunksize = -(-len(triples) // nproc)
    chunks = [(triples[i:i + chunksize], nodes_map, included_rank)
              for i in range(0, len(triples), chunksize)]
    with Pool(processes=nproc) as pool:
        rows = [r for part in pool.imap(_map_chunk, chunks)
                for r in part]

    if not rows:
        empty = np.empty(0, dtype=np.int32)
        return empty, empty, empty
    arr = np.asarray(rows, dtype=np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def compute_norm(src: np.ndarray, rel: np.ndarray, num_nodes: int,
                 num_relations: int) -> np.ndarray:
    """Per-relation row normalisation ``1 / rowdegree``
    (reference: graph_structure.py:162-169). O(E) memory — a dense
    bincount over ``R * n`` keys would need gigabytes on large KGs."""
    key = rel.astype(np.int64) * num_nodes + src.astype(np.int64)
    _, inverse, counts = np.unique(key, return_inverse=True,
                                   return_counts=True)
    return (1.0 / counts[inverse]).astype(np.float32)


@dataclass
class RelationGrouping:
    """Edges reordered by relation and padded so every fixed-size group of
    ``group_size`` consecutive edges shares one relation.

    Lets the dense-feature R-GCN layer run as a batched MXU matmul —
    ``H[dst]`` gathered per group (``E * in`` bytes instead of the fused
    path's ``E * B * out``), multiplied by the group's composed weight
    (see :func:`mrgcn_tpu.ops.rspmm.transform_aggregate_grouped`).
    Padding slots carry ``norm == 0`` and scatter out of range.
    """

    src: np.ndarray        # (E',) int32, E' = num_groups * group_size
    dst: np.ndarray        # (E',) int32
    norm: np.ndarray       # (E',) float32 (0 on padding)
    group_rel: np.ndarray  # (num_groups,) int32 — relation of each group
    group_size: int

    @property
    def num_groups(self) -> int:
        return len(self.group_rel)


def group_by_relation(src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
                      norm: np.ndarray, num_out: int,
                      group_size: int = 128) -> RelationGrouping:
    """Sort edges by relation; pad each relation's run to a multiple of
    ``group_size``.

    128 is the measured full-batch optimum on a v5e at FB15k-237 scale
    (16.8 ms vs 20.2 at 64 and 17.9 at 256 — benchmarks/micro_group_size.py);
    the mini-batch sampler passes 64 instead because at hop scale the
    matmul time is sub-millisecond either way and 64 halves the padding.
    """
    if len(src) == 0:
        # an empty hop (e.g. a neighbour-sampled frontier of leaves) keeps
        # degenerate-but-valid shapes; callers bucket the group count up
        return RelationGrouping(
            src=np.empty(0, dtype=np.int32), dst=np.empty(0, dtype=np.int32),
            norm=np.empty(0, dtype=np.float32),
            group_rel=np.empty(0, dtype=np.int32), group_size=group_size)

    order = np.argsort(rel, kind="stable")
    src, dst, rel, norm = src[order], dst[order], rel[order], norm[order]

    rels, counts = np.unique(rel, return_counts=True)
    out_src: List[np.ndarray] = []
    out_dst: List[np.ndarray] = []
    out_norm: List[np.ndarray] = []
    group_rel: List[np.ndarray] = []

    start = 0
    for r, count in zip(rels, counts):
        stop = start + int(count)
        padded = -(-int(count) // group_size) * group_size
        pad = padded - int(count)
        out_src.append(src[start:stop])
        out_dst.append(dst[start:stop])
        out_norm.append(norm[start:stop])
        if pad:
            out_src.append(np.full(pad, num_out, dtype=np.int32))  # dropped
            out_dst.append(np.zeros(pad, dtype=np.int32))
            out_norm.append(np.zeros(pad, dtype=np.float32))
        group_rel.append(np.full(padded // group_size, r, dtype=np.int32))
        start = stop

    return RelationGrouping(
        src=np.concatenate(out_src), dst=np.concatenate(out_dst),
        norm=np.concatenate(out_norm),
        group_rel=np.concatenate(group_rel), group_size=group_size)


def pad_edges(structure: GraphStructure,
              multiple: int = 1024) -> GraphStructure:
    """Pad edge arrays to a multiple so recompilation is avoided across
    datasets of similar size. Padding edges carry ``norm == 0`` and target
    node 0, contributing nothing to the aggregation."""
    E = structure.num_edges
    target = ((E + multiple - 1) // multiple) * multiple
    if target == E:
        return structure
    pad = target - E

    def _pad(a: np.ndarray, value=0):
        return np.concatenate(
            [a, np.full(pad, value, dtype=a.dtype)])

    return GraphStructure(
        num_nodes=structure.num_nodes,
        num_relations=structure.num_relations,
        src=_pad(structure.src),
        dst=_pad(structure.dst),
        rel=_pad(structure.rel),
        norm=_pad(structure.norm, 0.0),
        nodes_map=structure.nodes_map,
        properties_map=structure.properties_map)
