"""Mini-batching: L-hop BFS neighbourhood expansion with static shapes.

TPU re-design of reference: mrgcn/data/batch.py:152-315. The reference keeps
per-hop sparse row slices of the global adjacency; here each hop becomes its
own :class:`EdgeBlock` with *local* (remapped) src/dst indices and the global
``dst`` retained for the identity-weight gather, padded to power-of-two
buckets so a handful of XLA programs covers every batch.

Hop invariant (reference: mrgcn/models/rgcn.py:91-128): model layer ``l`` of
``L`` consumes the edges collected at hop ``L-1-l`` — the input layer
aggregates the outermost neighbourhood, the final layer produces embeddings
for the batch nodes themselves. Modality encoders run only on the outermost
hop's nodes (reference: mrgcn/models/mrgcn.py:216-248).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mrgcn_tpu.encodings.structure import GraphStructure
from mrgcn_tpu.models.rgcn import EdgeBlock

logger = logging.getLogger(__name__)


def bucket(n: int, minimum: int = 64) -> int:
    """Next power of two >= n (>= minimum), so shapes repeat across batches."""
    size = minimum
    while size < n:
        size *= 2
    return size


class EdgeIndex:
    """CSR-style index over the COO edge list, keyed by source row
    (the reference walks ``A.indptr``/``A.indices`` the same way,
    reference: batch.py:228-243)."""

    def __init__(self, structure: GraphStructure):
        order = np.argsort(structure.src, kind="stable")
        self.src = structure.src[order]
        self.dst = np.ascontiguousarray(structure.dst[order],
                                        dtype=np.int32)
        self.rel = structure.rel[order]
        self.norm = structure.norm[order]
        self.indptr = np.ascontiguousarray(np.searchsorted(
            self.src, np.arange(structure.num_nodes + 1)), dtype=np.int64)
        self.num_nodes = structure.num_nodes
        self._mark = None                # native sampler scratch, lazy

    def out_edges(self, nodes: np.ndarray) -> np.ndarray:
        """Edge positions whose source is in ``nodes`` (vectorised: no
        per-node Python loop)."""
        nodes = np.asarray(nodes, dtype=np.int64)
        starts = self.indptr[nodes]
        counts = self.indptr[nodes + 1] - starts
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        # positions within each span: global arange minus each span's offset
        span_ends = np.cumsum(counts)
        offsets = np.arange(total, dtype=np.int64) - np.repeat(
            span_ends - counts, counts)
        return np.repeat(starts, counts) + offsets

    def hop(self, nodes: np.ndarray):
        """One BFS hop: (out-edge ids, sorted unique neighbour ids).

        Uses the native C++ sampler (mrgcn_tpu/native/sampler.cpp) when the
        shared library builds; the numpy path is the reference semantics.
        """
        from mrgcn_tpu.data.native import get_sampler_lib
        lib = get_sampler_lib()
        if lib is None:
            eids = self.out_edges(nodes)
            return eids, np.unique(self.dst[eids]).astype(np.int32)

        import ctypes
        frontier = np.ascontiguousarray(nodes, dtype=np.int32)
        if frontier.size and (frontier.min() < 0
                              or frontier.max() >= self.num_nodes):
            raise ValueError("frontier node id out of range")
        counts = self.indptr[frontier.astype(np.int64) + 1] \
            - self.indptr[frontier.astype(np.int64)]
        eids = np.empty(int(counts.sum()), dtype=np.int64)
        neigh = np.empty(self.num_nodes, dtype=np.int32)
        n_neigh = np.zeros(1, dtype=np.int64)
        if self._mark is None:
            self._mark = np.zeros(self.num_nodes, dtype=np.uint8)

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        n_eids = lib.mg_bfs_hop(
            ptr(self.indptr, ctypes.c_int64), ptr(self.dst, ctypes.c_int32),
            self.num_nodes, ptr(frontier, ctypes.c_int32), len(frontier),
            ptr(eids, ctypes.c_int64), ptr(neigh, ctypes.c_int32),
            ptr(n_neigh, ctypes.c_int64), ptr(self._mark, ctypes.c_uint8))
        if n_eids < 0:
            raise ValueError("frontier node id out of range")
        return eids[:n_eids], neigh[:int(n_neigh[0])].copy()


@dataclass
class MiniBatch:
    """One L-hop sampled subgraph, ready for the jitted step."""

    layer_edges: Tuple[EdgeBlock, ...]   # ordered for model layers 0..L-1
    batch_nodes: np.ndarray              # global ids of the batch nodes
    outer_nodes: np.ndarray              # global ids of the outermost hop
    num_batch: int                       # un-padded batch node count


def sample_minibatch(index: EdgeIndex, batch_nodes: np.ndarray,
                     num_layers: int,
                     edge_bucket: int = 256,
                     node_bucket: int = 64) -> MiniBatch:
    """BFS-expand ``batch_nodes`` for ``num_layers`` hops
    (reference: batch.py:185-197)."""
    batch_nodes = np.asarray(batch_nodes, dtype=np.int32)

    hop_nodes: List[np.ndarray] = [batch_nodes]     # S_0 .. S_L
    hop_edges: List[np.ndarray] = []                # E_0 .. E_{L-1}
    sample = batch_nodes
    for _ in range(num_layers):
        eids, neighbours = index.hop(sample)        # sorted global ids
        hop_edges.append(eids)
        hop_nodes.append(neighbours.astype(np.int32))
        sample = neighbours

    # model layer l uses hop L-1-l: rows = S_{L-1-l}, inputs = S_{L-l}
    layers: List[EdgeBlock] = []
    for layer in range(num_layers):
        hop = num_layers - 1 - layer
        eids = hop_edges[hop]
        out_nodes, in_nodes = hop_nodes[hop], hop_nodes[hop + 1]

        src_local = _local_ids(index.src[eids], out_nodes)
        dst_local = _local_ids(index.dst[eids], in_nodes)
        dst_global = index.dst[eids].astype(np.int32)
        norm = index.norm[eids]
        rel = index.rel[eids]

        E = bucket(len(eids), edge_bucket)
        pad = E - len(eids)
        n_out = bucket(len(out_nodes), node_bucket)
        n_in = bucket(len(in_nodes), node_bucket)
        if pad:
            # padding edges scatter to an out-of-range row and are dropped
            src_local = np.concatenate(
                [src_local, np.full(pad, n_out, dtype=np.int32)])
            dst_local = np.concatenate(
                [dst_local, np.zeros(pad, dtype=np.int32)])
            dst_global = np.concatenate(
                [dst_global, np.zeros(pad, dtype=np.int32)])
            rel = np.concatenate([rel, np.zeros(pad, dtype=np.int32)])
            norm = np.concatenate(
                [norm, np.zeros(pad, dtype=np.float32)])

        from mrgcn_tpu.encodings.structure import group_by_relation
        grouping = group_by_relation(
            src_local[:len(eids)], dst_local[:len(eids)],
            index.rel[eids], norm[:len(eids)], n_out, group_size=64)
        # bucket the group count so batch shapes repeat
        G = bucket(grouping.num_groups, 4)
        gpad = G - grouping.num_groups
        # numpy leaves: batches are built host-side in bulk and shipped
        # with ONE batched jax.device_put per split (device_put_batches) —
        # per-array puts cost a device round-trip each (~24 per batch;
        # 313-batch DMG build measured 378 s over the axon tunnel vs ~4 s
        # of host compute)
        layers.append(EdgeBlock(
            src=src_local, dst=dst_local,
            rel=np.ascontiguousarray(rel), norm=np.ascontiguousarray(norm),
            num_out=n_out, num_in=n_in,
            dst_global=dst_global,
            grp_src=np.concatenate(
                [grouping.src,
                 np.full(gpad * grouping.group_size, n_out,
                         dtype=np.int32)]),
            grp_dst=np.concatenate(
                [grouping.dst,
                 np.zeros(gpad * grouping.group_size, dtype=np.int32)]),
            grp_norm=np.concatenate(
                [grouping.norm,
                 np.zeros(gpad * grouping.group_size, dtype=np.float32)]),
            group_rel=np.concatenate(
                [grouping.group_rel, np.zeros(gpad, dtype=np.int32)]),
            group_size=grouping.group_size))

    return MiniBatch(layer_edges=tuple(layers),
                     batch_nodes=batch_nodes,
                     outer_nodes=hop_nodes[-1],
                     num_batch=len(batch_nodes))


def _local_ids(global_ids: np.ndarray, universe: np.ndarray) -> np.ndarray:
    """Positions of ``global_ids`` within the sorted-or-ordered ``universe``."""
    order = np.argsort(universe, kind="stable")
    pos = np.searchsorted(universe, global_ids, sorter=order)
    return order[pos].astype(np.int32)


def subset_features(features: Dict, outer_nodes: np.ndarray,
                    row_bucket: int = 64,
                    num_rows: Optional[int] = None) -> Dict:
    """Restrict per-encoder feature rows to the outermost-hop nodes and remap
    their indices to hop-local positions
    (reference: batch.py:265-315 ``mksubset``). Keeps empty entries out —
    the model skips missing encoders, preserving module order by name.

    ``num_rows`` is the model's placement row count for this batch (the
    outermost EdgeBlock's ``num_in``); when given, each entry carries a
    host-precomputed inverse map (ops/placement.build_rows) so the jitted
    step places encoder rows with a single gather."""
    outer_sorted = np.asarray(outer_nodes)
    out: Dict = {}
    for name, entry in features.items():
        data, node_idx = entry[0], entry[1]
        node_idx_np = np.asarray(node_idx)
        mask = np.isin(node_idx_np, outer_sorted)
        count = int(mask.sum())
        if count == 0:
            continue
        rows = np.asarray(data)[mask]
        local = _local_ids(node_idx_np[mask], outer_sorted)

        M = bucket(count, row_bucket)
        pad = M - count
        if pad:
            rows = np.concatenate(
                [rows, np.zeros((pad, *rows.shape[1:]), dtype=rows.dtype)])
            # padded rows scatter far out of range (beyond any node-count
            # bucket) and are dropped by mode="drop"
            local = np.concatenate(
                [local, np.full(pad, 2 ** 30, dtype=np.int32)])
        if num_rows is not None:
            from mrgcn_tpu.ops.placement import build_rows
            out[name] = (rows, local, build_rows(local, num_rows))
        else:
            out[name] = (rows, local)
    return out


def device_put_batches(payloads):
    """One batched ``jax.device_put`` for a list of host-built batch
    pytrees — collapses the per-array transfer round-trips of a whole
    split into a single call."""
    import jax
    return jax.device_put(payloads)


def make_label_batches(label_rows: np.ndarray,
                       batchsize: int) -> List[np.ndarray]:
    """Slice labelled nodes into batches
    (reference: node_classification.py:329-351)."""
    num_samples = label_rows.shape[0]
    if batchsize <= 0:
        batchsize = num_samples
    return [label_rows[b:min(b + batchsize, num_samples)]
            for b in range(0, num_samples, batchsize)]
