"""Plan-driven relational layers: sorted-stream kernels end to end.

Measured primitive costs on a v5e (benchmarks/timing.py protocol; E~850k):

=====================================  ==========
op                                     per call
=====================================  ==========
XLA row gather, table < ~16 MB          ~0.5 ms
XLA row gather, larger table            ~5-6 ms
XLA scatter-add (segment_sum)           ~13.6 ms (worse into big tables)
pallas sorted_gather (block stream)     0.7-4.3 ms
pallas sorted_scatter (block stream)    ~1 ms
=====================================  ==========

The design follows directly:

* **Forward runs on a src-sorted edge stream**: the output scatter — the
  most expensive XLA op — becomes
  :func:`..pallas_gather.sorted_scatter` (one-hot MXU matmuls into a
  VMEM-resident block accumulator). Gathers stay in XLA.
* **Backward runs on table-sorted streams**: the cotangent scatter into
  the relation-major weight table has block structure under a (rel, dst)
  sort, so it is also a ``sorted_scatter``; likewise d_H under a dst sort.
  Per-edge quantities are RECOMPUTED on the backward stream from
  node-sized tensors (one cheap small-table gather) — no E-sized tensor
  ever crosses between differently-sorted streams, so the slow unsorted
  permutations never appear.

All per-edge index arrays are static graph structure, prepared once on the
host (:func:`build_layer_plans`).

**Layout hazard (the round-2 "parts sum to half the layer" gap):** a 2-D
``dot(comp, packed.reshape(B, -1))`` compose interleaves the relation dim
into 8-sublane tiles, so the ``(R*rows, 128)`` view the gather needs is a
*physical re-tile* — XLA inserts a 793 MB strided copy plus a strided
operand copy, ~10 ms at bench scale (benchmarks/micro_compose_2d.py, HLO
evidence in micro_compose_hlo.py). The 3-D tensordot of
:func:`mrgcn_tpu.ops.rspmm.compose_packed` emits the table relation-major
(the 2-D view is a free bitcast) and carries a custom vjp because XLA
lowers the einsum autodiff's d_comp contraction catastrophically.
Train-step cost 42.2 -> 29.0 ms (benchmarks/micro_compose_vjp.py).

**Multi-chip:** :func:`shard_layer_plans` deals edges round-robin over the
mesh's data axis and stacks per-shard streams on a leading axis; the
shard_map wrappers in models/rgcn.py run this single-chip engine per
device and psum the partial aggregates (tests/test_sharded_plans.py pins
fwd+bwd to the single-device results).

Reference computation being replaced: ``A @ [I F] W`` over the hstacked
sparse adjacency (reference: mrgcn/layers/graph.py:62-102).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mrgcn_tpu.ops.pallas_gather import (EDGE_BLOCK, ROW_BLOCK,
                                         _super_blocks, _use_pallas,
                                         compose_grad_pass,
                                         fused_place_scatter,
                                         sorted_gather, sorted_scatter)

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# host-side planning
# --------------------------------------------------------------------------

def _segment_layout(major, minor, block_of_edge, edge_block,
                    split_key=None, pad_slabs_to=1):
    """Order edges by (major, minor), split where the block id (or, when
    given, ``split_key`` — e.g. a (block, relation) composite so slabs are
    relation-constant) changes, pad each segment to a multiple of
    ``edge_block``."""
    E = len(block_of_edge)
    order = np.lexsort((minor, major))
    blk = np.asarray(block_of_edge)[order]
    if E == 0:
        return (order, np.zeros(0, np.int64), edge_block,
                np.zeros(1, np.int64))
    key = blk if split_key is None else np.asarray(split_key)[order]
    boundaries = np.flatnonzero(np.diff(key)) + 1
    seg_starts = np.concatenate([[0], boundaries, [E]]).astype(np.int64)
    lengths = np.diff(seg_starts)
    padded = -(-lengths // edge_block) * edge_block
    out_starts = np.concatenate([[0], np.cumsum(padded)])
    E_pad = int(out_starts[-1])
    seg_of_edge = np.repeat(np.arange(len(lengths)), lengths)
    slots = out_starts[seg_of_edge] + (np.arange(E)
                                       - seg_starts[seg_of_edge])
    slab_seg = np.repeat(np.arange(len(lengths)),
                         (padded // edge_block).astype(np.int64))
    slab_blk = blk[seg_starts[:-1]][slab_seg]
    # optionally pad the slab count to a multiple of the kernel
    # super-block factor so the fused place-scatter's grid divides evenly
    # (its caller requires this). Padding slabs match no rows and keep
    # the last block id (monotonicity + final flush stay correct). NOT
    # applied by default: measured +24 ms on the bench epoch when the
    # default composed path runs over the padded streams.
    nslab = E_pad // edge_block
    extra = (-nslab) % pad_slabs_to
    if extra:
        E_pad += extra * edge_block
        slab_blk = np.concatenate(
            [slab_blk, np.repeat(slab_blk[-1:], extra)])
    return order, slots, E_pad, slab_blk


@struct.dataclass
class Stream:
    """One sorted, slab-padded view of the edge list (device pytree).

    ``scatter_local``/``scatter_blk`` address THIS stream's scatter target
    (the layer output for the forward stream; the packed table / packed H
    for backward streams); the remaining per-edge fields carry everything
    any stream needs to recompute messages from node-sized tensors:
    ``src_row``/``out_mod`` (packed output row of the edge), ``gather_row``
    (packed input-table row *without* the relation offset), ``in_mod``,
    ``rel``, ``norm`` (0 on padding).
    """

    scatter_local: jnp.ndarray  # (nslab, EB); row_block on padding
    scatter_blk: jnp.ndarray    # (nslab,) non-decreasing
    src_row: jnp.ndarray        # (E_pad,) packed output row (src // k_out)
    out_mod: jnp.ndarray        # (E_pad,) src % k_out
    gather_row: jnp.ndarray     # (E_pad,) packed input row (dst // k_in)
    in_mod: jnp.ndarray         # (E_pad,) dst % k_in
    rel: jnp.ndarray            # (E_pad,)
    norm: jnp.ndarray           # (E_pad,)
    slab_rel: jnp.ndarray       # (nslab,) relation per slab (valid only
    #                             when rel_const)
    edge_block: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    # slabs split on (scatter block, relation): slab_rel is exact and the
    # dense ops may use per-slab weight matmuls
    rel_const: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_padded_edges(self) -> int:
        return int(self.gather_row.shape[0])

    @property
    def num_slabs(self) -> int:
        return int(self.scatter_blk.shape[0])


@struct.dataclass
class LayerPlans:
    """All sorted streams one full-batch R-GCN layer needs.

    ``fwd``: src-sorted, scatters to the layer output.
    ``bwd_table``: (rel, dst)-sorted, scatters into the relation-major
      table; its slabs are relation-constant (also used for d_W grouping).
    ``bwd_h``: dst-sorted, scatters into packed H (dense layers only).
    """

    fwd: Stream
    bwd_table: Stream
    bwd_h: Stream
    k_in: int = struct.field(pytree_node=False)
    k_out: int = struct.field(pytree_node=False)
    n_in_rows: int = struct.field(pytree_node=False)
    n_out_rows: int = struct.field(pytree_node=False)
    num_nodes: int = struct.field(pytree_node=False)
    # >1: every array leaf carries a leading shard axis (one slice per
    # mesh data-axis device); see shard_layer_plans / the shard_map
    # wrappers in models/rgcn.py
    num_shards: int = struct.field(pytree_node=False, default=1)
    # "dense" | "identity" | "identity_basis" — how the streams were built
    # (identity_basis carries a real dst-sorted bwd_h for
    # featureless_basis)
    kind: str = struct.field(pytree_node=False, default="dense")
    # rectangular layers (frontier-restricted full-batch training): the
    # output/input row spaces when they differ from ``num_nodes``; 0 means
    # "same as num_nodes" so legacy constructions stay valid
    num_out_nodes: int = struct.field(pytree_node=False, default=0)
    num_in_nodes: int = struct.field(pytree_node=False, default=0)

    @property
    def out_nodes(self) -> int:
        return self.num_out_nodes or self.num_nodes

    @property
    def in_nodes(self) -> int:
        return self.num_in_nodes or self.num_nodes


def _pad_rows(num_nodes: int, k: int, row_block: int) -> int:
    rows = -(-num_nodes // k)
    return max(1, -(-rows // row_block)) * row_block


def _rel_const_decisions(src, dst, rel, num_nodes: int, k_in: int,
                         k_out: int, row_block: int,
                         edge_block: int) -> dict:
    """Whether the fwd / bwd_h streams should use the relation-constant
    slab layout, judged from the padded sizes of the full edge set (so
    per-shard builds all pick the same execution path)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    out_blk = (src // k_out) // row_block
    in_blk = (dst // k_in) // row_block
    R_num = int(rel.max()) + 1 if len(rel) else 1

    def padded_len(keys) -> int:
        _, counts = np.unique(keys, return_counts=True)
        return int((-(-counts // edge_block) * edge_block).sum())

    def allow_rc(composite, plain) -> bool:
        base = padded_len(plain)
        return padded_len(composite) <= max(int(1.35 * base),
                                            base + 8 * edge_block)

    return {"fwd": allow_rc(out_blk * R_num + rel, out_blk),
            "bwd_h": allow_rc(in_blk * R_num + rel, in_blk)}


def build_layer_plans(src, dst, rel, norm, num_nodes: int, k_in: int,
                      k_out: int, row_block: int = ROW_BLOCK,
                      edge_block: int = EDGE_BLOCK,
                      kind: str = "dense",
                      rel_const_override: Optional[dict] = None,
                      num_out_nodes: Optional[int] = None,
                      num_in_nodes: Optional[int] = None) -> LayerPlans:
    """Host-side: the three sorted edge streams for one layer shape.

    ``k_in`` = packing factor of the gathered table's logical row width,
    ``k_out`` = packing factor of the output width. ``kind="identity"``
    builds the featureless-layer variant: plain block splits (the
    relation-constant layout only helps dense weight application and costs
    padding) and no separate bwd_h stream (featureless backward only
    scatters into the table).

    ``num_out_nodes``/``num_in_nodes`` make the layer rectangular:
    ``src``/``dst`` then index the restricted output/input row spaces
    (frontier-restricted full-batch training — see
    tasks/common.restricted_layer_edges). Defaults keep the square
    num_nodes x num_nodes layout.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    norm = np.asarray(norm, dtype=np.float32)

    n_in_rows = _pad_rows(num_in_nodes or num_nodes, k_in, row_block)
    n_out_rows = _pad_rows(num_out_nodes or num_nodes, k_out, row_block)
    in_row = dst // k_in
    out_row = src // k_out
    flat_row = rel * n_in_rows + in_row

    # the fused place-scatter kernel (opt-in) needs slab counts divisible
    # by its super-block factor; the default composed path measures FASTER
    # on unpadded streams, so pad only when the fused path is enabled
    pad_to = 64 if os.environ.get("MRGCN_FUSED_PLACE") == "1" else 1

    def mk(major, minor, scatter_row, split_key=None, rel_const=False):
        order, slots, E_pad, slab_blk = _segment_layout(
            major, minor, scatter_row // row_block, edge_block,
            split_key=split_key, pad_slabs_to=pad_to)
        nslab = E_pad // edge_block

        def place(arr, fill, dtype=np.int32):
            out = np.full(E_pad, fill, dtype=dtype)
            out[slots] = np.asarray(arr)[order]
            return out

        local = place(scatter_row % row_block, row_block)
        relp = place(rel, 0)
        return Stream(
            scatter_local=jnp.asarray(
                local.reshape(nslab, edge_block)),
            scatter_blk=jnp.asarray(slab_blk.astype(np.int32)),
            src_row=jnp.asarray(place(out_row, 0)),
            out_mod=jnp.asarray(place(src % k_out, 0)),
            gather_row=jnp.asarray(place(in_row, 0)),
            in_mod=jnp.asarray(place(dst % k_in, 0)),
            rel=jnp.asarray(relp),
            norm=jnp.asarray(place(norm, 0.0, np.float32)),
            slab_rel=jnp.asarray(
                relp.reshape(nslab, edge_block)[:, 0].copy()),
            edge_block=edge_block, row_block=row_block,
            rel_const=rel_const)

    # fwd and bwd_h prefer a (scatter block, relation) composite sort with
    # slab splits on it: every slab then carries ONE relation (slab_rel),
    # so the dense layers' per-edge weight application collapses into
    # per-slab batched MXU matmuls (measured 0.02 ms vs 9.6 ms for the
    # per-edge einsum at E~700k — benchmarks/micro_r2_prims.py). The finer
    # splits cost padding; when the graph has many relations per scatter
    # block (e.g. FB15k-237: R~475 over ~29 blocks would inflate E_pad
    # ~6x) the plain block-split layout is kept and the dense ops fall
    # back to the per-edge weight gather (``Stream.rel_const`` flags the
    # choice, made per stream from the actual padded sizes).
    rc = rel_const_override
    if rc is None:
        rc = _rel_const_decisions(src, dst, rel, num_nodes, k_in, k_out,
                                  row_block, edge_block)

    R_num = int(rel.max()) + 1 if len(rel) else 1
    out_blk = out_row // row_block
    in_blk = in_row // row_block
    bwd_table = mk(rel, dst, flat_row)
    if kind == "identity":
        fwd = mk(src, flat_row, out_row)
        bwd_h = fwd        # unused by the featureless ops; alias, no copy
    elif kind == "identity_basis":
        # featureless layer that gathers the B basis tables per edge and
        # composes with comp[rel_e] in-stream (featureless_basis) — its
        # backward scatters d_packed on a dst-sorted stream, so bwd_h is
        # real here (plain identity layers only scatter into the composed
        # table and alias it away)
        fwd = mk(src, flat_row, out_row)
        bwd_h = mk(in_row, rel, in_row)
    else:
        if rc["fwd"]:
            fwd_key = out_blk * R_num + rel
            fwd = mk(fwd_key, flat_row, out_row, split_key=fwd_key,
                     rel_const=True)
        else:
            fwd = mk(src, flat_row, out_row)
        if rc["bwd_h"]:
            bwdh_key = in_blk * R_num + rel
            bwd_h = mk(bwdh_key, out_row, in_row, split_key=bwdh_key,
                       rel_const=True)
        else:
            bwd_h = mk(in_row, rel, in_row)
    return LayerPlans(fwd=fwd, bwd_table=bwd_table, bwd_h=bwd_h,
                      k_in=int(k_in), k_out=int(k_out),
                      n_in_rows=int(n_in_rows),
                      n_out_rows=int(n_out_rows),
                      num_nodes=int(num_nodes), kind=kind,
                      num_out_nodes=int(num_out_nodes or 0),
                      num_in_nodes=int(num_in_nodes or 0))


def _pad_stream(s: Stream, E_pad: int, nslab: int) -> Stream:
    """Pad a stream to a common static shape with inert fills (scatter
    rows at ``row_block`` never land; ``norm == 0`` contributes nothing;
    padding slabs repeat the last block id so monotonic flush order
    holds)."""
    import jax.numpy as jnp
    d_slab = nslab - s.num_slabs
    d_edge = E_pad - s.num_padded_edges
    if d_slab == 0 and d_edge == 0:
        return s

    def pad1(x, n, fill):
        if n == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((n,) + x.shape[1:], fill, dtype=x.dtype)])

    last_blk = s.scatter_blk[-1] if s.num_slabs else 0
    return Stream(
        scatter_local=pad1(s.scatter_local, d_slab, s.row_block),
        scatter_blk=pad1(s.scatter_blk, d_slab, last_blk),
        src_row=pad1(s.src_row, d_edge, 0),
        out_mod=pad1(s.out_mod, d_edge, 0),
        gather_row=pad1(s.gather_row, d_edge, 0),
        in_mod=pad1(s.in_mod, d_edge, 0),
        rel=pad1(s.rel, d_edge, 0),
        norm=pad1(s.norm, d_edge, 0.0),
        slab_rel=pad1(s.slab_rel, d_slab, 0),
        edge_block=s.edge_block, row_block=s.row_block,
        rel_const=s.rel_const)


def shard_layer_plans(src, dst, rel, norm, num_nodes: int, k_in: int,
                      k_out: int, num_shards: int,
                      row_block: int = ROW_BLOCK,
                      edge_block: int = EDGE_BLOCK,
                      kind: str = "dense",
                      num_out_nodes: Optional[int] = None,
                      num_in_nodes: Optional[int] = None) -> LayerPlans:
    """Per-device sorted streams for mesh training, stacked on a leading
    shard axis.

    Edges are dealt round-robin to ``num_shards`` shards (balanced
    counts); each shard gets its own sorted/slab-padded streams, padded to
    the max shard size so all shards share one static shape. Inside
    ``shard_map`` each device runs the single-chip engine on its local
    streams and the partial (num_nodes, out) aggregates ``psum`` over the
    data axis (see models/rgcn.py). The relation-constant layout decision
    is made once on the full edge set so every shard takes the same
    execution path.
    """
    import jax
    import jax.numpy as jnp

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    norm = np.asarray(norm, dtype=np.float32)
    rc = _rel_const_decisions(src, dst, rel, num_nodes, k_in, k_out,
                              row_block, edge_block)

    assign = np.arange(len(src)) % num_shards
    parts = []
    for d in range(num_shards):
        m = assign == d
        parts.append(build_layer_plans(
            src[m], dst[m], rel[m], norm[m], num_nodes, k_in, k_out,
            row_block, edge_block, kind, rel_const_override=rc,
            num_out_nodes=num_out_nodes, num_in_nodes=num_in_nodes))

    def stack(get):
        streams = [get(p) for p in parts]
        E_pad = max(s.num_padded_edges for s in streams)
        nslab = max(s.num_slabs for s in streams)
        padded = [_pad_stream(s, E_pad, nslab) for s in streams]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)

    fwd = stack(lambda p: p.fwd)
    bwd_table = stack(lambda p: p.bwd_table)
    bwd_h = fwd if kind == "identity" else stack(lambda p: p.bwd_h)
    first = parts[0]
    return LayerPlans(fwd=fwd, bwd_table=bwd_table, bwd_h=bwd_h,
                      k_in=first.k_in, k_out=first.k_out,
                      n_in_rows=first.n_in_rows,
                      n_out_rows=first.n_out_rows,
                      num_nodes=first.num_nodes,
                      num_shards=num_shards, kind=kind,
                      num_out_nodes=first.num_out_nodes,
                      num_in_nodes=first.num_in_nodes)


def unstack_plan(plan: LayerPlans) -> LayerPlans:
    """Strip the leading shard axis from a sharded plan's array leaves —
    used inside ``shard_map`` where each device holds one slice."""
    import jax
    import jax.numpy as jnp
    stripped = jax.tree.map(lambda x: jnp.squeeze(x, 0), plan)
    return stripped.replace(num_shards=1)


def composed_table_elems(num_relations: int, num_nodes: int,
                         out_dim: int, row_block: int = ROW_BLOCK,
                         n_in_rows: Optional[int] = None) -> int:
    """Element count of the composed relation-major identity table the
    planned featureless op gathers from — used by the model AND the plan
    builder to agree on when that table is too big to materialise
    (2^29 f32 = 2 GiB) and the basis-stream variant should run instead.
    ``n_in_rows`` overrides the padded row count when the caller already
    holds a plan (whose row_block may differ from the default)."""
    from mrgcn_tpu.ops.rspmm import packed_identity_shape, packing_factor
    k = packing_factor(out_dim)
    lanes = packed_identity_shape(1, num_nodes, out_dim)[0][2]
    rows = _pad_rows(num_nodes, k, row_block) if n_in_rows is None \
        else n_in_rows
    return num_relations * rows * lanes


COMPOSED_TABLE_MAX_ELEMS = 2 ** 29   # 2 GiB f32
# the basis-stream featureless op gathers B tables per edge; past this the
# per-edge traffic beats the one composed-table gather it avoids
MAX_BASIS_STREAMS = 4


def basis_stream_wanted(num_relations: int, num_nodes: int, out_dim: int,
                        num_bases: int) -> bool:
    """THE plan-build decision for the featureless input layer: build the
    ``identity_basis`` streams (featureless_basis) when the composed table
    would not fit the budget and the basis count is stream-friendly.
    ``MRGCN_BASIS_STREAM=0`` reverts to the fused-basis XLA fallback."""
    return (os.environ.get("MRGCN_BASIS_STREAM", "1") != "0"
            and 0 < num_bases <= MAX_BASIS_STREAMS
            and composed_table_elems(num_relations, num_nodes, out_dim)
            > COMPOSED_TABLE_MAX_ELEMS)


def plans_for_layers(src, dst, rel, norm, num_nodes: int, layer_shapes,
                     row_block: int = ROW_BLOCK,
                     edge_block: int = EDGE_BLOCK,
                     identity_basis: bool = False,
                     num_out_nodes: Optional[int] = None,
                     num_in_nodes: Optional[int] = None,
                     num_shards: int = 1) -> dict:
    """One :class:`LayerPlans` per distinct (k_in, k_out) pair, keyed
    ``"kin:kout"``. ``layer_shapes``: iterable of (in_width, out_width);
    ``in_width=None`` marks the featureless/identity gather (k_in ==
    k_out). Plans depend only on the packing factors, so layers of equal
    widths share. ``identity_basis=True`` builds the featureless plans
    with a real dst-sorted bwd_h stream (key suffix ``:idb``) for
    :func:`featureless_basis` — used when the composed table would not
    fit HBM (see :func:`composed_table_elems`). ``num_shards > 1`` builds
    per-device stacked streams (:func:`shard_layer_plans`) for mesh
    training."""
    from mrgcn_tpu.ops.rspmm import packing_factor
    id_kind = "identity_basis" if identity_basis else "identity"
    id_key = "idb" if identity_basis else "id"
    pairs = set()
    for in_w, out_w in layer_shapes:
        k_out = packing_factor(int(out_w))
        if in_w is None:               # featureless/identity gather
            pairs.add((k_out, k_out, id_kind))
        else:
            pairs.add((packing_factor(int(in_w)), k_out, "dense"))

    def build(ki, ko, kind):
        if num_shards > 1:
            return shard_layer_plans(
                src, dst, rel, norm, num_nodes, ki, ko, num_shards,
                row_block=row_block, edge_block=edge_block, kind=kind,
                num_out_nodes=num_out_nodes, num_in_nodes=num_in_nodes)
        return build_layer_plans(
            src, dst, rel, norm, num_nodes, ki, ko, row_block=row_block,
            edge_block=edge_block, kind=kind,
            num_out_nodes=num_out_nodes, num_in_nodes=num_in_nodes)

    return {f"{ki}:{ko}:{id_key}" if kind == id_kind else f"{ki}:{ko}":
            build(ki, ko, kind) for ki, ko, kind in sorted(pairs)}


# --------------------------------------------------------------------------
# packing helpers (jit-side, cheap reshapes)
# --------------------------------------------------------------------------

def line_width(k: int, d: int) -> int:
    """Packed line width: 128 lanes for k > 1, d padded to a lane multiple
    for unpacked wide rows."""
    return 128 if k > 1 else -(-d // 128) * 128


def pack_rows(X: jnp.ndarray, k: int, padded_rows: int) -> jnp.ndarray:
    """(n, d) -> (padded_rows, L): k logical rows per L-lane line."""
    n, d = X.shape
    lw = line_width(k, d)
    sub = lw // k
    Xp = jnp.pad(X, ((0, padded_rows * k - n), (0, sub - d)))
    return Xp.reshape(padded_rows, lw)


def unpack_rows(P: jnp.ndarray, k: int, n: int, d: int) -> jnp.ndarray:
    sub = P.shape[1] // k
    return P.reshape(P.shape[0] * k, sub)[:n, :d]


def _select_sub(G: jnp.ndarray, mod: jnp.ndarray, k: int, d: int
                ) -> jnp.ndarray:
    """Per-edge sub-row select: (E, 128) -> (E, d)."""
    if k == 1:
        return G[:, :d]
    sub = G.shape[1] // k
    sel = jax.nn.one_hot(mod, k, dtype=G.dtype)
    return jnp.einsum("ek,eks->es", sel, G.reshape(-1, k, sub)[:, :, :d],
                      precision=jax.lax.Precision.HIGHEST)


def _expand_sub(v: jnp.ndarray, mod: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-edge sub-row placement: (E, d) -> (E, line_width)."""
    sub = line_width(k, v.shape[1]) // k
    vp = jnp.pad(v, ((0, 0), (0, sub - v.shape[1])))
    if k == 1:
        return vp
    sel = jax.nn.one_hot(mod, k, dtype=v.dtype)
    return (sel[:, :, None] * vp[:, None, :]).reshape(-1, k * sub)


# --------------------------------------------------------------------------
# featureless layer: out[src] += norm * table[rel, dst]
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def featureless_aggregate(table: jnp.ndarray, plans: LayerPlans,
                          out_dim: int, interpret: bool = False
                          ) -> jnp.ndarray:
    """``out[s] = sum_e norm_e * select(table[rel_e * nrp + dst_e // k])``.

    ``table``: relation-major packed weight table (R * n_in_rows, 128),
    typically ``compose(comp, packed)`` — autodiff upstream of this op
    turns the returned d_table into d_comp / d_basis. The table's logical
    row width is ``out_dim`` (k_in == k_out). Returns (num_nodes, out_dim).
    """
    f = plans.fwd
    k = plans.k_in
    V = _gather_sub(table, f.rel * plans.n_in_rows + f.gather_row,
                    f.in_mod, k, out_dim)
    out = _place_scatter(V, f.out_mod, f, plans.n_out_rows, plans.k_out,
                         out_dim, table.shape[1], interpret)
    return unpack_rows(out, plans.k_out, plans.out_nodes, out_dim)


def _gather_sub(table: jnp.ndarray, row: jnp.ndarray, mod: jnp.ndarray,
                k: int, d: int) -> jnp.ndarray:
    """Gather per-edge logical sub-rows from a packed (T, L) table.

    Default: full-line row gather + one-hot sub-row select — measured
    fastest on v5e. ``MRGCN_NARROW_GATHER=1`` switches to gathering
    16-lane logical rows from the (T*k, L//k) view (8x fewer bytes but
    ~6x slower per row in XLA on v5e; kept for re-evaluation on other
    chips/compilers)."""
    if k == 1:
        return table[row][:, :d]
    if os.environ.get("MRGCN_NARROW_GATHER") == "1":
        sub = table.shape[1] // k
        return table.reshape(-1, sub)[row * k + mod][:, :d]
    return _select_sub(table[row], mod, k, d)


def _place_scatter(V, place_mod, stream: Stream, out_rows: int,
                   k: int, d: int, L: int, interpret: bool) -> jnp.ndarray:
    """norm-scale + sub-row place + block scatter of per-edge values
    ``V`` (E, d).

    Default path: XLA expand + the sorted block-scatter kernel (measured
    fastest on v5e — XLA fuses the expand into the scatter's input
    stream). ``MRGCN_FUSED_PLACE=1`` (or interpret mode, for test
    coverage) routes through the single fused Pallas pass instead."""
    fused_on = os.environ.get("MRGCN_FUSED_PLACE") == "1" or interpret
    if fused_on and (_use_pallas() or interpret):
        from mrgcn_tpu.ops.pallas_gather import _super_blocks_for
        sb = _super_blocks_for(stream.edge_block, L, stream.num_slabs)
        if sb >= 4 or interpret:
            return fused_place_scatter(
                V, place_mod, stream.norm, stream.scatter_local,
                stream.scatter_blk, out_rows, k, L, stream.row_block,
                stream.edge_block, interpret)
        logger.warning(
            "MRGCN_FUSED_PLACE requested but the stream's %d slabs only "
            "admit a super-block factor of %d (<4) for L=%d — using the "
            "composed scatter path", stream.num_slabs, sb, L)
    msgs = _expand_sub(V[:, :d] * stream.norm[:, None], place_mod, k)
    if msgs.shape[1] < L:
        msgs = jnp.pad(msgs, ((0, 0), (0, L - msgs.shape[1])))
    return sorted_scatter(msgs, stream.scatter_local, stream.scatter_blk,
                          out_rows, stream.row_block, stream.edge_block,
                          interpret)


def _featureless_fwd(table, plans, out_dim, interpret):
    out = featureless_aggregate(table, plans, out_dim, interpret)
    # the table residual is a reference (alive in the params anyway)
    return out, (table, plans)


def _featureless_bwd(out_dim, interpret, res, d_out):
    table, plans = res
    table_rows = table.shape[0]
    b = plans.bwd_table
    # recompute the per-edge cotangent on the (rel, dst)-sorted stream from
    # the node-sized d_out: one small-table gather, no permutation
    d_out_p = pack_rows(d_out, plans.k_out, plans.n_out_rows)
    d_v = _gather_sub(d_out_p, b.src_row, b.out_mod, plans.k_out, out_dim)
    d_table = _place_scatter(d_v, b.in_mod, b, table_rows, plans.k_in,
                             out_dim, table.shape[1], interpret)
    return d_table.astype(table.dtype), None


featureless_aggregate.defvjp(_featureless_fwd, _featureless_bwd)


# --------------------------------------------------------------------------
# composed featureless layer: compose + aggregate with a single-pass backward
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def featureless_composed(comp: jnp.ndarray, packed: jnp.ndarray,
                         plans: LayerPlans, out_dim: int,
                         interpret: bool = False) -> jnp.ndarray:
    """``featureless_aggregate(compose(comp, packed))`` with a fused
    backward: the cotangent table d_t is scattered once (bwd_table stream)
    and then consumed by :func:`..pallas_gather.compose_grad_pass`, which
    emits d_comp AND d_packed in ONE pass over d_t — the generic vjp chain
    (featureless_aggregate -> compose_packed) streams the ~793 MB table
    twice (benchmarks/micro_compose_bwd_variants.py).

    ``comp``: (R, B); ``packed``: (B, n_in_rows, L) pre-padded to the
    plan's row count. Returns (num_nodes, out_dim).
    """
    from mrgcn_tpu.ops.rspmm import compose_packed
    flat = compose_packed(comp, packed)
    return featureless_aggregate(flat.reshape(-1, packed.shape[2]), plans,
                                 out_dim, interpret)


def _featureless_composed_fwd(comp, packed, plans, out_dim, interpret):
    out = featureless_composed(comp, packed, plans, out_dim, interpret)
    return out, (comp, packed, plans)


def _featureless_composed_bwd(out_dim, interpret, res, d_out):
    comp, packed, plans = res
    R, B = comp.shape
    L = packed.shape[2]
    b = plans.bwd_table
    d_out_p = pack_rows(d_out, plans.k_out, plans.n_out_rows)
    d_v = _gather_sub(d_out_p, b.src_row, b.out_mod, plans.k_out, out_dim)
    d_table = _place_scatter(d_v, b.in_mod, b, R * plans.n_in_rows,
                             plans.k_in, out_dim, L, interpret)
    d_comp, d_packed = compose_grad_pass(
        d_table, packed.reshape(-1, L), comp, R, B, interpret)
    return (d_comp.astype(comp.dtype),
            d_packed.reshape(packed.shape).astype(packed.dtype), None)


featureless_composed.defvjp(_featureless_composed_fwd,
                            _featureless_composed_bwd)


# --------------------------------------------------------------------------
# basis-stream featureless layer: compose per edge, never build the table
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def featureless_basis(comp: jnp.ndarray, packed: jnp.ndarray,
                      plans: LayerPlans, out_dim: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Featureless layer for graphs whose composed identity table does not
    fit HBM (e.g. LP: R=475, 200-lane rows -> ~7 GB): gather the B basis
    tables per edge on the src-sorted stream, contract with ``comp[rel_e]``
    on the VPU, and block-scatter — the sorted-stream engine without ever
    materialising the (R * rows, L) table. Needs ``plans`` built with
    ``kind="identity_basis"`` (real dst-sorted bwd_h stream).

    ``comp``: (R, B) with small B (:data:`MAX_BASIS_STREAMS`);
    ``packed``: (B, n_in_rows, L). Returns (num_nodes, out_dim).

    Backward (all stream ops, no giant intermediates):
      * ``d_comp[r, b] = sum_e norm_e <d_out[src_e], packed[b, dst_e]>``
        — per-slab lane-reduces on the (rel, dst)-sorted bwd_table stream
        (slabs are relation-constant), segment-summed over slab_rel;
      * ``d_packed[b] += comp[rel_e, b] norm_e d_out[src_e]`` — B
        block-scatters on the dst-sorted bwd_h stream.
    """
    assert plans.kind == "identity_basis", \
        "featureless_basis needs identity_basis plans (plain identity " \
        "plans alias bwd_h to the fwd stream -> silently wrong d_packed)"
    f = plans.fwd
    k = plans.k_in
    B = comp.shape[1]
    w = comp[f.rel]                                     # (E, B)
    v = 0.0
    for b in range(B):
        g = _gather_sub(packed[b], f.gather_row, f.in_mod, k, out_dim)
        v = v + w[:, b:b + 1] * g                       # (E, out_dim)
    out = _place_scatter(v, f.out_mod, f, plans.n_out_rows, plans.k_out,
                         out_dim, packed.shape[2], interpret)
    return unpack_rows(out, plans.k_out, plans.out_nodes, out_dim)


def _featureless_basis_fwd(comp, packed, plans, out_dim, interpret):
    out = featureless_basis(comp, packed, plans, out_dim, interpret)
    return out, (comp, packed, plans)


def _featureless_basis_bwd(out_dim, interpret, res, d_out):
    comp, packed, plans = res
    B = comp.shape[1]
    k = plans.k_in
    d_out_p = pack_rows(d_out, plans.k_out, plans.n_out_rows)

    # ---- d_packed on the dst-sorted bwd_h stream: B block-scatters
    h = plans.bwd_h
    d_vh = _gather_sub(d_out_p, h.src_row, h.out_mod, plans.k_out,
                       out_dim)                         # (E, out), no norm
    w_h = comp[h.rel]                                   # (E, B)

    if os.environ.get("MRGCN_FUSED_BASIS_BWD") == "1" and k == 1:
        # fused pass per basis: the d_packed scatter and the d_comp
        # gather visit the SAME (block, local) addresses on this stream
        # — pallas_gather.fused_scatter_dot does both in one pass,
        # removing B per-edge row-gather passes from the backward
        from mrgcn_tpu.ops.pallas_gather import fused_scatter_dot
        L = packed.shape[2]
        dvn = d_vh * h.norm[:, None]
        if dvn.shape[1] < L:
            dvn = jnp.pad(dvn, ((0, 0), (0, L - dvn.shape[1])))
        planes, cols = [], []
        for b in range(B):
            out_b, dots_b = fused_scatter_dot(
                dvn, w_h[:, b], h.scatter_local, h.scatter_blk,
                packed[b], plans.n_in_rows, h.row_block, h.edge_block,
                interpret)
            planes.append(out_b)
            cols.append(dots_b)
        d_packed = jnp.stack(planes, axis=0)
        per_edge = jnp.stack(cols, axis=1)              # (E, B)
        d_comp = jax.ops.segment_sum(per_edge, h.rel,
                                     num_segments=comp.shape[0])
        return (d_comp.astype(comp.dtype), d_packed.astype(packed.dtype),
                None)
    planes = []
    for b in range(B):
        planes.append(_place_scatter(
            d_vh * w_h[:, b:b + 1], h.in_mod, h, plans.n_in_rows,
            k, out_dim, packed.shape[2], interpret))
    d_packed = jnp.stack(planes, axis=0)                # (B, rows, L)

    if os.environ.get("MRGCN_DCOMP_TSTREAM") == "1":
        # superseded formulation, kept for on-device comparison: the
        # (rel, dst)-sorted bwd_table stream splits slabs on
        # (block, relation), so at LP scale (R=475) it pads 6.3x —
        # 3.53M padded rows vs 559k edges — and the three per-edge ops
        # below each pay it (the ~50 ms "composition residual" of
        # benchmarks/tpu_batch_r3h.py)
        t = plans.bwd_table
        eb, nslab = t.edge_block, t.num_slabs
        d_vt = _gather_sub(d_out_p, t.src_row, t.out_mod, plans.k_out,
                           out_dim) * t.norm[:, None]   # (E, out)
        cols = []
        for b in range(B):
            g_t = _gather_sub(packed[b], t.gather_row, t.in_mod, k,
                              out_dim)
            cols.append(jnp.sum(d_vt * g_t, axis=1)
                        .reshape(nslab, eb).sum(axis=1))  # (nslab,)
        per_slab = jnp.stack(cols, axis=1)              # (nslab, B)
        d_comp = jax.ops.segment_sum(per_slab, t.slab_rel,
                                     num_segments=comp.shape[0])
    else:
        # ---- d_comp on the SAME bwd_h stream (1.01x padding): reuse the
        # d_out gather above (XLA CSEs it), gather the B basis rows per
        # edge (h.gather_row/in_mod are the packed-table coordinates),
        # per-edge lane dots, then a narrow (E, B) segment-sum over rel.
        # Padding edges carry norm 0 and contribute nothing.
        dvn = d_vh * h.norm[:, None]                    # (E, out)
        cols = []
        for b in range(B):
            g_hb = _gather_sub(packed[b], h.gather_row, h.in_mod, k,
                               out_dim)
            cols.append(jnp.sum(dvn * g_hb, axis=1))    # (E,)
        per_edge = jnp.stack(cols, axis=1)              # (E, B)
        d_comp = jax.ops.segment_sum(per_edge, h.rel,
                                     num_segments=comp.shape[0])

    return (d_comp.astype(comp.dtype), d_packed.astype(packed.dtype),
            None)


featureless_basis.defvjp(_featureless_basis_fwd, _featureless_basis_bwd)


# --------------------------------------------------------------------------
# wide-line basis engine: ONE combined (rows, B*L) table per layer
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def stream_basis_aggregate(comp: jnp.ndarray, wide: jnp.ndarray,
                           plans: LayerPlans, out_dim: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Basis-stream layer over a COMBINED table: the B per-basis planes
    live side by side in one ``(rows, B*L)`` array, so every per-edge pass
    moves ONE wide line instead of B separate L-lane lines.

    The per-edge gathers/scatters of :func:`featureless_basis` are
    transaction-bound (~6-8 ns per *row*, width nearly free — see
    docs/session_r3.md r3l), so combining the planes halves (B=2) the
    per-edge row count of the forward gather, the d_packed scatter and the
    d_comp gather. Same math:

        ``out[s] = sum_e norm_e sum_b comp[rel_e, b] wide[row(dst_e),
        b*L : b*L+out_dim]``

    ``comp``: (R, B); ``wide``: (n_in_rows, B*L) — e.g.
    ``combine_planes(packed)`` for the featureless layer or a padded
    ``H @ basis`` for :func:`dense_basis`. Needs plans with a real
    dst-sorted ``bwd_h`` stream (kind ``identity_basis`` or ``dense``).
    Returns (out_nodes, out_dim).
    """
    assert plans.kind in ("identity_basis", "dense"), \
        "stream_basis_aggregate needs a real dst-sorted bwd_h stream " \
        "(identity plans alias bwd_h to fwd -> silently wrong gradients)"
    f = plans.fwd
    k = plans.k_in
    B = comp.shape[1]
    L = wide.shape[1] // B
    w = comp[f.rel]                                     # (E, B)
    g = wide[f.gather_row]                              # (E, B*L) one pass
    v = 0.0
    for b in range(B):
        sel = _select_sub(g[:, b * L:(b + 1) * L], f.in_mod, k, out_dim)
        v = v + w[:, b:b + 1] * sel                     # (E, out_dim)
    out = _place_scatter(v, f.out_mod, f, plans.n_out_rows, plans.k_out,
                         out_dim, line_width(plans.k_out, out_dim),
                         interpret)
    return unpack_rows(out, plans.k_out, plans.out_nodes, out_dim)


def _stream_basis_fwd(comp, wide, plans, out_dim, interpret):
    out = stream_basis_aggregate(comp, wide, plans, out_dim, interpret)
    return out, (comp, wide, plans)


def _stream_basis_bwd(out_dim, interpret, res, d_out):
    comp, wide, plans = res
    B = comp.shape[1]
    L = wide.shape[1] // B
    k = plans.k_in
    h = plans.bwd_h
    d_out_p = pack_rows(d_out, plans.k_out, plans.n_out_rows)

    # one d_out gather on the dst-sorted stream, shared by both grads
    d_vh = _gather_sub(d_out_p, h.src_row, h.out_mod, plans.k_out,
                       out_dim)                         # (E, out), no norm
    w_h = comp[h.rel]                                   # (E, B)

    # ---- d_wide: ONE combined-line scatter
    # d_wide[row(dst_e), b*L:] += norm_e comp[rel_e, b] d_out[src_e]
    msgs = jnp.concatenate(
        [_expand_sub(d_vh * w_h[:, b:b + 1], h.in_mod, k)
         for b in range(B)], axis=1) * h.norm[:, None]  # (E, B*L)
    d_wide = sorted_scatter(msgs, h.scatter_local, h.scatter_blk,
                            wide.shape[0], h.row_block, h.edge_block,
                            interpret)

    # ---- d_comp on the same stream: ONE combined-line re-gather
    dvn = d_vh * h.norm[:, None]
    g = wide[h.gather_row]                              # (E, B*L) one pass
    cols = []
    for b in range(B):
        sel = _select_sub(g[:, b * L:(b + 1) * L], h.in_mod, k, out_dim)
        cols.append(jnp.sum(dvn * sel, axis=1))         # (E,)
    per_edge = jnp.stack(cols, axis=1)                  # (E, B)
    d_comp = jax.ops.segment_sum(per_edge, h.rel,
                                 num_segments=comp.shape[0])
    return d_comp.astype(comp.dtype), d_wide.astype(wide.dtype), None


stream_basis_aggregate.defvjp(_stream_basis_fwd, _stream_basis_bwd)


def combine_planes(packed: jnp.ndarray) -> jnp.ndarray:
    """(B, rows, L) -> (rows, B*L): per-basis planes side by side. One
    small in-jit copy (~30 MB at LP scale, <0.1 ms) buying halved per-edge
    row counts in :func:`stream_basis_aggregate`; its autodiff transpose
    un-combines d_wide back into the parameter layout."""
    B, rows, L = packed.shape
    return packed.transpose(1, 0, 2).reshape(rows, B * L)


def featureless_basis_wide(comp: jnp.ndarray, packed: jnp.ndarray,
                           plans: LayerPlans, out_dim: int,
                           interpret: bool = False) -> jnp.ndarray:
    """:func:`featureless_basis` on the combined-plane layout — same
    ``identity_basis`` plans, same parameters, ~half the per-edge rows
    moved per pass (``MRGCN_WIDE_BASIS=1`` routes the model here)."""
    return stream_basis_aggregate(comp, combine_planes(packed), plans,
                                  out_dim, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def dense_basis_hybrid(H: jnp.ndarray, basis: jnp.ndarray,
                       comp: jnp.ndarray, plans: LayerPlans,
                       grp_src: jnp.ndarray, grp_dst: jnp.ndarray,
                       grp_norm: jnp.ndarray, group_rel: jnp.ndarray,
                       group_size: int, in_dim: int, out_dim: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Measured-best halves of the two dense formulations (v5e,
    benchmarks/tpu_batch_r4a.py FINAL_L2_AB at FB15k-237 scale):

      * FORWARD on the stream engine through the (n, B*out) per-basis
        projections (:func:`dense_basis`): 11.4 ms vs the
        relation-grouped 15.7 — the sorted place-scatter beats the
        unsorted segment-sum.
      * BACKWARD in the relation-grouped formulation (what autodiff of
        :func:`mrgcn_tpu.ops.rspmm.transform_aggregate_grouped`
        produces): its d(H, W) chain costs 17.5 ms incremental vs the
        stream backward's 32.4 (the wide (E, B*L) cotangent passes are
        byte-bound — combining planes halves transactions but not
        bytes).

    Needs both the plans (stream fwd) and the relation-grouped arrays
    (grouped bwd). Math identical to either formulation; gradient parity
    pinned in tests/test_relational.py.
    """
    return dense_basis(H, basis, comp, plans, in_dim, out_dim, interpret)


def _dense_basis_hybrid_fwd(H, basis, comp, plans, grp_src, grp_dst,
                            grp_norm, group_rel, group_size, in_dim,
                            out_dim, interpret):
    out = dense_basis_hybrid(H, basis, comp, plans, grp_src, grp_dst,
                             grp_norm, group_rel, group_size, in_dim,
                             out_dim, interpret)
    return out, (H, basis, comp, grp_src, grp_dst, grp_norm, group_rel)


def _dense_basis_hybrid_bwd(group_size, in_dim, out_dim, interpret, res,
                            d_out):
    from mrgcn_tpu.ops import rspmm
    H, basis, comp, grp_src, grp_dst, grp_norm, group_rel = res
    G = group_rel.shape[0]
    num_nodes = H.shape[0]
    hp = jax.lax.Precision.HIGHEST

    W = rspmm._compose_weights(basis, comp)            # (R, in, out)
    d_m = d_out[grp_src] * grp_norm[:, None]           # (E, out)
    d_mg = d_m.reshape(G, group_size, out_dim)
    Wg = W[group_rel]                                  # (G, in, out)

    # ---- d_H: per-group d_m @ W^T, unsorted segment-sum over grp_dst
    d_Hg = jax.lax.dot_general(
        d_mg, Wg, (((2,), (2,)), ((0,), (0,))), precision=hp,
        preferred_element_type=jnp.float32)            # (G, gs, in)
    d_H = jax.ops.segment_sum(d_Hg.reshape(G * group_size, in_dim),
                              grp_dst, num_segments=num_nodes)

    # ---- d_W: per-group Hg^T @ d_m, segment-sum over group_rel, then
    # the tiny (R, in, out) -> (d_comp, d_basis) einsums
    Hg = H[grp_dst].reshape(G, group_size, in_dim)
    d_Wg = jax.lax.dot_general(
        Hg, d_mg, (((1,), (1,)), ((0,), (0,))), precision=hp,
        preferred_element_type=jnp.float32)            # (G, in, out)
    d_W = jax.ops.segment_sum(d_Wg.reshape(G, in_dim * out_dim),
                              group_rel, num_segments=W.shape[0])
    d_W = d_W.reshape(W.shape)
    d_comp = jnp.einsum("rio,bio->rb", d_W, basis, precision=hp)
    d_basis = jnp.einsum("rb,rio->bio", comp, d_W, precision=hp)
    return (d_H.astype(H.dtype), d_basis.astype(basis.dtype),
            d_comp.astype(comp.dtype), None, None, None, None, None)


dense_basis_hybrid.defvjp(_dense_basis_hybrid_fwd, _dense_basis_hybrid_bwd)


def dense_basis(H: jnp.ndarray, basis: jnp.ndarray, comp: jnp.ndarray,
                plans: LayerPlans, in_dim: int, out_dim: int,
                interpret: bool = False) -> jnp.ndarray:
    """Dense basis-decomposed layer as a stream op:
    ``out[s] = sum_e norm_e H[dst_e] @ (sum_b comp[rel_e,b] basis[b])``.

    Rewrites the contraction through the per-basis projections
    ``flat = H @ basis`` — an (n, B*out) tensor, TINY at node scale — so
    ALL edge-scale work runs on the sorted-stream engine with wide lines:
    no per-group ``(G, in, out)`` d_W materialisation (the
    relation-grouped path's measured 25 ms-class backward at FB15k-237
    scale, docs/session_r3.md FINAL_GROUPED_DW), no unsorted segment-sum.
    d_H and d_basis fall out of the einsum's autodiff at node scale.

    Needs ``plans.k_in == 1`` (wide rows index nodes directly) and a real
    bwd_h stream (``kind="dense"``). ``basis``: (B, in, out); ``comp``:
    (R, B). Replaces reference: mrgcn/layers/graph.py:62-102 backward.
    """
    assert plans.k_in == 1, "dense_basis gathers node rows (k_in must be 1)"
    n = H.shape[0]
    B = comp.shape[1]
    L = line_width(1, out_dim)
    flat = jnp.einsum("ni,bio->nbo", H, basis,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)   # (n, B, out)
    wide = jnp.pad(flat, ((0, plans.n_in_rows - n), (0, 0),
                          (0, L - out_dim))).reshape(plans.n_in_rows,
                                                     B * L)
    return stream_basis_aggregate(comp, wide, plans, out_dim, interpret)


# --------------------------------------------------------------------------
# dense layer: out[src] += norm * (H[dst] @ W[rel])
# --------------------------------------------------------------------------

def _slab_matmul(x: jnp.ndarray, W: jnp.ndarray, stream: Stream,
                 in_dim: int, out_dim: int) -> jnp.ndarray:
    """``x[e] @ W[rel_e]`` on a stream whose slabs are relation-constant:
    gather ONE (in, out) weight per slab, then a batched MXU matmul.
    Padding edges carry norm == 0 downstream, so the slab weight applied
    to them is harmless."""
    nslab, eb = stream.num_slabs, stream.edge_block
    Ws = W.reshape(-1, in_dim * out_dim)[stream.slab_rel].reshape(
        nslab, in_dim, out_dim)
    return jax.lax.dot_general(
        x.reshape(nslab, eb, in_dim), Ws,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).reshape(-1, out_dim)


def _slab_matmul_t(d: jnp.ndarray, W: jnp.ndarray, stream: Stream,
                   in_dim: int, out_dim: int) -> jnp.ndarray:
    """``d[e] @ W[rel_e]^T`` (cotangent side of :func:`_slab_matmul`)."""
    nslab, eb = stream.num_slabs, stream.edge_block
    Ws = W.reshape(-1, in_dim * out_dim)[stream.slab_rel].reshape(
        nslab, in_dim, out_dim)
    return jax.lax.dot_general(
        d.reshape(nslab, eb, out_dim), Ws,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).reshape(-1, in_dim)

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_aggregate(H: jnp.ndarray, W: jnp.ndarray, plans: LayerPlans,
                    in_dim: int, out_dim: int,
                    interpret: bool = False) -> jnp.ndarray:
    """``out[s] = sum_e norm_e * H[dst_e] @ W[rel_e]``.

    ``H``: (num_nodes, in_dim); ``W``: (R, in_dim, out_dim) — composed
    weights (basis decomposition handled by the caller's compose, whose
    autodiff consumes the d_W this op returns).
    """
    f = plans.fwd
    Hp = pack_rows(H, plans.k_in, plans.n_in_rows)
    Hg = _gather_sub(Hp, f.gather_row, f.in_mod, plans.k_in, in_dim)
    if f.rel_const:
        # slabs are relation-constant (build_layer_plans): one weight row
        # per slab, applied as a batched MXU matmul — 500x cheaper than
        # the per-edge (E, in, out) weight gather + einsum
        v = _slab_matmul(Hg, W, f, in_dim, out_dim)
        out = _place_scatter(v, f.out_mod, f, plans.n_out_rows,
                             plans.k_out, out_dim,
                             line_width(plans.k_out, out_dim), interpret)
    else:
        # keep the per-edge weight gather IMMEDIATELY feeding the einsum
        # and the scatter — XLA only avoids materialising the (E, in*out)
        # gather (45 GB at FB15k-237 shapes) when this exact producer/
        # consumer chain fuses
        Wg = W.reshape(-1, in_dim * out_dim)[f.rel].reshape(
            -1, in_dim, out_dim)
        v = jnp.einsum("ei,eio->eo", Hg, Wg,
                       precision=jax.lax.Precision.HIGHEST) * f.norm[:, None]
        msgs = _expand_sub(v, f.out_mod, plans.k_out)
        out = sorted_scatter(msgs, f.scatter_local, f.scatter_blk,
                             plans.n_out_rows, f.row_block, f.edge_block,
                             interpret)
    return unpack_rows(out, plans.k_out, plans.out_nodes, out_dim)


def _dense_fwd(H, W, plans, in_dim, out_dim, interpret):
    out = dense_aggregate(H, W, plans, in_dim, out_dim, interpret)
    return out, (H, W, plans)


def _dense_bwd(in_dim, out_dim, interpret, res, d_out):
    H, W, plans = res
    d_out_p = pack_rows(d_out, plans.k_out, plans.n_out_rows)

    # ---- d_H on the dst-sorted stream: d_H[dst] += norm (d_out[src] W^T)
    h = plans.bwd_h
    if h.rel_const:
        d_v_h = _gather_sub(d_out_p, h.src_row, h.out_mod, plans.k_out,
                            out_dim)
        d_Hg = _slab_matmul_t(d_v_h, W, h, in_dim, out_dim)
        # norm is scalar per edge: applied by the place-scatter, after
        # the weight matmul it commutes with
        d_Hp = _place_scatter(d_Hg, h.in_mod, h, plans.n_in_rows,
                              plans.k_in, in_dim,
                              line_width(plans.k_in, in_dim), interpret)
    else:
        # fusion-critical chain — see the forward's non-rel_const branch
        d_v_h = _gather_sub(d_out_p, h.src_row, h.out_mod, plans.k_out,
                            out_dim) * h.norm[:, None]
        WgT = W.reshape(-1, in_dim * out_dim)[h.rel].reshape(
            -1, in_dim, out_dim)
        d_Hg = jnp.einsum("eo,eio->ei", d_v_h, WgT,
                          precision=jax.lax.Precision.HIGHEST)
        d_Hp = sorted_scatter(_expand_sub(d_Hg, h.in_mod, plans.k_in),
                              h.scatter_local, h.scatter_blk,
                              plans.n_in_rows, h.row_block, h.edge_block,
                              interpret)
    d_H = unpack_rows(d_Hp, plans.k_in, plans.in_nodes, in_dim
                      ).astype(H.dtype)

    # ---- d_W on the (rel, dst)-sorted stream: slabs are relation-constant
    # so per-slab (in x out) outer-product sums are batched MXU matmuls,
    # then a tiny segment-sum over slabs by relation
    t = plans.bwd_table
    eb = t.edge_block
    nslab = t.num_slabs
    Hp = pack_rows(H, plans.k_in, plans.n_in_rows)
    Hg_t = _gather_sub(Hp, t.gather_row, t.in_mod, plans.k_in, in_dim)
    d_v_t = _gather_sub(d_out_p, t.src_row, t.out_mod, plans.k_out,
                        out_dim) * t.norm[:, None]
    per_slab = jax.lax.dot_general(
        Hg_t.reshape(nslab, eb, in_dim), d_v_t.reshape(nslab, eb, out_dim),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)            # (nslab, in, out)
    d_W = jax.ops.segment_sum(per_slab.reshape(nslab, in_dim * out_dim),
                              t.slab_rel, num_segments=W.shape[0])
    d_W = d_W.reshape(W.shape).astype(W.dtype)
    return d_H, d_W, None


dense_aggregate.defvjp(_dense_fwd, _dense_bwd)


# --------------------------------------------------------------------------
# dense reference oracle (tests)
# --------------------------------------------------------------------------

def reference_featureless(table, plans: LayerPlans, out_dim, src, dst,
                          rel, norm):
    k = plans.k_in
    sub = 128 // k
    rows = rel * plans.n_in_rows + dst // k
    lines = np.asarray(table)[rows]
    v = lines.reshape(-1, k, sub)[np.arange(len(dst)), dst % k, :out_dim]
    out = np.zeros((plans.out_nodes, out_dim), np.float32)
    np.add.at(out, src, v * norm[:, None])
    return out
