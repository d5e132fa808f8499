"""Gather-fused relational aggregation: block-resident one-hot gather.

Why this kernel exists
----------------------
The R-GCN epoch is gather-bound: XLA lowers ``table[idx]`` row gathers at
~20M rows/s on a v5e (~50 ns/row) regardless of row width, order, or dtype
(measured: benchmarks/micro_compose.py, micro_gather_flags.py), so a
700k-edge layer pays ~34 ms per gather while the matching scatter-add takes
0.33 ms. This module removes the random access entirely:

1. **Host side (once, static structure):** edges are sorted by
   (relation-major, dst-minor) and split into segments at table-block
   boundaries, each segment padded to a multiple of ``edge_block``
   (:func:`build_gather_plan`). Every ``edge_block``-sized slab of edges
   then reads rows from exactly ONE ``row_block``-sized slab of the table
   and shares one relation.
2. **Device side:** a Pallas kernel walks the edge slabs; the table slab
   for each step is DMA'd into VMEM by the pipeline (sequential streaming,
   not random access), and the per-edge row select becomes a one-hot
   matmul on the MXU: ``G = onehot(local_row)^T-contract table_block``.

Every per-step block is 128-lane aligned — the local-row indices travel as
one ``(1, edge_block)`` int32 lane row and the output is the full
``(edge_block, L)`` gathered rows — narrow/strided DMAs per grid step cost
microseconds and dominate otherwise. The packed sub-row select / basis mix
epilogue runs in XLA on the sequential output stream (VPU-bound, fusable,
and autodiff handles it, so the custom VJP only needs the gather's
transpose: a scatter-add, which XLA already does at speed).

The one-hot contraction is *exact* in f32 (products are ``1.0 * x`` summed
with zeros), so the kernel is bit-compatible with ``table[idx]``.

Equivalent reference computation: the sparse row gather inside
``A @ [I F] W`` (reference: mrgcn/layers/graph.py:93-95).

The same plan serves every layer of the network: the plan depends only on
the packing factor ``k`` (rows per 128-lane line, see
:func:`mrgcn_tpu.ops.rspmm.packing_factor`), not on the table contents —
the featureless layer gathers from the composed identity weight
``(R * n_rows, 128)`` (block index ``rel * nb + dst_block``) and dense
layers gather from the packed activation table ``(n_rows, 128)`` (block
index ``dst_block``); both tables are padded so blocks never straddle a
relation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 512    # table rows resident in VMEM per step
EDGE_BLOCK = 256   # edges per grid step (also the relation-group size)


# --------------------------------------------------------------------------
# Host-side planning
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class GatherPlan:
    """Static edge layout for the block-resident gather (host numpy).

    Arrays are in (relation-major, dst-minor) sorted order, padded so each
    consecutive ``edge_block`` slab shares one relation and one table block.
    Padding slots carry ``norm == 0``, ``src == num_nodes`` (dropped by
    segment_sum) and ``local == row_block`` (no one-hot match -> zero row).
    """

    src: np.ndarray        # (E_pad,) int32 — output row (num_nodes on pad)
    local: np.ndarray      # (num_blocks, edge_block) int32 — row in block
    dst_mod: np.ndarray    # (E_pad,) int32 — sub-row within the packed line
    norm: np.ndarray       # (E_pad,) float32 — D^-1 weight (0 on pad)
    block_rel: np.ndarray  # (num_blocks,) int32 — relation of each slab
    block_tbl: np.ndarray  # (num_blocks,) int32 — dst-dim table block index
    k: int                 # packing factor (logical rows per 128-lane line)
    row_block: int
    edge_block: int
    n_tbl_blocks: int      # table blocks per relation (= padded n_rows / RB)
    num_nodes: int

    @property
    def num_padded_edges(self) -> int:
        return int(self.src.shape[0])

    @property
    def num_blocks(self) -> int:
        return int(self.block_rel.shape[0])

    @property
    def padded_rows(self) -> int:
        """Packed table rows after padding (n_tbl_blocks * row_block)."""
        return self.n_tbl_blocks * self.row_block


def build_gather_plan(src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
                      norm: np.ndarray, num_nodes: int, k: int,
                      row_block: int = ROW_BLOCK,
                      edge_block: int = EDGE_BLOCK) -> GatherPlan:
    """Sort edges by (rel, dst), segment at (rel, dst-block) boundaries,
    pad each segment to a multiple of ``edge_block``.

    ``k`` is the packing factor of the table the plan will gather from:
    logical row ``d`` lives at packed row ``d // k``, sub-row ``d % k``.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    rel = np.asarray(rel, dtype=np.int64)
    norm = np.asarray(norm, dtype=np.float32)
    E = src.shape[0]

    n_rows = -(-num_nodes // k)
    nb = max(1, -(-n_rows // row_block))

    order = np.lexsort((dst, rel))
    s, d, r, nm = src[order], dst[order], rel[order], norm[order]
    prow = d // k
    dblk = prow // row_block
    seg_key = r * nb + dblk

    if E == 0:
        boundaries = np.array([], dtype=np.int64)
    else:
        boundaries = np.flatnonzero(np.diff(seg_key)) + 1
    seg_starts = np.concatenate([[0], boundaries, [E]]).astype(np.int64)

    # vectorised segment padding: compute padded length per segment, then
    # scatter the sorted edges into their padded slots in one shot
    lengths = np.diff(seg_starts)
    padded = -(-lengths // edge_block) * edge_block
    out_starts = np.concatenate([[0], np.cumsum(padded)])
    E_pad = int(out_starts[-1])

    seg_of_edge = np.repeat(np.arange(len(lengths)), lengths)
    offset_in_seg = np.arange(E) - seg_starts[seg_of_edge]
    slots = out_starts[seg_of_edge] + offset_in_seg

    src_p = np.full(E_pad, num_nodes, dtype=np.int64)
    local_p = np.full(E_pad, row_block, dtype=np.int64)
    mod_p = np.zeros(E_pad, dtype=np.int64)
    norm_p = np.zeros(E_pad, dtype=np.float32)
    src_p[slots] = s
    local_p[slots] = prow - dblk * row_block
    mod_p[slots] = d % k
    norm_p[slots] = nm

    num_blocks = max(E_pad // edge_block, 1)
    if E_pad == 0:  # keep one all-padding block so shapes stay non-empty
        E_pad = edge_block
        src_p = np.full(E_pad, num_nodes, dtype=np.int64)
        local_p = np.full(E_pad, row_block, dtype=np.int64)
        mod_p = np.zeros(E_pad, dtype=np.int64)
        norm_p = np.zeros(E_pad, dtype=np.float32)
        block_rel = np.zeros(1, dtype=np.int64)
        block_tbl = np.zeros(1, dtype=np.int64)
    else:
        block_seg = np.repeat(np.arange(len(lengths)),
                              (padded // edge_block).astype(np.int64))
        seg_rel = r[seg_starts[:-1]]
        seg_blk = dblk[seg_starts[:-1]]
        block_rel = seg_rel[block_seg]
        block_tbl = seg_blk[block_seg]

    return GatherPlan(
        src=src_p.astype(np.int32),
        local=local_p.astype(np.int32).reshape(num_blocks, edge_block),
        dst_mod=mod_p.astype(np.int32), norm=norm_p,
        block_rel=block_rel.astype(np.int32),
        block_tbl=block_tbl.astype(np.int32),
        k=int(k), row_block=int(row_block), edge_block=int(edge_block),
        n_tbl_blocks=int(nb), num_nodes=int(num_nodes))


# --------------------------------------------------------------------------
# Device-side plan (pytree carried through jit)
# --------------------------------------------------------------------------

@struct.dataclass
class DevicePlan:
    """Jit-traversable mirror of :class:`GatherPlan` (static ints are pytree
    metadata, so program shapes stay static)."""

    src: jnp.ndarray
    local: jnp.ndarray          # (num_blocks, edge_block)
    dst_mod: jnp.ndarray
    norm: jnp.ndarray
    block_rel: jnp.ndarray
    block_tbl: jnp.ndarray
    k: int = struct.field(pytree_node=False)
    row_block: int = struct.field(pytree_node=False)
    edge_block: int = struct.field(pytree_node=False)
    n_tbl_blocks: int = struct.field(pytree_node=False)
    num_nodes: int = struct.field(pytree_node=False)

    @property
    def num_padded_edges(self) -> int:
        return int(self.local.shape[0] * self.local.shape[1])

    @property
    def padded_rows(self) -> int:
        return self.n_tbl_blocks * self.row_block

    @classmethod
    def from_host(cls, p: GatherPlan) -> "DevicePlan":
        return cls(src=jnp.asarray(p.src), local=jnp.asarray(p.local),
                   dst_mod=jnp.asarray(p.dst_mod), norm=jnp.asarray(p.norm),
                   block_rel=jnp.asarray(p.block_rel),
                   block_tbl=jnp.asarray(p.block_tbl),
                   k=p.k, row_block=p.row_block, edge_block=p.edge_block,
                   n_tbl_blocks=p.n_tbl_blocks, num_nodes=p.num_nodes)


# --------------------------------------------------------------------------
# The gather kernel
# --------------------------------------------------------------------------

def _use_pallas() -> bool:
    import os
    force = os.environ.get("MRGCN_FORCE_PALLAS_GATHER")
    if force is not None:
        return force == "1"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


# sub-blocks handled per grid step: the Pallas automatic pipeline costs
# ~9 us of fixed overhead per grid step on a v5e (measured,
# benchmarks/micro_planned.py floor kernel), so the kernel amortises it by
# driving its own double-buffered HBM->VMEM DMAs for many sub-blocks per
# step
SUPER = 32


def _gather_kernel(tbl_ref, local_ref, table_hbm, out_ref, slab, sems, *,
                   row_block: int, edge_block: int, super_blocks: int):
    """One grid step = ``super_blocks`` sub-blocks of ``edge_block`` edges.

    ``tbl_ref``: scalar-prefetched (n_sub,) table-block index (SMEM);
    ``local_ref``: (1, 8, SUPER*EB) within-block row per edge;
    ``table_hbm``: full (T, L) table left in HBM — the kernel DMAs the
    ``row_block``-row slab each sub-block needs into double-buffered VMEM
    scratch, overlapping the next DMA with the current one-hot matmul.
    """
    s = pl.program_id(0)
    base = s * super_blocks
    L = table_hbm.shape[1]

    def dma(slot, j):
        idx = tbl_ref[base + j]
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(idx * row_block, row_block), :],
            slab.at[slot], sems.at[slot])

    dma(0, 0).start()
    for j in range(super_blocks):
        slot = j % 2
        if j + 1 < super_blocks:
            dma((j + 1) % 2, j + 1).start()
        dma(slot, j).wait()
        lo = local_ref[0, 0:1, j * edge_block:(j + 1) * edge_block]
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, edge_block), 0)
        onehot_t = (riota == lo).astype(slab.dtype)       # (RB, EB)
        out_ref[j * edge_block:(j + 1) * edge_block, :] = \
            jax.lax.dot_general(
                onehot_t, slab[slot], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _pallas_gather(table, local, tbl_idx, *, row_block, edge_block,
                   interpret=False):
    num_blocks = local.shape[0]
    L = table.shape[1]

    # pad the sub-block stream to a whole number of super steps; padding
    # sub-blocks read table block 0 and match no rows (local == row_block)
    n_super = -(-num_blocks // SUPER)
    pad = n_super * SUPER - num_blocks
    if pad:
        local = jnp.concatenate(
            [local, jnp.full((pad, edge_block), row_block, local.dtype)])
        tbl_idx = jnp.concatenate(
            [tbl_idx, jnp.zeros((pad,), tbl_idx.dtype)])

    # (n_super, 8, SUPER*EB): index rows replicated across 8 sublanes for
    # the (8, 128) tile rule
    local3 = jnp.broadcast_to(
        local.reshape(n_super, 1, SUPER * edge_block),
        (n_super, 8, SUPER * edge_block))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((1, 8, SUPER * edge_block),
                         lambda i, tb: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec((SUPER * edge_block, L),
                               lambda i, tb: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, row_block, L), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_gather_kernel, row_block=row_block,
                edge_block=edge_block, super_blocks=SUPER),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * SUPER * edge_block, L),
                                       jnp.float32),
        interpret=interpret,
    )(tbl_idx, local3, table)
    return out[:num_blocks * edge_block]


def _edge_rows(tbl_idx: jnp.ndarray, local: jnp.ndarray,
               row_block: int, edge_block: int) -> jnp.ndarray:
    """Global table row per padded edge (out of range on padding)."""
    rows = tbl_idx[:, None] * row_block + local          # (nblk, EB)
    return rows.reshape(-1)


def _xla_gather(table, local, tbl_idx, *, row_block, edge_block):
    """Reference/CPU path: identical math via an XLA row gather."""
    rows = _edge_rows(tbl_idx, local, row_block, edge_block)
    safe = jnp.minimum(rows, table.shape[0] - 1)
    valid = (local.reshape(-1) < row_block)[:, None]
    return jnp.where(valid, table[safe], 0).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sorted_gather(table: jnp.ndarray, local: jnp.ndarray,
                  tbl_idx: jnp.ndarray, row_block: int, edge_block: int,
                  interpret: bool = False) -> jnp.ndarray:
    """``G[e] = table[tbl_idx[e // EB] * row_block + local[e]]`` with
    zero rows where ``local == row_block`` (padding). Exact in f32.

    ``table``: (T, L); ``local``: (num_blocks, edge_block) int32;
    ``tbl_idx``: (num_blocks,) int32. Returns (num_blocks * EB, L) f32.
    """
    if _use_pallas():
        return _pallas_gather(table, local, tbl_idx, row_block=row_block,
                              edge_block=edge_block, interpret=interpret)
    return _xla_gather(table, local, tbl_idx, row_block=row_block,
                       edge_block=edge_block)


def _sorted_gather_fwd(table, local, tbl_idx, row_block, edge_block,
                       interpret):
    out = sorted_gather(table, local, tbl_idx, row_block, edge_block,
                        interpret)
    # the table residual is a reference (alive in the params anyway) — only
    # its shape/dtype are used in the backward pass
    return out, (table, local, tbl_idx)


def _sorted_gather_bwd(row_block, edge_block, interpret, res, g):
    table, local, tbl_idx = res
    rows = _edge_rows(tbl_idx, local, row_block, edge_block)
    # out-of-range padding rows are dropped by segment_sum
    d_table = jax.ops.segment_sum(g, rows, num_segments=table.shape[0])
    return d_table.astype(table.dtype), None, None


sorted_gather.defvjp(_sorted_gather_fwd, _sorted_gather_bwd)


# --------------------------------------------------------------------------
# Plan-driven gather entry points (used by ops.rspmm)
# --------------------------------------------------------------------------

def pack_table(X: jnp.ndarray, k: int, padded_rows: int) -> jnp.ndarray:
    """Pack a (n, d) table into (padded_rows, 128): ``k`` consecutive
    logical rows per 128-lane line, each padded to ``128 // k`` lanes."""
    n, d = X.shape
    sub = 128 // k
    Xp = jnp.pad(X, ((0, padded_rows * k - n), (0, sub - d)))
    return Xp.reshape(padded_rows, 128)


def _tbl_idx_for(table_rows: int, plan: DevicePlan) -> jnp.ndarray:
    """A table covering all relations (rows == R * padded_rows) is indexed
    ``rel * nb + dst_block``; a per-node table ignores the relation."""
    if table_rows == plan.padded_rows:
        return plan.block_tbl
    return plan.block_rel * plan.n_tbl_blocks + plan.block_tbl


def planned_gather_packed(table: jnp.ndarray, plan: DevicePlan,
                          out_cols: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Gather packed 128-lane rows, select the per-edge sub-row, scale by
    norm. ``table``: (T, 128) with T ``plan.padded_rows`` or a multiple.
    Returns (E_pad, out_cols) messages."""
    k = plan.k
    sub = 128 // k
    G = sorted_gather(table, plan.local, _tbl_idx_for(table.shape[0], plan),
                      plan.row_block, plan.edge_block, interpret)
    if k == 1:
        return G[:, :out_cols] * plan.norm[:, None]
    sel = jax.nn.one_hot(plan.dst_mod, k, dtype=G.dtype)
    msgs = jnp.einsum("ek,eks->es", sel,
                      G.reshape(-1, k, sub)[:, :, :out_cols])
    return msgs * plan.norm[:, None]


def planned_gather_mixed(table: jnp.ndarray, w: jnp.ndarray,
                         plan: DevicePlan, J: int, sub: int, out_cols: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Gather (J*sub)-wide rows and mix with per-edge weights ``w``
    (E_pad, J) — the planned fused-basis path (norm folded into ``w``)."""
    G = sorted_gather(table, plan.local, _tbl_idx_for(table.shape[0], plan),
                      plan.row_block, plan.edge_block, interpret)
    if J == 1:
        return G[:, :out_cols] * w
    return jnp.einsum("ej,ejs->es", w,
                      G.reshape(-1, J, sub)[:, :, :out_cols])


def plans_for_widths(src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
                     norm: np.ndarray, num_nodes: int, widths,
                     row_block: int = ROW_BLOCK,
                     edge_block: int = EDGE_BLOCK) -> dict:
    """Build one :class:`DevicePlan` per distinct packing factor needed by
    the given table widths (identity-weight out_dim + dense-layer input
    widths). The plan depends only on k, so layers of equal width share."""
    from mrgcn_tpu.ops.rspmm import packing_factor
    ks = sorted({packing_factor(int(w)) for w in widths})
    return {k: DevicePlan.from_host(build_gather_plan(
        src, dst, rel, norm, num_nodes, k,
        row_block=row_block, edge_block=edge_block)) for k in ks}
