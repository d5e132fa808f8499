"""Sorted-stream Pallas kernels: block gather and block scatter.

Shared machinery for :mod:`mrgcn_tpu.ops.relational` (see that module for
the measured cost model and the stream design). Both kernels exploit the
same host-side preparation: edges sorted so that each ``edge_block``-sized
slab touches exactly ONE ``row_block``-sized slab of the addressed table.

* :func:`sorted_gather` — ``G[e] = table[blk[e//EB]*RB + local[e]]``: the
  kernel drives its own N-deep ring of HBM->VMEM DMAs (one per sub-block,
  overlapped ~8 us round-trip latency) and turns the per-edge row select
  into an exact f32 one-hot matmul on the MXU.
* :func:`sorted_scatter` — the transpose: one-hot matmuls accumulate each
  slab's messages into a VMEM-resident output block, flushed to HBM once
  per distinct (non-decreasing) block id.

Both have XLA fallbacks (bit-identical math) used off-TPU, and custom VJPs
(the transpose of each is the other, on the same plan).

Why kernels at all: XLA's row gather from >16 MB tables runs at ~6 ns/row
and scatter-add at ~16 ns/row on a v5e regardless of sortedness — latency
bound. The block structure turns both into streaming DMA + MXU work.

Reference computation being replaced: the sparse row gather/scatter inside
``A @ [I F] W`` (reference: mrgcn/layers/graph.py:93-95).
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


def _use_pallas() -> bool:
    import os
    force = os.environ.get("MRGCN_FORCE_PALLAS_GATHER")
    if force is not None:
        return force == "1"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def interp_mode() -> bool:
    """True when MRGCN_FORCE_PALLAS_GATHER=1 forces the pallas paths on a
    non-TPU backend — every kernel invocation must then run in interpret
    mode. Model-level call sites (models/rgcn.py, models/encoders.py)
    resolve their ``interpret`` argument through this so a driver-level
    forced run works end-to-end on CPU."""
    import os
    return os.environ.get("MRGCN_FORCE_PALLAS_GATHER") == "1"


# DMA pipeline depth: HBM->VMEM copies have ~8 us round-trip latency on a
# v5e (measured: a 2-slot pipeline bottoms out at ~8.6 us/sub-block,
# benchmarks/micro_planned.py); keep many copies in flight to hide it
N_BUF = 8
# VMEM budgets: per-step output block (the automatic pipeline
# double-buffers it) and the DMA ring of table slabs
_OUT_BYTES_TARGET = 4 << 20
_SLAB_BYTES_TARGET = 4 << 20


def _super_blocks(edge_block: int, L: int) -> int:
    per_sub = edge_block * L * 4
    return max(4, min(64, _OUT_BYTES_TARGET // per_sub))


def _super_blocks_for(edge_block: int, L: int, num_blocks: int) -> int:
    """Largest divisor of ``num_blocks`` not above the bytes-target factor.

    ``_super_blocks`` can return non-power-of-2 values (e.g. L=384 gives
    10) that need not divide a slab count padded to 64 — rounding down to
    a divisor keeps the kernel correct for any stream while staying near
    the VMEM bytes target."""
    target = _super_blocks(edge_block, L)
    sb = min(target, num_blocks)
    while sb > 1 and num_blocks % sb:
        sb -= 1
    return sb


def _ring_depth(row_block: int, L: int, itemsize: int) -> int:
    per_slab = row_block * L * itemsize
    return max(2, min(N_BUF, _SLAB_BYTES_TARGET // per_slab))


def _gather_kernel(tbl_ref, local_ref, table_hbm, out_ref, slab, sems, *,
                   row_block: int, edge_block: int, super_blocks: int,
                   n_buf: int):
    """One grid step = ``super_blocks`` sub-blocks of ``edge_block`` edges.

    ``tbl_ref``: scalar-prefetched (n_sub,) table-block index (SMEM);
    ``local_ref``: (1, 8, SUPER*EB) within-block row per edge;
    ``table_hbm``: full (T, L) table left in HBM — the kernel DMAs the
    ``row_block``-row slab each sub-block needs into an ``N_BUF``-deep
    ring of VMEM buffers, keeping enough copies in flight to hide the
    HBM round-trip while the MXU runs the one-hot row select.
    """
    s = pl.program_id(0)
    base = s * super_blocks

    def dma(j):
        idx = tbl_ref[base + j]
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(idx * row_block, row_block), :],
            slab.at[j % n_buf], sems.at[j % n_buf])

    for j in range(min(n_buf - 1, super_blocks)):
        dma(j).start()
    for j in range(super_blocks):
        if j + n_buf - 1 < super_blocks:
            dma(j + n_buf - 1).start()
        dma(j).wait()
        lo = local_ref[0, 0:1, j * edge_block:(j + 1) * edge_block]
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, edge_block), 0)
        onehot_t = (riota == lo).astype(slab.dtype)       # (RB, EB)
        out_ref[j * edge_block:(j + 1) * edge_block, :] = \
            jax.lax.dot_general(
                onehot_t, slab[j % n_buf], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)


def _pallas_gather(table, local, tbl_idx, *, row_block, edge_block,
                   interpret=False):
    num_blocks = local.shape[0]
    L = table.shape[1]
    super_blocks = _super_blocks(edge_block, L)
    n_buf = _ring_depth(row_block, L, table.dtype.itemsize)

    # pad the sub-block stream to a whole number of super steps; padding
    # sub-blocks read table block 0 and match no rows (local == row_block)
    n_super = -(-num_blocks // super_blocks)
    pad = n_super * super_blocks - num_blocks
    if pad:
        local = jnp.concatenate(
            [local, jnp.full((pad, edge_block), row_block, local.dtype)])
        tbl_idx = jnp.concatenate(
            [tbl_idx, jnp.zeros((pad,), tbl_idx.dtype)])

    # (n_super, 8, SUPER*EB): index rows replicated across 8 sublanes for
    # the (8, 128) tile rule
    local3 = jnp.broadcast_to(
        local.reshape(n_super, 1, super_blocks * edge_block),
        (n_super, 8, super_blocks * edge_block))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((1, 8, super_blocks * edge_block),
                         lambda i, tb: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec((super_blocks * edge_block, L),
                               lambda i, tb: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_buf, row_block, L), table.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out = pl.pallas_call(
        partial(_gather_kernel, row_block=row_block,
                edge_block=edge_block, super_blocks=super_blocks,
                n_buf=n_buf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super * super_blocks * edge_block, L), jnp.float32),
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

# --------------------------------------------------------------------------
# Sorted block-scatter: the transpose twin of sorted_gather
# --------------------------------------------------------------------------

def _scatter_kernel(outblk_ref, local_ref, msgs_ref, out_hbm, acc, sems,
                    cnt, pblk, *,
                    row_block: int, edge_block: int, super_blocks: int,
                    n_sub: int):
    """Accumulate ``out[outblk*RB + local] += msgs`` for a stream whose
    output-block ids are NON-DECREASING: each sub-block's contribution is an
    MXU one-hot matmul into a double-buffered VMEM accumulator, flushed to
    HBM by async DMA when the block id changes."""
    s = pl.program_id(0)
    base = s * super_blocks
    L = acc.shape[-1]
    zero_blk = jnp.zeros((row_block, L), jnp.float32)

    @pl.when(s == 0)
    def _():
        acc[0] = zero_blk
        acc[1] = zero_blk
        cnt[0] = 0

    for j in range(super_blocks):
        g = base + j
        cur = cnt[0] % 2
        lo = local_ref[0, 0:1, j * edge_block:(j + 1) * edge_block]
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, edge_block), 0)
        onehot = (riota == lo).astype(msgs_ref.dtype)     # (RB, EB)
        contrib = jax.lax.dot_general(
            onehot, msgs_ref[0, j * edge_block:(j + 1) * edge_block, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (RB, L)
        acc[cur] += contrib

        is_last = g == n_sub - 1
        nxt = jnp.minimum(g + 1, n_sub - 1)
        changes = jnp.logical_or(is_last, outblk_ref[nxt] != outblk_ref[g])

        @pl.when(changes)
        def _():
            # double-buffered flush: start this buffer's DMA, then switch
            # to the other buffer, waiting out ITS previous DMA (streams
            # like the relation-major backward flush nearly every slab —
            # a synchronous wait per flush serialises ~us-scale latency
            # thousands of times)
            c = cnt[0]
            slot = c % 2
            other = 1 - slot
            pltpu.make_async_copy(
                acc.at[slot],
                out_hbm.at[pl.ds(outblk_ref[g] * row_block, row_block), :],
                sems.at[slot]).start()
            pblk[slot] = outblk_ref[g]

            @pl.when(c >= 1)
            def _():
                pltpu.make_async_copy(
                    acc.at[other],
                    out_hbm.at[pl.ds(pblk[other] * row_block, row_block),
                               :],
                    sems.at[other]).wait()
            acc[other] = zero_blk
            cnt[0] = c + 1

        @pl.when(is_last)
        def _():
            # drain the final flush (its partner was drained at start)
            c = cnt[0]
            last = (c - 1) % 2
            pltpu.make_async_copy(
                acc.at[last],
                out_hbm.at[pl.ds(pblk[last] * row_block, row_block), :],
                sems.at[last]).wait()


def _pallas_scatter(msgs, local, out_blk, out_rows, *, row_block,
                    edge_block, interpret=False):
    num_blocks = local.shape[0]
    L = msgs.shape[1]
    super_blocks = _super_blocks(edge_block, L)

    n_super = -(-num_blocks // super_blocks)
    pad = n_super * super_blocks - num_blocks
    if pad:
        local = jnp.concatenate(
            [local, jnp.full((pad, edge_block), row_block, local.dtype)])
        # padding sub-blocks keep the LAST block id so monotonicity and the
        # final flush stay correct
        out_blk = jnp.concatenate(
            [out_blk, jnp.broadcast_to(out_blk[-1:], (pad,))])
        msgs = jnp.concatenate(
            [msgs, jnp.zeros((pad * edge_block, L), msgs.dtype)])

    local3 = jnp.broadcast_to(
        local.reshape(n_super, 1, super_blocks * edge_block),
        (n_super, 8, super_blocks * edge_block))
    msgs3 = msgs.reshape(n_super, super_blocks * edge_block, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((1, 8, super_blocks * edge_block),
                         lambda i, ob: (i, 0, 0)),
            pl.BlockSpec((1, super_blocks * edge_block, L),
                         lambda i, ob: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, row_block, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = partial(_scatter_kernel, row_block=row_block,
                     edge_block=edge_block, super_blocks=super_blocks,
                     n_sub=n_super * super_blocks)

    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, L), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(out_blk, local3, msgs3)
    # blocks never visited hold uninitialised memory — zero them
    nblk_out = out_rows // row_block
    covered = jnp.zeros(nblk_out, dtype=bool).at[out_blk].set(
        True, mode="drop")
    mask = jnp.repeat(covered, row_block)
    return jnp.where(mask[:, None], out, 0.0)


def _scatter_dot_kernel(outblk_ref, local_ref, w_ref, dvn_ref, table_hbm,
                        out_hbm, dots_ref, acc, sems, cnt, pblk, tbl,
                        tsem, tblk_id, *, row_block: int, edge_block: int,
                        super_blocks: int, n_sub: int):
    """The scatter kernel fused with the same-address table dot:
    per edge, ``out[blk*RB + local] += w * dvn`` AND
    ``dots = <table[blk*RB + local], dvn>`` — ONE pass over the stream
    instead of a scatter pass plus a row-gather pass. ``table`` blocks
    are DMA'd on block change (the stream's block ids are
    non-decreasing, so each table block loads once)."""
    s = pl.program_id(0)
    base = s * super_blocks
    L = acc.shape[-1]
    zero_blk = jnp.zeros((row_block, L), jnp.float32)

    @pl.when(s == 0)
    def _():
        acc[0] = zero_blk
        acc[1] = zero_blk
        cnt[0] = 0
        tblk_id[0] = -1

    for j in range(super_blocks):
        g = base + j
        blk = outblk_ref[g]

        @pl.when(blk != tblk_id[0])
        def _():
            copy = pltpu.make_async_copy(
                table_hbm.at[pl.ds(blk * row_block, row_block), :],
                tbl, tsem)
            copy.start()
            copy.wait()
            tblk_id[0] = blk

        cur = cnt[0] % 2
        lo = local_ref[0, 0:1, j * edge_block:(j + 1) * edge_block]
        wv = w_ref[0, 0:1, j * edge_block:(j + 1) * edge_block]
        dvn = dvn_ref[0, j * edge_block:(j + 1) * edge_block, :]
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (row_block, edge_block), 0)
        onehot = (riota == lo).astype(jnp.float32)        # (RB, EB)
        contrib = jax.lax.dot_general(
            onehot * wv, dvn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (RB, L)
        acc[cur] += contrib

        # same-address table rows per edge + lane dot
        gathered = jax.lax.dot_general(
            onehot, tbl[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (EB, L)
        d = jnp.sum(gathered * dvn, axis=1)            # (EB,)
        # dots block is (1, 8, SB*EB) — 8 sublanes to satisfy the TPU
        # tile constraint; all rows carry the same values, row 0 is read
        dots_ref[0, :, pl.ds(j * edge_block, edge_block)] = \
            jnp.broadcast_to(d[None, :], (8, edge_block))

        is_last = g == n_sub - 1
        nxt = jnp.minimum(g + 1, n_sub - 1)
        changes = jnp.logical_or(is_last, outblk_ref[nxt] != outblk_ref[g])

        @pl.when(changes)
        def _():
            c = cnt[0]
            slot = c % 2
            other = 1 - slot
            pltpu.make_async_copy(
                acc.at[slot],
                out_hbm.at[pl.ds(outblk_ref[g] * row_block, row_block), :],
                sems.at[slot]).start()
            pblk[slot] = outblk_ref[g]

            @pl.when(c >= 1)
            def _():
                pltpu.make_async_copy(
                    acc.at[other],
                    out_hbm.at[pl.ds(pblk[other] * row_block, row_block),
                               :],
                    sems.at[other]).wait()
            acc[other] = zero_blk
            cnt[0] = c + 1

        @pl.when(is_last)
        def _():
            c = cnt[0]
            last = (c - 1) % 2
            pltpu.make_async_copy(
                acc.at[last],
                out_hbm.at[pl.ds(pblk[last] * row_block, row_block), :],
                sems.at[last]).wait()


def _pallas_scatter_dot(dvn, w, local, out_blk, table, out_rows, *,
                        row_block, edge_block, interpret=False):
    num_blocks = local.shape[0]
    L = dvn.shape[1]
    super_blocks = _super_blocks(edge_block, L)

    n_super = -(-num_blocks // super_blocks)
    pad = n_super * super_blocks - num_blocks
    E_in = dvn.shape[0]
    if pad:
        local = jnp.concatenate(
            [local, jnp.full((pad, edge_block), row_block, local.dtype)])
        out_blk = jnp.concatenate(
            [out_blk, jnp.broadcast_to(out_blk[-1:], (pad,))])
        dvn = jnp.concatenate(
            [dvn, jnp.zeros((pad * edge_block, L), dvn.dtype)])
        w = jnp.concatenate(
            [w, jnp.zeros((pad * edge_block,), w.dtype)])

    local3 = jnp.broadcast_to(
        local.reshape(n_super, 1, super_blocks * edge_block),
        (n_super, 8, super_blocks * edge_block))
    w3 = jnp.broadcast_to(
        w.astype(jnp.float32).reshape(n_super, 1,
                                      super_blocks * edge_block),
        (n_super, 8, super_blocks * edge_block))
    dvn3 = dvn.astype(jnp.float32).reshape(
        n_super, super_blocks * edge_block, L)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((1, 8, super_blocks * edge_block),
                         lambda i, ob: (i, 0, 0)),
            pl.BlockSpec((1, 8, super_blocks * edge_block),
                         lambda i, ob: (i, 0, 0)),
            pl.BlockSpec((1, super_blocks * edge_block, L),
                         lambda i, ob: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((1, 8, super_blocks * edge_block),
                                lambda i, ob: (i, 0, 0))),
        scratch_shapes=[
            pltpu.VMEM((2, row_block, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((row_block, L), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = partial(_scatter_dot_kernel, row_block=row_block,
                     edge_block=edge_block, super_blocks=super_blocks,
                     n_sub=n_super * super_blocks)

    out, dots = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((out_rows, L), jnp.float32),
                   jax.ShapeDtypeStruct(
                       (n_super, 8, super_blocks * edge_block),
                       jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(out_blk, local3, w3, dvn3, jnp.asarray(table, jnp.float32))
    # blocks never visited hold uninitialised memory — zero them
    nblk_out = out_rows // row_block
    covered = jnp.zeros(nblk_out, dtype=bool).at[out_blk].set(
        True, mode="drop")
    mask = jnp.repeat(covered, row_block)
    return (jnp.where(mask[:, None], out, 0.0),
            dots[:, 0, :].reshape(-1)[:E_in])


def fused_scatter_dot(dvn: jnp.ndarray, w: jnp.ndarray,
                      local: jnp.ndarray, out_blk: jnp.ndarray,
                      table: jnp.ndarray, out_rows: int, row_block: int,
                      edge_block: int, interpret: bool = False):
    """``out[blk*RB + local_e] += w_e * dvn_e`` AND
    ``dots_e = <table[blk*RB + local_e], dvn_e>`` in one stream pass —
    the featureless-basis backward's d_packed scatter and d_comp gather
    visit the SAME rows, so fusing them removes a full per-edge gather
    pass per basis (the d_comp side of relational._featureless_basis_bwd
    behind MRGCN_FUSED_BASIS_BWD=1). Padding edges (``local ==
    row_block``) contribute nothing and read zero."""
    if _use_pallas():
        return _pallas_scatter_dot(dvn, w, local, out_blk, table,
                                   out_rows, row_block=row_block,
                                   edge_block=edge_block,
                                   interpret=interpret)
    msgs = dvn * w[:, None]
    out = _xla_scatter(msgs, local, out_blk, out_rows,
                       row_block=row_block, edge_block=edge_block)
    rows = (out_blk[:, None] * row_block + local).reshape(-1)
    valid = (local.reshape(-1) < row_block)[:dvn.shape[0]]
    safe = jnp.where(valid, rows[:dvn.shape[0]], 0)
    gathered = table[safe]
    dots = jnp.sum(gathered * dvn, axis=1) * valid
    return out, dots


def _xla_scatter(msgs, local, out_blk, out_rows, *, row_block, edge_block):
    eb = edge_block
    rows = (out_blk[:, None] * row_block + local).reshape(-1)
    safe = jnp.where(local.reshape(-1) < row_block, rows, out_rows)
    return jax.ops.segment_sum(msgs, safe, num_segments=out_rows)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def sorted_scatter(msgs: jnp.ndarray, local: jnp.ndarray,
                   out_blk: jnp.ndarray, out_rows: int, row_block: int,
                   edge_block: int, interpret: bool = False) -> jnp.ndarray:
    """``out[out_blk[e//EB]*RB + local[e]] += msgs[e]`` where the per-slab
    output-block ids are non-decreasing (src-sorted stream). ``local ==
    row_block`` marks padding (no one-hot match). Returns (out_rows, L)."""
    if _use_pallas():
        return _pallas_scatter(msgs, local, out_blk, out_rows,
                               row_block=row_block, edge_block=edge_block,
                               interpret=interpret)
    return _xla_scatter(msgs, local, out_blk, out_rows,
                        row_block=row_block, edge_block=edge_block)


def _sorted_scatter_fwd(msgs, local, out_blk, out_rows, row_block,
                        edge_block, interpret):
    out = sorted_scatter(msgs, local, out_blk, out_rows, row_block,
                         edge_block, interpret)
    return out, (local, out_blk)


def _sorted_scatter_bwd(out_rows, row_block, edge_block, interpret, res, g):
    local, out_blk = res
    # transpose of scatter-add = gather; the stream is sorted by output
    # block, so the gather is block-structured: reuse the fast kernel
    d_msgs = sorted_gather(g, local, out_blk, row_block, edge_block,
                           interpret)
    return d_msgs, None, None


sorted_scatter.defvjp(_sorted_scatter_fwd, _sorted_scatter_bwd)


# --------------------------------------------------------------------------
# Single-pass compose gradient: d_comp and d_packed from ONE read of d_t
# --------------------------------------------------------------------------

def _compose_grad_kernel(dt_ref, pk_ref, comp_ref, dcomp_ref, dp_ref, *,
                         rc: int):
    """Per grid step: one (R, rc, L) chunk of the relation-major d_table.

    For every packed row j in the chunk (static unroll):
      * ``d_comp += dot(d_t[:, j, :], packed[:, j, :]^T)``  — (R, B)
      * ``d_packed[:, j, :] = dot(comp^T, d_t[:, j, :])``   — (B, L)
    Both are MXU 2-D dots; the revisited d_comp block accumulates in VMEM
    and is flushed once at the end of the grid.
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        dcomp_ref[:] = jnp.zeros_like(dcomp_ref)

    acc = dcomp_ref[:]
    for j in range(rc):
        dt_row = dt_ref[:, j, :]                           # (R, L)
        acc += jax.lax.dot_general(
            dt_row, pk_ref[:, j, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (R, B)
        dp_ref[:, j, :] = jax.lax.dot_general(
            comp_ref[:], dt_row, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (B, L)
    dcomp_ref[:] = acc


def compose_grad_pass(d_t: jnp.ndarray, packed: jnp.ndarray,
                      comp: jnp.ndarray, R: int, B: int,
                      interpret: bool = False):
    """Backward of the relation-major compose in ONE pass over ``d_t``.

    Computes ``d_comp = einsum('rql,bql->rb', d_t, packed)`` and
    ``d_packed = einsum('rb,rql->bql', comp, d_t)`` reading the
    (R*rows, L) cotangent table once — the XLA pair of dot_generals
    (rspmm._compose_packed_bwd) streams it twice, and at bench scale the
    table is the largest tensor in the step (~793 MB).

    ``d_t``: (R*rows, L); ``packed``: (B*rows, L); ``comp``: (R, B).
    Returns ``(d_comp (R, B), d_packed (B*rows, L))``. The 3-D views are
    free bitcasts of the 2-D inputs because rows is a multiple of the
    (8, 128) tile height.
    """
    rows = d_t.shape[0] // R
    L = d_t.shape[1]
    if not (_use_pallas() or interpret) or rows % 8:
        d_comp = jax.lax.dot_general(
            d_t.reshape(R, rows, L), packed.reshape(B, rows, L),
            (((1, 2), (1, 2)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d_packed = jax.lax.dot_general(
            comp, d_t.reshape(R, rows, L), (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return d_comp, d_packed.reshape(B * rows, L)

    rc = 32
    while rows % rc:
        rc //= 2

    grid_spec = pl.GridSpec(
        grid=(rows // rc,),
        in_specs=[
            pl.BlockSpec((R, rc, L), lambda c: (0, c, 0)),
            pl.BlockSpec((B, rc, L), lambda c: (0, c, 0)),
            pl.BlockSpec((R, B), lambda c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((R, B), lambda c: (0, 0)),
            pl.BlockSpec((B, rc, L), lambda c: (0, c, 0)),
        ],
    )
    d_comp, d_packed = pl.pallas_call(
        partial(_compose_grad_kernel, rc=rc),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, B), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, L), jnp.float32),
        ],
        interpret=interpret,
    )(d_t.reshape(R, rows, L), packed.reshape(B, rows, L), comp)
    return d_comp, d_packed.reshape(B * rows, L)


# --------------------------------------------------------------------------
# Fused place-scatter: select sub-row + norm + sub-row placement + scatter
# in one kernel (no (E, L) intermediates through HBM)
# --------------------------------------------------------------------------

def _fused_place_kernel(out_blk_ref, local_ref, v_ref, out_hbm, acc,
                        sems, *, row_block: int, edge_block: int,
                        super_blocks: int, n_sub: int, k: int, L: int,
                        sub_v: int):
    """Per sub-block: per-edge values arrive as ``[v | norm | place]``
    lanes (``sub_v`` value lanes + 2 scalar lanes) so the per-edge
    scalars sit on the SUBLANE axis without any transpose (Mosaic rejects
    lane<->sublane shape casts). Scale by norm, place the value lanes at
    slot ``place`` of a (EB, L) line via static lane rolls + aligned
    selects, and accumulate via one one-hot MXU matmul into the
    VMEM-resident output block (same flush discipline as
    ``_scatter_kernel``)."""
    s = pl.program_id(0)
    base = s * super_blocks
    eb = edge_block
    sub = L // k

    @pl.when(s == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for j in range(super_blocks):
        g = base + j
        vr = v_ref[0, j * eb:(j + 1) * eb, :]              # (EB, sub_v+2)
        v = vr[:, :sub_v]
        nw = vr[:, sub_v:sub_v + 1]                        # (EB, 1)
        plc = vr[:, sub_v + 1:sub_v + 2]                   # (EB, 1)

        vn = v * nw
        if k > 1:
            base_line = jnp.pad(vn, ((0, 0), (0, L - sub_v)))
            lines = jnp.zeros((eb, L), jnp.float32)
            for ko in range(k):
                rolled = base_line if ko == 0 else \
                    pltpu.roll(base_line, ko * sub, 1)
                lines = jnp.where(plc == float(ko), rolled, lines)
        else:
            lines = jnp.pad(vn, ((0, 0), (0, L - sub_v))) \
                if sub_v < L else vn

        lo = local_ref[0, 0:1, j * eb:(j + 1) * eb]
        rio = jax.lax.broadcasted_iota(jnp.int32, (row_block, eb), 0)
        onehot = (rio == lo).astype(jnp.float32)           # (RB, EB)
        acc[:] += jax.lax.dot_general(
            onehot, lines, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        is_last = g == n_sub - 1
        nxt = jnp.minimum(g + 1, n_sub - 1)
        changes = jnp.logical_or(is_last,
                                 out_blk_ref[nxt] != out_blk_ref[g])

        @pl.when(changes)
        def _():
            cp = pltpu.make_async_copy(
                acc,
                out_hbm.at[pl.ds(out_blk_ref[g] * row_block, row_block),
                           :],
                sems)
            cp.start()
            cp.wait()
            acc[:] = jnp.zeros_like(acc)


def fused_place_scatter(V: jnp.ndarray, place_mod: jnp.ndarray,
                        norm: jnp.ndarray, local: jnp.ndarray,
                        out_blk: jnp.ndarray, out_rows: int, k: int,
                        L: int, row_block: int, edge_block: int,
                        interpret: bool = False) -> jnp.ndarray:
    """``out[out_blk*RB + local] += place(norm * V, place_mod)`` in one
    pass: per-edge values land at lane slot ``place_mod`` of a packed
    (out_rows, L) table. Requires the slab count to divide the
    super-block factor (plans pre-pad; see relational._segment_layout).

    ``V``: (E_pad, Lv) logical sub-rows (Lv <= L // k lanes meaningful);
    ``local``: (nslab, EB); ``place_mod``/``norm``: (E_pad,).
    """
    num_blocks = local.shape[0]
    super_blocks = _super_blocks_for(edge_block, L, num_blocks)
    n_super = num_blocks // super_blocks
    sub_v = V.shape[1]

    # per-edge scalars ride as extra lanes of V so they arrive on the
    # sublane axis (see kernel docstring); f32 is exact for both
    packed = jnp.concatenate(
        [V.astype(jnp.float32), norm.astype(jnp.float32)[:, None],
         place_mod.astype(jnp.float32)[:, None]], axis=1)

    local3 = jnp.broadcast_to(
        local.reshape(n_super, 1, super_blocks * edge_block),
        (n_super, 8, super_blocks * edge_block))
    v3 = packed.reshape(n_super, super_blocks * edge_block, sub_v + 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((1, 8, super_blocks * edge_block),
                         lambda i, ob: (i, 0, 0)),
            pl.BlockSpec((1, super_blocks * edge_block, sub_v + 2),
                         lambda i, ob: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((row_block, L), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = partial(_fused_place_kernel, row_block=row_block,
                     edge_block=edge_block, super_blocks=super_blocks,
                     n_sub=num_blocks, k=k, L=L, sub_v=sub_v)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, L), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(out_blk, local3, v3)
    nblk_out = out_rows // row_block
    covered = jnp.zeros(nblk_out, dtype=bool).at[out_blk].set(
        True, mode="drop")
    mask = jnp.repeat(covered, row_block)
    return jnp.where(mask[:, None], out, 0.0)
