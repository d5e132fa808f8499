"""Relational sparse-dense products for R-GCN layers.

The reference computes ``A @ [I F] W`` with one giant sparse matmul against
the hstacked ``n x (R*n)`` adjacency (reference: mrgcn/layers/graph.py:62-102).
On TPU we express the same contraction over a relation-partitioned COO edge
list ``(src, dst, rel, norm)``:

    out[s] = sum_e 1[src_e == s] * norm_e * (H[dst_e] @ W[rel_e])

with basis decomposition ``W[r] = sum_b comp[r, b] * basis[b]``
(reference: layers/graph.py:69-72, 84-85).

Execution strategies (chosen by static padded sizes; measured on v5e —
see benchmarks/micro_scan.py):

  * **direct**: precompute ``HW = einsum('ni,rio->rno', H, W)`` — one big MXU
    matmul — then one flat gather from ``(R*n, out)`` (the TPU analogue of
    the reference's hstack trick) + one segment-sum. Used when the padded
    ``(R*n, out)`` buffer fits the budget.
  * **fused-basis ("bigmat")**: build ``flat = (n, B*out)`` (one matmul, or a
    transpose for the identity weights), gather all bases per edge in one
    shot, contract with the per-edge mixing weights ``comp[rel]*norm`` on the
    VPU, one segment-sum. 13x faster than a per-basis scan on v5e. When the
    ``(E, B*out)`` message buffer exceeds the budget, edges are processed in
    rematerialised chunks under ``lax.scan``.

All paths are jit-compatible, statically shaped, differentiable; padding
edges (``norm == 0``, out-of-range ``src``) contribute nothing.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# budgets in *padded* f32 elements; TPU tiles f32 as (8, 128) so a minor dim
# of e.g. 14 occupies 128 lanes
DIRECT_BUDGET_ELEMS = 2 ** 27   # 512 MiB for the (R*n, out) buffer
MESSAGE_BUDGET_ELEMS = 2 ** 28  # 1 GiB for the (E, B*out) gather buffer


def _gather_dtype():
    """MRGCN_BF16_GATHER=1 halves the fused-path gather traffic by casting
    the flat buffer to bfloat16 (f32 accumulation)."""
    return jnp.bfloat16 if os.environ.get("MRGCN_BF16_GATHER") == "1" \
        else None


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _padded_elems(rows: int, minor: int) -> int:
    pad_rows = -(-rows // 8) * 8
    return pad_rows * _pad128(minor)


def segment_sum(messages: jnp.ndarray, src: jnp.ndarray,
                num_nodes: int) -> jnp.ndarray:
    return jax.ops.segment_sum(messages, src, num_segments=num_nodes)


def _fused_basis_aggregate(flat: jnp.ndarray, src: jnp.ndarray,
                           dst: jnp.ndarray, rel: jnp.ndarray,
                           norm: jnp.ndarray, comp: jnp.ndarray,
                           num_nodes: int, out_dim: int,
                           budget_elems: int,
                           gather_dtype=None) -> jnp.ndarray:
    """``out[s] = Σ_e Σ_b (comp[rel_e,b] norm_e) flat[dst_e, b*out:(b+1)*out]``.

    ``flat``: (n_cols, B*out). Chunks the edge dimension when the (E, B*out)
    gather exceeds the budget; chunk bodies are rematerialised so backward
    re-gathers instead of storing stacked messages. ``gather_dtype=bfloat16``
    halves the gather traffic (accumulation stays f32).
    """
    E = src.shape[0]
    B = comp.shape[1]
    if gather_dtype is not None:
        flat = flat.astype(gather_dtype)

    def chunk_messages(dst_c, rel_c, norm_c):
        g = flat[dst_c].reshape(-1, B, out_dim)         # (C, B, out)
        w = (comp[rel_c] * norm_c[:, None]).astype(flat.dtype)  # (C, B)
        return jnp.einsum("eb,ebo->eo", w, g,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)   # (C, out)

    per_edge = _pad128(B * out_dim)
    chunk = max(8, budget_elems // per_edge)
    if E <= chunk:
        return segment_sum(chunk_messages(dst, rel, norm), src, num_nodes)

    num_chunks = -(-E // chunk)
    pad = num_chunks * chunk - E
    # padded edges: zero weight, out-of-range src (dropped by segment_sum)
    src_p = jnp.pad(src, (0, pad), constant_values=num_nodes)
    dst_p = jnp.pad(dst, (0, pad))
    rel_p = jnp.pad(rel, (0, pad))
    norm_p = jnp.pad(norm, (0, pad))

    def reshape(a):
        return a.reshape(num_chunks, chunk)

    @jax.checkpoint
    def body(acc, op):
        src_c, dst_c, rel_c, norm_c = op
        msgs = chunk_messages(dst_c, rel_c, norm_c)
        return acc + segment_sum(msgs, src_c, num_nodes), None

    init = jnp.zeros((num_nodes, out_dim), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, init, (reshape(src_p), reshape(dst_p),
                                       reshape(rel_p), reshape(norm_p)))
    return acc


def transform_aggregate(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                        rel: jnp.ndarray, norm: jnp.ndarray, num_nodes: int,
                        basis: jnp.ndarray,
                        comp: Optional[jnp.ndarray] = None,
                        budget_elems: int = DIRECT_BUDGET_ELEMS,
                        message_budget_elems: int = MESSAGE_BUDGET_ELEMS
                        ) -> jnp.ndarray:
    """Dense-feature R-GCN aggregation:
    ``out[s] = Σ_e norm_e H[dst_e] W[rel_e]``.

    ``H``: (n_cols, in); ``basis``: (B, in, out); ``comp``: (R, B) or None
    (then B == R and relations index the basis directly).
    Returns (num_nodes, out).
    """
    n_cols = H.shape[0]
    B, _, out_dim = basis.shape
    R = B if comp is None else comp.shape[0]

    if comp is None and _padded_elems(R * n_cols, out_dim) <= budget_elems:
        HW = jnp.einsum("ni,rio->rno", H, basis,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        HW_flat = HW.reshape(R * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = HW_flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    # fused-basis path: flat = H @ basis laid out (n, B*out)
    flat = jnp.einsum("ni,bio->nbo", H, basis,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    flat = flat.reshape(n_cols, B * out_dim)
    comp_eff = jnp.eye(B, dtype=H.dtype) if comp is None else comp
    return _fused_basis_aggregate(flat, src, dst, rel, norm, comp_eff,
                                  num_nodes, out_dim, message_budget_elems,
                                  gather_dtype=_gather_dtype())


def transform_aggregate_grouped(H: jnp.ndarray, grp_src: jnp.ndarray,
                                grp_dst: jnp.ndarray, grp_norm: jnp.ndarray,
                                group_rel: jnp.ndarray, group_size: int,
                                num_nodes: int, basis: jnp.ndarray,
                                comp: Optional[jnp.ndarray] = None
                                ) -> jnp.ndarray:
    """Relation-grouped dense aggregation — the fast path for rel_const-less
    feature layers without basis decomposition (basis-decomposed wide
    layers default to ops/relational.dense_basis_hybrid, which keeps this
    formulation for the backward and the sorted-stream forward — measured
    v5e A/B in benchmarks/tpu_batch_r4a.py).

    Edges are pre-sorted by relation and padded so each consecutive group of
    ``group_size`` edges shares a relation (see
    :func:`mrgcn_tpu.encodings.structure.group_by_relation`). Per group the
    gathered inputs ``(group_size, in)`` hit the MXU against the group's
    composed weight ``(in, out)`` as one batched matmul; total gather traffic
    is ``E * in`` bytes versus the fused path's ``E * B * out`` —
    40x less on a DMG-scale layer (benchmarks/micro_r2_prims.py).
    """
    W = _compose_weights(basis, comp)          # (R, in, out) — always small
    G = group_rel.shape[0]
    in_dim = H.shape[-1]
    out_dim = W.shape[-1]

    Hg = H[grp_dst].reshape(G, group_size, in_dim)
    Wg = W[group_rel]                          # (G, in, out)
    m = jax.lax.dot_general(
        Hg, Wg, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)     # (G, group_size, out)
    messages = m.reshape(G * group_size, out_dim) * grp_norm[:, None]
    return segment_sum(messages, grp_src, num_nodes)


@jax.custom_vjp
def compose_packed(comp: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """Identity-table compose in the packed layout:
    ``(R, B) x (B, rows, L) -> (R, rows, L)``.

    The 3-D tensordot output is relation-major, so the downstream
    ``(R * rows, L)`` view is a free bitcast. The 2-D formulation
    ``dot(comp, packed.reshape(B, -1))`` interleaves R into 8-sublane
    tiles: XLA then inserts a physical re-tile of the full table plus a
    strided operand copy (~10 ms at bench scale on a v5e —
    benchmarks/micro_compose_2d.py). The custom vjp exists because XLA
    lowers the einsum autodiff's d_comp (a contraction over the huge
    rows*lanes dims) catastrophically; the explicit dot_generals below
    measure ~4 ms each (benchmarks/micro_compose_vjp.py).
    """
    return jnp.tensordot(comp, packed, axes=[[1], [0]],
                         precision=jax.lax.Precision.HIGHEST)


def _compose_packed_fwd(comp, packed):
    return compose_packed(comp, packed), (comp, packed)


def _compose_packed_bwd(res, d_t):
    comp, packed = res
    d_comp = jax.lax.dot_general(
        d_t, packed, (((1, 2), (1, 2)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    d_packed = jax.lax.dot_general(
        comp, d_t, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return d_comp.astype(comp.dtype), d_packed.astype(packed.dtype)


compose_packed.defvjp(_compose_packed_fwd, _compose_packed_bwd)


def _compose_weights(basis: jnp.ndarray,
                     comp: Optional[jnp.ndarray]) -> jnp.ndarray:
    """``W[r] = sum_b comp[r,b] basis[b]`` (reference: graph.py:84-85)."""
    if comp is None:
        return basis
    return jnp.einsum("rb,bio->rio", comp, basis,
                      precision=jax.lax.Precision.HIGHEST)


def packing_factor(out_dim: int) -> int:
    """How many logical weight rows fit one 128-lane row. TPU pads the minor
    dimension to 128 lanes, so an identity weight with out=16 wastes 8x HBM
    (and 8x optimizer traffic) unless rows are packed. Returns 1 when
    packing isn't worthwhile (out > 64)."""
    out_p = 1
    while out_p < out_dim:
        out_p *= 2
    return 128 // out_p if out_p <= 64 else 1


def packed_identity_shape(S: int, num_nodes: int, out_dim: int,
                          row_multiple: int = 512):
    """Parameter shape for a packed identity weight: (S, rows, lanes)
    holding k consecutive node rows (each padded to lanes/k) per lane-row.

    Rows are rounded up to ``row_multiple`` (the sorted-stream engine's
    table block size) and lanes to 128 so the training step NEVER pads the
    weight in-program — an in-jit ``jnp.pad`` of this 0.25 GB tensor
    measured at >1 s/step on a v5e (XLA lowers the pad + backward-slice
    pair catastrophically). Padding slots are zero-initialised
    (models/init.packed_xavier_uniform) and never gathered, so they stay
    exactly zero under L1/L2 and Adam."""
    k = packing_factor(out_dim)
    n_rows = -(-num_nodes // k)
    n_rows = -(-n_rows // row_multiple) * row_multiple
    lanes = 128 if k > 1 else _pad128(out_dim)
    return (S, n_rows, lanes), k


def gather_aggregate_packed(packed: jnp.ndarray, src: jnp.ndarray,
                            dst: jnp.ndarray, rel: jnp.ndarray,
                            norm: jnp.ndarray, num_nodes: int, out_dim: int,
                            k: int, comp: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Featureless aggregation over a packed identity weight.

    ``packed``: (S, n_rows, 128) with logical row ``d`` at
    ``packed[s, d // k, (d % k) * (128 // k) : ...]``. Gathers one 128-lane
    row per edge (k-fold fewer bytes than the padded layout) and selects the
    sub-row with a one-hot contraction on the VPU.
    """
    S, n_rows, _ = packed.shape
    sub = 128 // k

    if comp is not None:
        # compose in the packed layout — minor dim stays 128, no pad
        # waste; see compose_packed for why this is a 3-D tensordot with
        # a custom vjp rather than a 2-D dot or an einsum
        flat = compose_packed(comp, packed)
        R = comp.shape[0]
    else:
        flat = packed
        R = S
    flat = flat.reshape(R * n_rows, 128)

    packed_idx = rel.astype(jnp.int32) * n_rows + dst.astype(jnp.int32) // k
    g = flat[packed_idx].reshape(-1, k, sub)              # (E, k, sub)
    sel = jax.nn.one_hot(dst % k, k, dtype=g.dtype)       # (E, k)
    messages = jnp.einsum("ek,eks->es", sel, g,
                          precision=jax.lax.Precision.HIGHEST)[:, :out_dim]
    return segment_sum(messages * norm[:, None], src, num_nodes)


def gather_aggregate(node_weights: jnp.ndarray, src: jnp.ndarray,
                     dst: jnp.ndarray, rel: jnp.ndarray, norm: jnp.ndarray,
                     num_nodes: int, comp: Optional[jnp.ndarray] = None,
                     budget_elems: int = DIRECT_BUDGET_ELEMS,
                     message_budget_elems: int = MESSAGE_BUDGET_ELEMS
                     ) -> jnp.ndarray:
    """Featureless input layer: ``out[s] = Σ_e norm_e W_I[rel_e, dst_e, :]``.

    Equivalent to the reference's ``A @ W_I`` against the identity feature
    block (reference: graph.py:66-81). ``node_weights``: (S, n_cols, out)
    where S = num_bases or R; ``comp``: (R, S) or None.
    """
    S, n_cols, out_dim = node_weights.shape

    if comp is None:
        flat = node_weights.reshape(S * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    R = comp.shape[0]
    if _padded_elems(R * n_cols, out_dim) <= budget_elems:
        W = jnp.einsum("rb,bno->rno", comp, node_weights,
                       precision=jax.lax.Precision.HIGHEST)
        flat = W.reshape(R * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    flat = jnp.transpose(node_weights, (1, 0, 2)).reshape(n_cols,
                                                          S * out_dim)
    return _fused_basis_aggregate(flat, src, dst, rel, norm, comp,
                                  num_nodes, out_dim, message_budget_elems,
                                  gather_dtype=_gather_dtype())


def reference_dense_check(H, src, dst, rel, norm, num_nodes, num_relations,
                          W):
    """Slow dense oracle for tests: materialise the reference's hstacked
    ``A`` and compute ``A @ reshape(H W)`` exactly as
    reference: graph.py:93-95."""
    n_cols = H.shape[0]
    A = jnp.zeros((num_nodes, num_relations * n_cols), dtype=jnp.float32)
    A = A.at[src, rel * n_cols + dst].add(norm)
    HW = jnp.einsum("ni,rio->rno", H, W)  # (R, n, out)
    FW = HW.reshape(num_relations * n_cols, -1)
    return A @ FW
