"""Relational sparse-dense products for R-GCN layers.

The reference computes ``A @ [I F] W`` with one giant sparse matmul against
the hstacked ``n x (R*n)`` adjacency (reference: mrgcn/layers/graph.py:62-102).
On TPU we express the same contraction over a relation-partitioned COO edge
list ``(src, dst, rel, norm)``:

    out[s] = sum_e 1[src_e == s] * norm_e * (H[dst_e] @ W[rel_e])

with basis decomposition ``W[r] = sum_b comp[r, b] * basis[b]``
(reference: layers/graph.py:69-72, 84-85).

Two execution strategies, chosen by static shapes:

  * **direct**: precompute ``HW = einsum('ni,bio->bno', H, basis)`` — one big
    MXU matmul — then gather per-edge rows from the flattened ``(B*n, out)``
    buffer (the TPU analogue of the reference's hstack trick) and segment-sum
    into rows. Used when the ``(B, n, out)`` buffer fits the budget and no
    per-edge basis mixing is needed (``comp is None`` or composed upfront).
  * **basis-scan**: ``lax.scan`` over bases; per basis one ``(n,in)@(in,out)``
    matmul + gather + segment-sum, weighting each edge by
    ``norm_e * comp[rel_e, b]``. Memory is O(E*out) regardless of B.

Both are jit-compatible, statically shaped, and differentiable; padding edges
(``norm == 0``) contribute nothing.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# elements allowed for the (B, n, out) direct-path buffer (f32), measured in
# *padded* elements: TPU tiles f32 as (8, 128), so a minor dim of e.g. 14
# occupies 128 lanes — a 9x inflation that must enter the budget decision
DIRECT_BUDGET_ELEMS = 2 ** 27  # 512 MiB


def _padded_elems(rows: int, minor: int) -> int:
    pad_minor = -(-minor // 128) * 128
    pad_rows = -(-rows // 8) * 8
    return pad_rows * pad_minor


def segment_sum(messages: jnp.ndarray, src: jnp.ndarray,
                num_nodes: int) -> jnp.ndarray:
    return jax.ops.segment_sum(messages, src, num_segments=num_nodes)


def _compose(basis: jnp.ndarray, comp: Optional[jnp.ndarray]) -> jnp.ndarray:
    """``W[r] = sum_b comp[r,b] basis[b]`` (reference: graph.py:84-85)."""
    if comp is None:
        return basis
    return jnp.einsum("rb,bio->rio", comp, basis)


def transform_aggregate(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                        rel: jnp.ndarray, norm: jnp.ndarray, num_nodes: int,
                        basis: jnp.ndarray,
                        comp: Optional[jnp.ndarray] = None,
                        budget_elems: int = DIRECT_BUDGET_ELEMS
                        ) -> jnp.ndarray:
    """Dense-feature R-GCN aggregation: ``out[s] = Σ_e norm_e H[dst_e] W[rel_e]``.

    ``H``: (n_cols, in); ``basis``: (B, in, out); ``comp``: (R, B) or None
    (then B == R and relations index the basis directly).
    Returns (num_nodes, out).
    """
    n_cols = H.shape[0]
    B, _, out_dim = basis.shape
    R = B if comp is None else comp.shape[0]

    direct_elems = _padded_elems(R * n_cols, out_dim)
    if direct_elems <= budget_elems:
        W = _compose(basis, comp)  # (R, in, out)
        HW = jnp.einsum("ni,rio->rno", H, W,
                        preferred_element_type=jnp.float32)
        HW_flat = HW.reshape(R * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = HW_flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    # basis-scan path: O(E*out) memory, B sequential matmuls. The body is
    # rematerialised in the backward pass — without checkpoint, scan stacks
    # the (E, out) per-basis messages across iterations, a (B, E, out)
    # residual that lane padding inflates ~128/out times.
    if comp is None:
        comp = jnp.eye(B, dtype=H.dtype)

    @jax.checkpoint
    def body(acc, operand):
        basis_b, comp_b = operand  # (in, out), (R,)
        HWb = jnp.dot(H, basis_b, preferred_element_type=jnp.float32)
        coef = norm * comp_b[rel]
        acc = acc + segment_sum(HWb[dst] * coef[:, None], src, num_nodes)
        return acc, None

    init = jnp.zeros((num_nodes, out_dim), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, init, (basis, comp.T))
    return acc


def gather_aggregate(node_weights: jnp.ndarray, src: jnp.ndarray,
                     dst: jnp.ndarray, rel: jnp.ndarray, norm: jnp.ndarray,
                     num_nodes: int, comp: Optional[jnp.ndarray] = None,
                     budget_elems: int = DIRECT_BUDGET_ELEMS) -> jnp.ndarray:
    """Featureless input layer: ``out[s] = Σ_e norm_e W_I[rel_e, dst_e, :]``.

    Equivalent to the reference's ``A @ W_I`` against the identity feature
    block (reference: graph.py:66-81). ``node_weights``: (S, n_cols, out)
    where S = num_bases or R; ``comp``: (R, S) or None.
    """
    S, n_cols, out_dim = node_weights.shape
    R = S if comp is None else comp.shape[0]

    if comp is None:
        flat = node_weights.reshape(S * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    if _padded_elems(R * n_cols, out_dim) <= budget_elems:
        W = jnp.einsum("rb,bno->rno", comp, node_weights)
        flat = W.reshape(R * n_cols, out_dim)
        flat_idx = rel.astype(jnp.int32) * n_cols + dst.astype(jnp.int32)
        messages = flat[flat_idx] * norm[:, None]
        return segment_sum(messages, src, num_nodes)

    @jax.checkpoint
    def body(acc, operand):
        wb, comp_b = operand  # (n_cols, out), (R,)
        coef = norm * comp_b[rel]
        acc = acc + segment_sum(wb[dst] * coef[:, None], src, num_nodes)
        return acc, None

    init = jnp.zeros((num_nodes, out_dim), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, init, (node_weights, comp.T))
    return acc


@partial(jax.jit, static_argnames=("num_nodes", "num_relations"))
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
