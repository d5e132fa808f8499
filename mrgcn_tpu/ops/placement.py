"""Row placement without scatters: ``X[node_idx[j]] = out[j]`` as gathers.

XLA:TPU lowers a general row scatter (``X.at[idx, off:off+dim].set(out,
mode="drop")``) to a SERIAL while loop over update rows — measured at
67 ms for a (20k, 4) update into (60k, 40) on v5e, which made the
modality-placement scatters (~250-300 ms) dominate the multimodal train
step (see benchmarks/micro_mm_trace.py / micro_scatter_set.py). The
reference hits the same logical op with torch index assignment
(reference: mrgcn/models/mrgcn.py:250-305); on TPU the right construction
is gathers in BOTH directions:

  forward   X = padded_out[inv]  with ``inv`` built by sort+searchsorted
            (vectorised binary search — log2(m) gathers, no while loop)
  backward  d_out[j] = d_X[node_idx[j]]  (row gather, masked for
            out-of-range padding indices)

Requires each valid ``node_idx`` to appear at most once (one feature row
per node per encoding set — guaranteed by ``features.densify``; padding
rows carry out-of-range indices and contribute nothing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def place_rows(out: jnp.ndarray, node_idx: jnp.ndarray,
               num_rows: int) -> jnp.ndarray:
    """Return (num_rows, dim) X with ``X[node_idx[j]] = out[j]`` and zeros
    elsewhere; entries of ``node_idx`` outside [0, num_rows) are dropped."""
    return _place_fwd_impl(out, node_idx, num_rows)


def _place_fwd_impl(out, node_idx, num_rows):
    m = out.shape[0]
    order = jnp.argsort(node_idx)
    sidx = node_idx[order]
    pos = jnp.searchsorted(sidx, jnp.arange(num_rows, dtype=sidx.dtype),
                           side="left")
    pos_c = jnp.minimum(pos, m - 1)
    valid = sidx[pos_c] == jnp.arange(num_rows, dtype=sidx.dtype)
    rows = jnp.where(valid, order[pos_c], m)
    padded = jnp.concatenate(
        [out, jnp.zeros((1, out.shape[1]), out.dtype)], axis=0)
    return padded[rows]


def _place_fwd(out, node_idx, num_rows):
    return _place_fwd_impl(out, node_idx, num_rows), (node_idx,)


def _place_bwd(num_rows, res, d_X):
    (node_idx,) = res
    in_range = (node_idx >= 0) & (node_idx < num_rows)
    safe = jnp.where(in_range, node_idx, 0)
    d_out = jnp.where(in_range[:, None], d_X[safe], 0)
    return d_out, None


place_rows.defvjp(_place_fwd, _place_bwd)


# ---------------------------------------------------------------------------
# host-precomputed inverse map: node_idx is static graph data, so the
# sort + binary search above is wasted work when repeated every step
# ---------------------------------------------------------------------------

def build_rows(node_idx, num_rows: int):
    """Host-side (numpy) inverse map for :func:`place_rows_pre`:
    ``rows[n] = j`` where ``node_idx[j] == n``, else ``m`` (the zero row).
    ``node_idx`` entries outside [0, num_rows) are padding and ignored."""
    import numpy as np
    idx = np.asarray(node_idx)
    m = idx.shape[0]
    rows = np.full(num_rows, m, dtype=np.int32)
    valid = (idx >= 0) & (idx < num_rows)
    rows[idx[valid]] = np.nonzero(valid)[0]
    return rows


@jax.custom_vjp
def place_rows_pre(out: jnp.ndarray, node_idx: jnp.ndarray,
                   rows: jnp.ndarray) -> jnp.ndarray:
    """:func:`place_rows` with the inverse map built once on the host
    (``rows = build_rows(node_idx, num_rows)``). Forward is a single row
    gather; backward gathers ``d_X[node_idx]`` exactly as place_rows."""
    padded = jnp.concatenate(
        [out, jnp.zeros((1, out.shape[1]), out.dtype)], axis=0)
    return padded[rows]


def _place_pre_fwd(out, node_idx, rows):
    return place_rows_pre(out, node_idx, rows), (node_idx,)


def _place_pre_bwd(res, d_X):
    (node_idx,) = res
    num_rows = d_X.shape[0]
    in_range = (node_idx >= 0) & (node_idx < num_rows)
    safe = jnp.where(in_range, node_idx, 0)
    d_out = jnp.where(in_range[:, None], d_X[safe], 0)
    return d_out, None, None


place_rows_pre.defvjp(_place_pre_fwd, _place_pre_bwd)
