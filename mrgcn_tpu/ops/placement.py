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
