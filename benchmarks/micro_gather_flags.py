"""Can gather hints / alternative formulations beat the 20M-rows/s gather?

Variants over gathering 700k rows of (1.5M, 128):
  take_default      - x[idx] (what the framework does today)
  take_sorted_flag  - lax.gather with indices_are_sorted on sorted idx
  onehot_segments   - reverse trick: build messages by scatter-adding W rows
                      into edge slots via segment_sum over (idx -> edge) CSR
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    rows, E = 1_512_500, 700_000
    flat = jnp.asarray(rng.standard_normal((rows, 128)).astype(np.float32))
    idx_np = np.sort(rng.integers(0, rows, E).astype(np.int32))
    idx = jnp.asarray(idx_np)

    def timeit(fn, *args, steps=7):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    r = {}

    @jax.jit
    def take_default(flat):
        return flat[idx].sum(axis=1)  # reduce to defeat DCE, keep gather

    r["take_default"] = timeit(take_default, flat)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0,))

    @jax.jit
    def take_sorted(flat):
        g = lax.gather(flat, idx[:, None], dnums, slice_sizes=(1, 128),
                       indices_are_sorted=True, unique_indices=False,
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return g.sum(axis=1)

    r["take_sorted_flag"] = timeit(take_sorted, flat)

    # reverse: W rows scattered into edge slots. With idx sorted, the edges
    # wanting row j are a contiguous run; messages = repeat of unique rows.
    uniq, counts = np.unique(idx_np, return_counts=True)
    seg_of_edge = jnp.asarray(np.repeat(np.arange(len(uniq)), counts))
    uniq_d = jnp.asarray(uniq)

    @jax.jit
    def unique_gather_expand(flat):
        g = flat[uniq_d]                 # gather unique rows only
        return g[seg_of_edge].sum(axis=1)  # expand by second (cheaper?) gather

    r["unique_then_expand"] = timeit(unique_gather_expand, flat)
    r["unique_rows"] = int(len(uniq))

    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in r.items()}))


if __name__ == "__main__":
    main()
