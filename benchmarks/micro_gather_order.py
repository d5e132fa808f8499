"""Does gather locality explain the forward gap? Packed-gather layer forward
with (a) src-sorted edges (current), (b) gather-index-sorted edges,
(c) gather-index-sorted + bf16 flat."""

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

    from mrgcn_tpu.ops import rspmm

    rng = np.random.default_rng(0)
    n, E, out, B, R = 100_000, 700_000, 16, 40, 121
    src = np.sort(rng.integers(0, n, E).astype(np.int32))
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)

    shape, k = rspmm.packed_identity_shape(B, n, out)
    packed = rng.standard_normal(shape).astype(np.float32)
    comp = rng.standard_normal((R, B)).astype(np.float32)

    def timeit(fn, *args, steps=7):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def run_with(order, dtype=None):
        s, d, r, nm = src[order], dst[order], rel[order], norm[order]
        p = jnp.asarray(packed if dtype is None
                        else packed.astype(dtype))
        args = (jnp.asarray(s), jnp.asarray(d), jnp.asarray(r),
                jnp.asarray(nm))

        @jax.jit
        def fwd(p, c):
            return rspmm.gather_aggregate_packed(p, *args, n, out, k, comp=c)

        return timeit(fwd, p, jnp.asarray(comp))

    results = {"k": k}
    results["src_sorted"] = run_with(np.arange(E))
    gather_idx = rel.astype(np.int64) * shape[1] + dst // k
    order = np.argsort(gather_idx, kind="stable")
    results["gatheridx_sorted"] = run_with(order)
    results["gatheridx_sorted_bf16"] = run_with(order,
                                                dtype=jnp.bfloat16)

    print(json.dumps({kk: (round(v, 6) if isinstance(v, float) else v)
                      for kk, v in results.items()}))


if __name__ == "__main__":
    main()
