"""Isolate the packed featureless layer: compose cost vs gather cost."""

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
    src = jnp.asarray(np.sort(rng.integers(0, n, E).astype(np.int32)))
    dst_np = rng.integers(0, n, E).astype(np.int32)
    rel_np = rng.integers(0, R, E).astype(np.int32)
    dst = jnp.asarray(dst_np)
    rel = jnp.asarray(rel_np)
    norm = jnp.asarray(rng.random(E).astype(np.float32))

    shape, k = rspmm.packed_identity_shape(B, n, out)
    n_rows = shape[1]
    packed = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))
    composed = jnp.asarray(
        rng.standard_normal((R, n_rows, 128)).astype(np.float32))

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
    def compose_einsum(p, c):
        return jnp.einsum("rs,sgl->rgl", c, p,
                          preferred_element_type=jnp.float32)

    r["compose_einsum"] = timeit(compose_einsum, packed, comp)

    @jax.jit
    def compose_2d(p, c):
        return (c @ p.reshape(B, n_rows * 128)).reshape(R, n_rows, 128)

    r["compose_2d_matmul"] = timeit(compose_2d, packed, comp)

    sub = 128 // k
    packed_idx = rel * n_rows + dst // k

    @jax.jit
    def gather_select_segsum(flat):
        g = flat.reshape(R * n_rows, 128)[packed_idx].reshape(-1, k, sub)
        sel = jax.nn.one_hot(dst % k, k, dtype=g.dtype)
        msgs = jnp.einsum("ek,eks->es", sel, g)[:, :out]
        return rspmm.segment_sum(msgs * norm[:, None], src, n)

    r["gather_select_segsum"] = timeit(gather_select_segsum, composed)

    @jax.jit
    def gather_only(flat):
        return flat.reshape(R * n_rows, 128)[packed_idx] * norm[:, None]

    r["gather_only"] = timeit(gather_only, composed)

    print(json.dumps({kk: round(v, 6) for kk, v in r.items()}))


if __name__ == "__main__":
    main()
