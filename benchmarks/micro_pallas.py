"""Pallas mix+segment kernel vs XLA fused path (DMG-scale featureless layer).
Forward only (the kernel ships with an XLA-autodiff-friendly wrapper later
if it wins)."""

from __future__ import annotations

import json
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.ops import pallas_kernels as pk
    from mrgcn_tpu.ops import rspmm

    rng = np.random.default_rng(0)
    n, E, out, B, R = 100_000, 700_000, 16, 40, 121
    src = np.sort(rng.integers(0, n, E).astype(np.int32))
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    flat = rng.standard_normal((n, B * out)).astype(np.float32)
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

    results = {}

    fused = jax.jit(lambda f, c: rspmm._fused_basis_aggregate(
        f, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
        jnp.asarray(norm), c, n, out, budget_elems=2 ** 28))
    results["xla_fused"] = timeit(fused, jnp.asarray(flat),
                                  jnp.asarray(comp))

    t0 = time.time()
    perm, local_src, row_blocks = pk.prepare_blocks(src, n)
    results["host_prepare_s"] = round(time.time() - t0, 4)
    results["pad_overhead"] = round(len(perm) / E - 1, 4)

    args = (jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
            jnp.asarray(norm))
    perm_d = jnp.asarray(perm)
    local_d = jnp.asarray(local_src)
    rb_d = jnp.asarray(row_blocks)

    pallas_fn = jax.jit(lambda f, c: pk.fused_gather_aggregate_pallas(
        f, *args, c, perm_d, local_d, rb_d, n, out))
    results["pallas"] = timeit(pallas_fn, jnp.asarray(flat),
                               jnp.asarray(comp))

    a = np.asarray(fused(jnp.asarray(flat), jnp.asarray(comp)))
    b = np.asarray(pallas_fn(jnp.asarray(flat), jnp.asarray(comp)))
    results["max_diff"] = float(np.max(np.abs(a - b)))

    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
