"""Micro-benchmarksolating the relational SpMM bottleneck on TPU.

Variants over the DMG-scale workload (E=700k, n=100k, out=16):
  1. segment_sum (scatter-add), unsorted src
  2. segment_sum with src-sorted edges + indices_are_sorted hint
  3. ELLPACK-style: fixed-width neighbour slots, gather + dense reduce
     (no scatter in the hot loop)
  4. pure gather (lower bound: message materialisation without aggregation)
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, E, out = 100_000, 700_000, 16
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    H = rng.standard_normal((n, out)).astype(np.float32)

    def timeit(fn, *args, steps=10):
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(jax.jit(fn)(*args))
            times.append(time.time() - t0)
        return float(np.median(times))

    results = {}

    # 1. scatter-add, unsorted
    def seg_unsorted(H, src, dst, norm):
        return jax.ops.segment_sum(H[dst] * norm[:, None], src,
                                   num_segments=n)

    results["segment_sum_unsorted"] = timeit(
        seg_unsorted, jnp.asarray(H), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(norm))

    # 2. scatter-add, sorted + hint
    order = np.argsort(src, kind="stable")
    ssrc, sdst, snorm = src[order], dst[order], norm[order]

    def seg_sorted(H, src, dst, norm):
        return jax.ops.segment_sum(H[dst] * norm[:, None], src,
                                   num_segments=n,
                                   indices_are_sorted=True)

    results["segment_sum_sorted"] = timeit(
        seg_sorted, jnp.asarray(H), jnp.asarray(ssrc), jnp.asarray(sdst),
        jnp.asarray(snorm))

    # 3. ELLPACK: rows padded to width-W slots; no scatter
    W = 32
    deg = np.bincount(src, minlength=n)
    vrows_per_node = np.maximum(1, -(-deg // W))
    total_vrows = int(vrows_per_node.sum())
    row_of_vrow = np.repeat(np.arange(n, dtype=np.int32), vrows_per_node)
    # slot tables
    slot_dst = np.zeros((total_vrows, W), dtype=np.int32)
    slot_norm = np.zeros((total_vrows, W), dtype=np.float32)
    vrow_start = np.concatenate([[0], np.cumsum(vrows_per_node)])
    cursor = np.zeros(n, dtype=np.int64)
    for e in range(E):
        s = ssrc[e]
        k = cursor[s]
        vr = vrow_start[s] + k // W
        slot_dst[vr, k % W] = sdst[e]
        slot_norm[vr, k % W] = snorm[e]
        cursor[s] += 1

    def ell(H, slot_dst, slot_norm, row_of_vrow):
        msgs = H[slot_dst] * slot_norm[:, :, None]      # (V, W, out)
        partial = msgs.sum(axis=1)                       # (V, out)
        return jax.ops.segment_sum(partial, row_of_vrow, num_segments=n,
                                   indices_are_sorted=True)

    results["ellpack_w32"] = timeit(
        ell, jnp.asarray(H), jnp.asarray(slot_dst), jnp.asarray(slot_norm),
        jnp.asarray(row_of_vrow))
    results["ellpack_vrows"] = total_vrows

    # 4. gather only (lower bound)
    def gather_only(H, dst, norm):
        return (H[dst] * norm[:, None]).sum(axis=0)

    results["gather_only"] = timeit(
        gather_only, jnp.asarray(H), jnp.asarray(sdst), jnp.asarray(snorm))

    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
