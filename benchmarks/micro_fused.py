"""Variants of the fused-basis aggregation (current champion: 56ms).

out[s] = sum_e sum_b w[e,b] * flat[dst_e, b*out:(b+1)*out],  w = comp[rel]*norm
E=700k, n=100k, B=40, out=16 (DMG-scale layer).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, E, out, B, R = 100_000, 700_000, 16, 40, 121
    src_u = rng.integers(0, n, E).astype(np.int32)
    order = np.argsort(src_u, kind="stable")
    src = jnp.asarray(src_u[order])
    dst = jnp.asarray(rng.integers(0, n, E).astype(np.int32)[order])
    rel = jnp.asarray(rng.integers(0, R, E).astype(np.int32)[order])
    norm = jnp.asarray(rng.random(E).astype(np.float32)[order])
    flat = jnp.asarray(rng.standard_normal((n, B * out)).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    def timeit(fn, *args, steps=7):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def seg(m, idx, sorted_=False):
        return jax.ops.segment_sum(m, idx, num_segments=n,
                                   indices_are_sorted=sorted_)

    @jax.jit
    def v_einsum(flat, comp):
        g = flat[dst].reshape(E, B, out)
        w = comp[rel] * norm[:, None]
        return seg(jnp.einsum("eb,ebo->eo", w, g), src)

    @jax.jit
    def v_einsum_sorted(flat, comp):
        g = flat[dst].reshape(E, B, out)
        w = comp[rel] * norm[:, None]
        return seg(jnp.einsum("eb,ebo->eo", w, g), src, True)

    @jax.jit
    def v_loop(flat, comp):
        g = flat[dst]                      # (E, B*out)
        w = comp[rel] * norm[:, None]      # (E, B)
        m = jnp.zeros((E, out), dtype=jnp.float32)
        for b in range(B):
            m = m + w[:, b:b + 1] * g[:, b * out:(b + 1) * out]
        return seg(m, src, True)

    @jax.jit
    def v_bf16(flat, comp):
        g = flat.astype(jnp.bfloat16)[dst].reshape(E, B, out)
        w = (comp[rel] * norm[:, None]).astype(jnp.bfloat16)
        m = jnp.einsum("eb,ebo->eo", w, g,
                       preferred_element_type=jnp.float32)
        return seg(m, src, True)

    @jax.jit
    def v_dot(flat, comp):
        g = flat[dst].reshape(E, B, out)
        w = comp[rel] * norm[:, None]
        m = jax.lax.dot_general(w[:, None, :], g,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return seg(m[:, 0, :], src, True)

    results = {}
    results["einsum"] = timeit(v_einsum, flat, comp)
    results["einsum_sorted"] = timeit(v_einsum_sorted, flat, comp)
    results["loop_mix"] = timeit(v_loop, flat, comp)
    results["bf16"] = timeit(v_bf16, flat, comp)
    results["dot_general"] = timeit(v_dot, flat, comp)

    a = np.asarray(v_einsum(flat, comp))
    results["diff_loop"] = float(np.max(np.abs(
        a - np.asarray(v_loop(flat, comp)))))
    results["diff_bf16"] = float(np.max(np.abs(
        a - np.asarray(v_bf16(flat, comp)))))

    print(json.dumps({k: round(v, 6) for k, v in results.items()}))


if __name__ == "__main__":
    main()
