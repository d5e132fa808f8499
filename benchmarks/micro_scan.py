"""Isolate why the basis-scan path is ~36x slower than its parts.

Variants of out[s] = sum_e norm_e * comp[rel_e, b] * Wb[b, dst_e]:
  scan_ckpt    - lax.scan with jax.checkpoint body (current impl)
  scan_plain   - lax.scan without checkpoint
  unrolled     - python loop (fully unrolled into the jit)
  bigmat       - one-shot: gather W[:, dst] as (E, B*out) then einsum+segsum
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
    src = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
    rel = jnp.asarray(rng.integers(0, R, E).astype(np.int32))
    norm = jnp.asarray(rng.random(E).astype(np.float32))
    Wb = jnp.asarray(rng.standard_normal((B, n, out)).astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    def timeit(fn, *args, steps=5):
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(steps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def seg(msgs, idx):
        return jax.ops.segment_sum(msgs, idx, num_segments=n)

    def body_fn(acc, operand):
        wb, comp_b = operand
        coef = norm * comp_b[rel]
        return acc + seg(wb[dst] * coef[:, None], src), None

    @jax.jit
    def scan_ckpt(Wb, comp):
        init = jnp.zeros((n, out), dtype=jnp.float32)
        acc, _ = jax.lax.scan(jax.checkpoint(body_fn), init, (Wb, comp.T))
        return acc

    @jax.jit
    def scan_plain(Wb, comp):
        init = jnp.zeros((n, out), dtype=jnp.float32)
        acc, _ = jax.lax.scan(body_fn, init, (Wb, comp.T))
        return acc

    @jax.jit
    def unrolled(Wb, comp):
        acc = jnp.zeros((n, out), dtype=jnp.float32)
        for b in range(B):
            coef = norm * comp[rel, b]
            acc = acc + seg(Wb[b][dst] * coef[:, None], src)
        return acc

    @jax.jit
    def bigmat(Wb, comp):
        flat = jnp.transpose(Wb, (1, 0, 2)).reshape(n, B * out)  # (n, B*out)
        g = flat[dst]                                            # (E, B*out)
        msgs = jnp.einsum("eb,ebo->eo", comp[rel] * norm[:, None],
                          g.reshape(E, B, out))
        return seg(msgs, src)

    results = {}
    results["scan_ckpt"] = timeit(scan_ckpt, Wb, comp)
    results["scan_plain"] = timeit(scan_plain, Wb, comp)
    results["unrolled"] = timeit(unrolled, Wb, comp)
    results["bigmat"] = timeit(bigmat, Wb, comp)

    # numerical agreement
    a = scan_ckpt(Wb, comp)
    d = bigmat(Wb, comp)
    results["max_diff"] = float(jnp.max(jnp.abs(a - d)))

    print(json.dumps({k: round(v, 6) for k, v in results.items()}))


if __name__ == "__main__":
    main()
