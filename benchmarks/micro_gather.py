"""Floor check: how fast is the (E, B*out) gather alone on v5e?"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, E, D = 100_000, 700_000, 640
    dst = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
    dst_sorted = jnp.asarray(np.sort(rng.integers(0, n, E).astype(np.int32)))
    flat = jnp.asarray(rng.standard_normal((n, D)).astype(np.float32))
    flat16 = flat.astype(jnp.bfloat16)

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
    g = jax.jit(lambda f, d: f[d].sum(axis=0))
    r["gather640_f32"] = timeit(g, flat, dst)
    r["gather640_f32_sorteddst"] = timeit(g, flat, dst_sorted)
    r["gather640_bf16"] = timeit(g, flat16, dst)
    # narrow gather for comparison (relation-grouped path gathers (E, 16))
    r["gather16_f32"] = timeit(g, flat[:, :16], dst)
    r["bytes_gb"] = E * D * 4 / 1e9
    print(json.dumps({k: round(v, 6) for k, v in r.items()}))


if __name__ == "__main__":
    main()
