"""Modality-placement scatter variants on TPU.

The multimodal train-step trace (benchmarks/micro_mm_trace.py) showed
XLA:TPU lowers ``X.at[node_idx, off:off+dim].set(out, mode="drop")`` to a
SERIAL while loop over update rows — 67 ms for a (20k, 4) update into
(60k, 40), ~250-300 ms across the four modalities of the 488 ms epoch.
The encoders were never the wall; the placement scatter was.

Variants measured (fwd and fwd+bwd into the update operand):
  * set_drop     — the original at[].set(mode="drop")
  * set_unique   — + unique_indices=True, indices_are_sorted=True on
                   sorted indices (does XLA vectorise it then?)
  * dump_row     — (n+1)-row X, invalid indices clamped to the dump row,
                   unique+sorted set, slice off the dump row
  * gather_vjp   — no scatter at all: forward gathers rows of the padded
                   update through a searchsorted-built inverse map;
                   backward gathers d_X[node_idx] (custom_vjp)

Run:  python benchmarks/micro_scatter_set.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops.placement import place_rows

    n, D = 60_000, 40
    cases = ((20_000, 4, 0), (10_000, 4, 4), (8_000, 16, 8),
             (2_000, 16, 24))
    rng = np.random.default_rng(0)

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    W = jnp.asarray(rng.random((D,)).astype(np.float32))

    for m, dim, off in cases:
        idx_np = np.sort(rng.choice(n, m, replace=False)).astype(np.int32)
        # a few padding rows with out-of-range indices, as densify emits
        idx_np[-3:] = n + 7
        idx = jnp.asarray(idx_np)
        out = jnp.asarray(rng.random((m, dim)).astype(np.float32))

        def loss_of_set(o, mode_kwargs):
            X = jnp.zeros((n, D), jnp.float32)
            X = X.at[idx, off:off + dim].set(o, **mode_kwargs)
            return jnp.sum(X * W[None, :])

        variants = {
            "set_drop": dict(mode="drop"),
            "set_unique": dict(mode="drop", unique_indices=True,
                               indices_are_sorted=True),
        }
        for label, kw in variants.items():
            report(f"{label}_{m}x{dim}_fwd_bwd_ms", per_iter_time(
                lambda o, kw=kw: jax.value_and_grad(
                    lambda q: loss_of_set(q, kw))(o), out, iters=20))

        def loss_of_dump(o):
            Xp = jnp.zeros((n + 1, D), jnp.float32)
            safe = jnp.where(idx < n, idx, n)
            Xp = Xp.at[safe, off:off + dim].set(
                o, unique_indices=True, indices_are_sorted=True)
            return jnp.sum(Xp[:-1] * W[None, :])

        report(f"dump_row_{m}x{dim}_fwd_bwd_ms", per_iter_time(
            lambda o: jax.value_and_grad(loss_of_dump)(o), out, iters=20))

        def loss_of_gather(o):
            X = jnp.zeros((n, D), jnp.float32)
            X = X.at[:, off:off + dim].set(place_rows(o, idx, n))
            return jnp.sum(X * W[None, :])

        report(f"gather_vjp_{m}x{dim}_fwd_bwd_ms", per_iter_time(
            lambda o: jax.value_and_grad(loss_of_gather)(o), out, iters=20))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
