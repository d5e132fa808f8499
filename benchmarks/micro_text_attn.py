"""Text-encoder attention cost on TPU: full vs key-only padding mask.

The multimodal epoch's text encoder (N=8k sequences x L=128 tokens,
d=128, 2 layers) materialises an (N, 1, L, L) query x key mask plus
(N, h, L, L) attention probabilities — memory traffic, not FLOPs, is the
candidate wall (~870 GFLOP fwd would be ~4.4 ms at bf16 peak). Measures
fwd and fwd+bwd for both mask schemes at iters=20 (the earlier iters=5
numbers carried tunnel-noise of the same order as the signal).

Run:  python benchmarks/micro_text_attn.py
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
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (8_000, 128)).astype(np.int32)
    # ragged padding like real text batches
    lengths = rng.integers(8, 129, 8_000)
    for i, ln in enumerate(lengths):
        tokens[i, ln:] = 256
    tokens = jnp.asarray(tokens)

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    variants = (("full_mask", False, "xla"),
                ("key_only", True, "xla"),
                ("flash", True, "flash"))
    outs = {}
    for label, key_only, impl in variants:
        enc = TextEncoder(output_dim=16, key_only_mask=key_only,
                          attn_impl=impl)
        variables = enc.init(jax.random.PRNGKey(0), tokens)

        outs[label] = np.asarray(jax.jit(enc.apply)(variables, tokens))
        report(f"{label}_fwd_ms", per_iter_time(
            lambda v: enc.apply(v, tokens), variables, iters=20))
        report(f"{label}_fwd_bwd_ms", per_iter_time(
            lambda v: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, tokens)))(v),
            variables, iters=20))

    # numerical agreement across mask schemes and kernels (bf16 body)
    for label in ("key_only", "flash"):
        err = float(np.max(np.abs(outs[label] - outs["full_mask"])))
        scale = float(np.max(np.abs(outs["full_mask"])) + 1e-9)
        print(json.dumps({f"{label}_max_abs_err": err,
                          "rel": err / scale}), flush=True)
        assert err / scale < 2e-2, (label, err, scale)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
