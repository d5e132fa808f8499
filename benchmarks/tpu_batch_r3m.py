"""Round-3 TPU batch M: plain single-head attention A/B.

The multimodal wall is the text-encoder backward; within it the
attention-block dx path measured 28.6 ms (r3b FINAL_TEXT). Hypothesis:
flax MultiHeadDotProductAttention's singleton head axis (N, L, 1, 128)
costs transposes in the backward. `_TextBlock(attn_impl="plain")`
computes single-head attention on (N, L, d) directly (CPU-verified
numerically equivalent at mapped params, 2.7e-7).

  * enc_flax_fwd_bwd  — re-pin (~88.6 ms at N=8k, L=128)
  * enc_plain_fwd_bwd — the candidate
  * mm_epoch          — current default multimodal epoch (sanity)

Run:  python benchmarks/tpu_batch_r3m.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def attn_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    N, L = 8_000, 128
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 259, (N, L)), jnp.int32)
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    for label, impl in (("enc_flax_fwd_bwd_ms", "auto"),
                        ("enc_plain_fwd_bwd_ms", "plain")):
        enc = TextEncoder(output_dim=16, attn_impl=impl)
        params = enc.init(jax.random.PRNGKey(0), toks)["params"]

        def loss(p, enc=enc):
            return jnp.sum(enc.apply({"params": p}, toks) ** 2)

        report(label, per_iter_time(
            lambda p, l=loss: jax.value_and_grad(l)(p), params, iters=10))

    print("FINAL_ATTN_AB " + json.dumps(results), flush=True)


def mm_epoch():
    from benchmarks.bench_suite import bench_multimodal

    s = bench_multimodal(steps=5)
    print("FINAL_MM " + json.dumps({"mm_epoch_s": round(s, 6)}), flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== plain attention A/B =====", flush=True)
    guarded("attn_ab", attn_ab)

    print("\n===== multimodal epoch (default) =====", flush=True)
    guarded("mm_epoch", mm_epoch)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
