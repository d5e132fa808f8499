"""Text-encoder cost sweep on TPU: attention impl x token-embed impl.

The multimodal epoch's text encoder (N=8k sequences x L=128 tokens,
d=128, 2 layers) is backward-dominated (benchmarks/micro_multimodal_parts:
text fwd 62 ms vs fwd+bwd 295 ms with flash+one_hot). Two independent
suspects, each swept here:

  * attention: "flash" (Pallas kernel; at L=128 the grid degenerates to
    32k single-block programs — kernel-overhead-bound?) vs "xla"
    (materialised probabilities, but only ~1 GB at these shapes with the
    key-only mask).
  * token embedding: "gather" (nn.Embed; backward is an N*L-row
    scatter-add into a 259-row table — collision-serialised?) vs
    "one_hot" (MXU matmuls both ways, but materialises (N, L, V)).

Also checks numerical agreement of every variant against the
full-mask/XLA/gather baseline.

Measured (v5e, 2026-08-17, fwd / fwd+bwd ms at N=8k L=128):
  base_fullmask_xla_gather  27.9 / 119.2
  xla_gather                27.3 / 117.5
  xla_onehot                26.1 / 109.1
  flash_gather              63.3 / 303.8
Verdict: the FLASH KERNEL was the multimodal backward wall, not the
embedding — at L=128 its grid is N*h single-q-block programs and launch
overhead swamps the saved probability traffic. The long-L check found
flash STILL loses at L=512 (640 ms vs 244 ms fwd+bwd at N=2k): with
head dim 32 the kernel's MXU tiles are 4x-padded, so there is no
crossover at this model scale. TextEncoder's "auto" therefore always
picks XLA; flash is explicit opt-in.

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

    # (label, key_only_mask, attn_impl, embed_impl)
    variants = (("base_fullmask_xla_gather", False, "xla", "gather"),
                ("xla_gather", True, "xla", "gather"),
                ("xla_onehot", True, "xla", "one_hot"),
                ("flash_gather", True, "flash", "gather"),
                ("flash_onehot", True, "flash", "one_hot"))
    outs = {}
    for label, key_only, attn, embed in variants:
        enc = TextEncoder(output_dim=16, key_only_mask=key_only,
                          attn_impl=attn, embed_impl=embed)
        variables = enc.init(jax.random.PRNGKey(0), tokens)

        outs[label] = np.asarray(jax.jit(enc.apply)(variables, tokens))
        report(f"{label}_fwd_ms", per_iter_time(
            lambda v: enc.apply(v, tokens), variables, iters=20))
        report(f"{label}_fwd_bwd_ms", per_iter_time(
            lambda v: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, tokens)))(v),
            variables, iters=20))

    # numerical agreement across mask schemes, kernels and embed paths
    # (bf16 body)
    base = outs["base_fullmask_xla_gather"]
    scale = float(np.max(np.abs(base)) + 1e-9)
    for label in ("xla_gather", "xla_onehot", "flash_gather",
                  "flash_onehot"):
        err = float(np.max(np.abs(outs[label] - base)))
        print(json.dumps({f"{label}_max_abs_err": err,
                          "rel": err / scale}), flush=True)
        assert err / scale < 2e-2, (label, err, scale)

    # long-sequence check: where does flash start winning? (fewer, bigger
    # grid programs; the XLA path materialises (N, h, L, L) probs)
    rng = np.random.default_rng(1)
    long_tokens = rng.integers(0, 256, (2_000, 512)).astype(np.int32)
    lengths = rng.integers(64, 513, 2_000)
    for i, ln in enumerate(lengths):
        long_tokens[i, ln:] = 256
    long_tokens = jnp.asarray(long_tokens)
    for label, attn in (("L512_xla", "xla"), ("L512_flash", "flash")):
        enc = TextEncoder(output_dim=16, attn_impl=attn)
        variables = enc.init(jax.random.PRNGKey(0), long_tokens)
        report(f"{label}_fwd_bwd_ms", per_iter_time(
            lambda v: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, long_tokens)))(v),
            variables, iters=10))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
