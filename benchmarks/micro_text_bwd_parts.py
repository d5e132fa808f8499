"""Decompose the text encoder's backward wall (XLA attention path).

micro_multimodal_parts (round 3): text fwd 27.5 ms vs fwd+bwd 116.8 ms at
N=8k, L=128, d=128, 2 layers, 4 heads — a 4.2x fwd->fwd+bwd ratio where
the FLOP count says ~3x. Two questions, measured here:

  1. WHERE in the encoder does backward time go? Per-block isolation:
     token embed + pos, one attention block (LN + MHA + residual), one
     MLP block (LN + 4d MLP + residual), each fwd / fwd+bwd on the real
     (N, L, d) activations.
  2. Is the 4-head (head_dim 32) layout the wall? With d=128, dh=32 pads
     every attention matmul 4x on the 128-lane MXU; heads=1 gives dh=128
     (full lanes). Sweep num_heads in {1, 2, 4, 8} on the full encoder.
     The encoder is our own from-scratch design (the v3.0 reference wraps
     frozen DistilBERT, unavailable offline), so head count is a free
     design variable if quality holds.

Run:  python benchmarks/micro_text_bwd_parts.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tokens(n=8_000, L=128, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 256, (n, L)).astype(np.int32)
    lengths = rng.integers(8, L + 1, n)
    for i, ln in enumerate(lengths):
        toks[i, ln:] = 256
    return toks


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    tokens = jnp.asarray(_tokens())
    N, L = tokens.shape
    d = 128
    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    # ---- 1. per-block isolation at the encoder's activation scale ---------
    mask = (tokens != 256)
    attn_mask = mask[:, None, None, :]
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N, L, d)), jnp.bfloat16)

    class AttnBlock(nn.Module):
        heads: int = 4

        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=d, dtype=jnp.bfloat16,
                deterministic=True)(y, y, mask=attn_mask)
            return x + y

    class MlpBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            y = nn.Dense(4 * d, dtype=jnp.bfloat16)(y)
            y = nn.gelu(y)
            y = nn.Dense(d, dtype=jnp.bfloat16)(y)
            return x + y

    class Embed(nn.Module):
        @nn.compact
        def __call__(self, toks):
            emb = self.param("embedding", nn.initializers.normal(0.02),
                             (259, d))
            pos = self.param("pos", nn.initializers.normal(0.02), (512, d))
            x = emb.astype(jnp.bfloat16)[toks]
            return x + pos[:toks.shape[1]][None].astype(jnp.bfloat16)

    for label, mod, arg in (("embed", Embed(), tokens),
                            ("attn_block", AttnBlock(), x0),
                            ("mlp_block", MlpBlock(), x0)):
        v = mod.init(jax.random.PRNGKey(0), arg)
        report(f"{label}_fwd_ms", per_iter_time(
            lambda p: mod.apply(p, arg), v, iters=20))
        report(f"{label}_fwd_bwd_ms", per_iter_time(
            lambda p: jax.value_and_grad(
                lambda q: jnp.sum(mod.apply(q, arg)
                                  .astype(jnp.float32)))(p), v, iters=20))

    # attention block with d_x flowing THROUGH (grad wrt x, not params):
    # the encoder's real backward carries activation cotangents
    av = AttnBlock().init(jax.random.PRNGKey(0), x0)
    report("attn_block_dx_ms", per_iter_time(
        lambda x: jax.value_and_grad(
            lambda q: jnp.sum(AttnBlock().apply(av, q)
                              .astype(jnp.float32)))(x), x0, iters=20))

    # ---- 2. head-count sweep on the full encoder ---------------------------
    outs = {}
    for heads in (1, 2, 4, 8):
        enc = TextEncoder(output_dim=16, num_heads=heads)
        v = enc.init(jax.random.PRNGKey(0), tokens)
        outs[heads] = np.asarray(jax.jit(enc.apply)(v, tokens))
        report(f"enc_h{heads}_fwd_ms", per_iter_time(
            lambda p: enc.apply(p, tokens), v, iters=20))
        report(f"enc_h{heads}_fwd_bwd_ms", per_iter_time(
            lambda p: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, tokens)))(p), v, iters=20))

    print("FINAL_TEXT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
