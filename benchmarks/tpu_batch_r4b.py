"""One-shot TPU experiment batch (round 4, second batch): the text
encoder's attention backward (VERDICT r3 item 4).

tpu_batch_r3f/r3m left the multimodal epoch at 153.9 ms with 28.6 ms in
the attention matmul chain's backward; flash, plain and remat variants
were measured and refuted. Untried levers, measured here:

  1. enc A/B at bench shape (N=8k, L=128, d=128, 2 layers, h=1):
     flax (auto) vs plain vs plain_fused (ONE (d, 3d) QKV matmul — the
     activation is read once instead of three times, backward folds
     dW_q/dW_k/dW_v and the three d_y terms into single contractions).
  2. attention-core decomposition: the projections (4 Dense) vs the
     score/softmax/PV core, each fwd and fwd+bwd — does the 28.6 ms sit
     in the (N, L, L) logits traffic (a fused kernel's territory) or in
     the projection matmuls (fused QKV's territory)?
  3. multimodal epoch with the winning variant (regression-guarded
     default decision).

Run:  python benchmarks/tpu_batch_r4b.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def report(tag, payload):
    RESULTS[tag] = payload
    print(tag, json.dumps(payload), flush=True)


def _tokens(n=8_000, L=128, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 256, (n, L)).astype(np.int32)
    lengths = rng.integers(8, L + 1, n)
    for i, ln in enumerate(lengths):
        toks[i, ln:] = 256
    return toks


def encoder_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    tokens = jnp.asarray(_tokens())
    out = {}
    for impl in ("auto", "plain", "plain_fused"):
        enc = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                          attn_impl=impl)
        params = enc.init(jax.random.PRNGKey(0), tokens)

        def loss(v, toks):
            return jnp.sum(enc.apply(v, toks) ** 2)

        out[f"enc_{impl}_fwd_ms"] = round(per_iter_time(
            loss, params, tokens, iters=8) * 1e3, 3)
        out[f"enc_{impl}_fwd_bwd_ms"] = round(per_iter_time(
            lambda v, t: jax.value_and_grad(loss)(v, t), params, tokens,
            iters=8) * 1e3, 3)
    report("FINAL_ENC_AB", out)


def attn_core_parts():
    """Isolate the attention block's two halves on real activation
    shapes: projections (q/k/v/out Dense) vs the score/softmax/PV core."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from benchmarks.timing import per_iter_time

    N, L, d = 8_000, 128, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((N, L)) < 0.9)

    class Projections(nn.Module):
        fused: bool = False

        @nn.compact
        def __call__(self, y):
            if self.fused:
                qkv = nn.Dense(3 * d, dtype=jnp.bfloat16)(y)
                q, k, v = (qkv[..., :d], qkv[..., d:2 * d],
                           qkv[..., 2 * d:])
            else:
                q = nn.Dense(d, dtype=jnp.bfloat16)(y)
                k = nn.Dense(d, dtype=jnp.bfloat16)(y)
                v = nn.Dense(d, dtype=jnp.bfloat16)(y)
            return nn.Dense(d, dtype=jnp.bfloat16)(q + k + v)

    out = {}
    for fused, tag in ((False, "proj3"), (True, "proj_fused")):
        mod = Projections(fused=fused)
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(v, xx):
            return jnp.sum(mod.apply(v, xx).astype(jnp.float32) ** 2)

        out[f"{tag}_fwd_ms"] = round(per_iter_time(
            loss, params, x, iters=8) * 1e3, 3)
        out[f"{tag}_fwd_bwd_ms"] = round(per_iter_time(
            lambda v, xx: jax.value_and_grad(loss)(v, xx), params, x,
            iters=8) * 1e3, 3)

    # score/softmax/PV core alone (no params: grads wrt q, k, v)
    q = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)

    def core(qkv):
        qq, kk, vv = qkv
        logits = jnp.einsum("nld,nmd->nlm", qq, kk,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(d))
        logits = jnp.where(mask[:, None, :], logits, jnp.float32(-1e9))
        p = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return jnp.sum(jnp.einsum("nlm,nmd->nld", p, vv)
                       .astype(jnp.float32) ** 2)

    out["core_fwd_ms"] = round(per_iter_time(
        core, (q, k, v), iters=8) * 1e3, 3)
    out["core_fwd_bwd_ms"] = round(per_iter_time(
        lambda t: jax.value_and_grad(core)(t), (q, k, v), iters=8) * 1e3, 3)
    report("FINAL_ATTN_PARTS", out)


def mm_epoch_variants():
    from benchmarks.bench_suite import bench_multimodal
    for impl, tag in ((None, "mm_epoch_default_s"),
                      ("plain_fused", "mm_epoch_plain_fused_s")):
        if impl is None:
            os.environ.pop("MRGCN_TEXT_ATTN", None)
        else:
            os.environ["MRGCN_TEXT_ATTN"] = impl
        try:
            report(tag, round(bench_multimodal(), 6))
        except Exception as exc:
            report(tag, f"{type(exc).__name__}: {exc}")
    os.environ.pop("MRGCN_TEXT_ATTN", None)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("encoder_ab", encoder_ab)
    guarded("attn_core_parts", attn_core_parts)
    guarded("mm_epoch_variants", mm_epoch_variants)
    print("FINAL_R4B", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
