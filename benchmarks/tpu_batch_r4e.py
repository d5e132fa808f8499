"""One-shot TPU experiment batch (round 4, fifth batch): the fused
attention-core kernel (ops/attention.py).

tpu_batch_r4b put the XLA attention core at 9.8 ms fwd+bwd per layer
(N=8k, L=128, d=128, h=1) — the (N, L, L) logits/probabilities
round-trip HBM. The multi-sequence-per-program kernel keeps them in
VMEM. Measured here:

  1. isolated core A/B: XLA chain vs fused kernel, fwd and fwd+bwd,
     GROUP in {4, 8, 16} (VMEM residency vs program-count trade).
  2. full-encoder A/B: plain_fused (current default) vs fused_core.
  3. multimodal epoch with MRGCN_TEXT_ATTN=fused_core at the best GROUP.

Run:  python benchmarks/tpu_batch_r4e.py  (fresh process only)
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


def core_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops.attention import fused_attention, xla_attention

    N, L, d = 8_000, 128, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, L, d)), jnp.bfloat16)
    lengths = rng.integers(8, L + 1, N)
    keys_valid = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])

    out = {}

    def loss_x(t):
        return jnp.sum(xla_attention(t[0], t[1], t[2], keys_valid)
                       .astype(jnp.float32) ** 2)

    out["xla_fwd_ms"] = round(per_iter_time(
        loss_x, (q, k, v), iters=10) * 1e3, 3)
    out["xla_fwd_bwd_ms"] = round(per_iter_time(
        lambda t: jax.value_and_grad(loss_x)(t), (q, k, v),
        iters=10) * 1e3, 3)

    def loss_f(t):
        return jnp.sum(fused_attention(t[0], t[1], t[2], keys_valid)
                       .astype(jnp.float32) ** 2)

    for grp in (4, 8, 16):
        os.environ["MRGCN_ATTN_GROUP"] = str(grp)
        try:
            out[f"fused_g{grp}_fwd_ms"] = round(per_iter_time(
                loss_f, (q, k, v), iters=10) * 1e3, 3)
            out[f"fused_g{grp}_fwd_bwd_ms"] = round(per_iter_time(
                lambda t: jax.value_and_grad(loss_f)(t), (q, k, v),
                iters=10) * 1e3, 3)
            a = jax.jit(loss_x)((q, k, v))
            b = jax.jit(loss_f)((q, k, v))
            out[f"fused_g{grp}_rel_diff"] = float(abs(a - b) / abs(a))
        except Exception as exc:
            out[f"fused_g{grp}_error"] = f"{type(exc).__name__}: {exc}"
    os.environ.pop("MRGCN_ATTN_GROUP", None)
    report("FINAL_CORE_AB", out)
    return out


def encoder_and_epoch(best_group):
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 256, (8_000, 128)).astype(np.int32)
    lengths = rng.integers(8, 129, 8_000)
    for i, ln in enumerate(lengths):
        toks[i, ln:] = 256
    tokens = jnp.asarray(toks)

    os.environ["MRGCN_ATTN_GROUP"] = str(best_group)
    out = {}
    for impl in ("plain_fused", "fused_core"):
        enc = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                          attn_impl=impl)
        params = enc.init(jax.random.PRNGKey(0), tokens)

        def loss(vv, t):
            return jnp.sum(enc.apply(vv, t) ** 2)

        out[f"enc_{impl}_fwd_bwd_ms"] = round(per_iter_time(
            lambda vv, t: jax.value_and_grad(loss)(vv, t), params, tokens,
            iters=8) * 1e3, 3)
    report("FINAL_ENC_CORE_AB", out)

    from benchmarks.bench_suite import bench_multimodal
    for impl, tag in ((None, "mm_epoch_default_s"),
                      ("fused_core", "mm_epoch_fused_core_s")):
        if impl is None:
            os.environ.pop("MRGCN_TEXT_ATTN", None)
        else:
            os.environ["MRGCN_TEXT_ATTN"] = impl
        try:
            report(tag, round(bench_multimodal(), 6))
        except Exception as exc:
            report(tag, f"{type(exc).__name__}: {exc}")
    os.environ.pop("MRGCN_TEXT_ATTN", None)
    os.environ.pop("MRGCN_ATTN_GROUP", None)


def guarded(name, fn, *a):
    try:
        return fn(*a)
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")
        return None


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    core = guarded("core_ab", core_ab) or {}
    best, best_t = 8, float("inf")
    for grp in (4, 8, 16):
        t = core.get(f"fused_g{grp}_fwd_bwd_ms")
        if isinstance(t, float) and t < best_t:
            best, best_t = grp, t
    guarded("encoder_and_epoch", encoder_and_epoch, best)
    print("FINAL_R4E", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
