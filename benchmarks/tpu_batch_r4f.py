"""One-shot TPU experiment batch (round 4, sixth batch): the fused MLP
kernel (ops/fused_mlp.py) + the combined-kernels multimodal epoch.

  1. isolated MLP A/B at (1M, 128)x(128, 512): XLA chain vs fused
     kernel, fwd and fwd+bwd, ROW_BLOCK in {512, 1024, 2048}.
  2. full-encoder A/B: default vs MRGCN_TEXT_MLP=fused vs
     (fused MLP + fused_core attention).
  3. multimodal epoch for the winning combination.

Run:  python benchmarks/tpu_batch_r4f.py  (fresh process only)
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


def mlp_ab():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.ops import fused_mlp as fm

    M, d, hd = 1_024_000, 128, 512
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, hd)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(hd) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((hd, d)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.bfloat16)

    def loss_x(t):
        x, w1, b1, w2, b2 = t
        h = jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=True)
        out = jnp.dot(h, w2) + b2
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_f(t):
        return jnp.sum(fm.fused_mlp(*t).astype(jnp.float32) ** 2)

    args = (x, w1, b1, w2, b2)
    out = {}
    out["xla_fwd_ms"] = round(per_iter_time(loss_x, args,
                                            iters=10) * 1e3, 3)
    out["xla_fwd_bwd_ms"] = round(per_iter_time(
        lambda t: jax.value_and_grad(loss_x)(t), args, iters=10) * 1e3, 3)
    for rb in (512, 1024, 2048):
        fm.ROW_BLOCK = rb
        try:
            out[f"fused_rb{rb}_fwd_ms"] = round(per_iter_time(
                loss_f, args, iters=10) * 1e3, 3)
            out[f"fused_rb{rb}_fwd_bwd_ms"] = round(per_iter_time(
                lambda t: jax.value_and_grad(loss_f)(t), args,
                iters=10) * 1e3, 3)
            a = jax.jit(loss_x)(args)
            b = jax.jit(loss_f)(args)
            out[f"fused_rb{rb}_rel_diff"] = float(abs(a - b) / abs(a))
        except Exception as exc:
            out[f"fused_rb{rb}_error"] = f"{type(exc).__name__}: {exc}"
    fm.ROW_BLOCK = 1024
    report("FINAL_MLP_AB", out)
    return out


def encoder_and_epoch():
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

    out = {}
    for mlp, attn, tag in ((None, "plain_fused", "default"),
                           ("fused", "plain_fused", "fmlp"),
                           ("fused", "fused_core", "fmlp_fcore")):
        if mlp is None:
            os.environ.pop("MRGCN_TEXT_MLP", None)
        else:
            os.environ["MRGCN_TEXT_MLP"] = mlp
        enc = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                          attn_impl=attn)
        params = enc.init(jax.random.PRNGKey(0), tokens)

        def loss(vv, t):
            return jnp.sum(enc.apply(vv, t) ** 2)

        try:
            out[f"enc_{tag}_fwd_bwd_ms"] = round(per_iter_time(
                lambda vv, t: jax.value_and_grad(loss)(vv, t), params,
                tokens, iters=8) * 1e3, 3)
        except Exception as exc:
            out[f"enc_{tag}_error"] = f"{type(exc).__name__}: {exc}"
    os.environ.pop("MRGCN_TEXT_MLP", None)
    report("FINAL_ENC_COMBOS", out)

    from benchmarks.bench_suite import bench_multimodal
    for env, tag in ((dict(), "mm_epoch_default_s"),
                     (dict(MRGCN_TEXT_MLP="fused"), "mm_epoch_fmlp_s"),
                     (dict(MRGCN_TEXT_MLP="fused",
                           MRGCN_TEXT_ATTN="fused_core"),
                      "mm_epoch_fmlp_fcore_s")):
        for k in ("MRGCN_TEXT_MLP", "MRGCN_TEXT_ATTN"):
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            report(tag, round(bench_multimodal(), 6))
        except Exception as exc:
            report(tag, f"{type(exc).__name__}: {exc}")
    for k in ("MRGCN_TEXT_MLP", "MRGCN_TEXT_ATTN"):
        os.environ.pop(k, None)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("mlp_ab", mlp_ab)
    guarded("encoder_and_epoch", encoder_and_epoch)
    print("FINAL_R4F", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
