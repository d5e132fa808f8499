"""One-shot TPU batch (round 4, shape coverage): the fused encoder
kernels at the OTHER production shape — L=512 tokens (configs cap
sequences at 512; the bench uses 128). Compile + time fwd+bwd for the
default kernel path vs the XLA chain, so a latent Mosaic shape issue
cannot first surface in a user run.

Run:  python benchmarks/tpu_batch_r4h.py  (fresh process only)
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


def long_seq():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    N, L = 2_000, 512
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 256, (N, L)).astype(np.int32)
    lengths = rng.integers(8, L + 1, N)
    for i, ln in enumerate(lengths):
        toks[i, ln:] = 256
    tokens = jnp.asarray(toks)

    out = {}
    for impl, mlp, tag in (("plain_fused", "0", "xla"),
                           ("fused_core", "fused", "kernels")):
        os.environ["MRGCN_TEXT_MLP"] = mlp
        enc = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                          max_len=L, attn_impl=impl)
        params = enc.init(jax.random.PRNGKey(0), tokens)

        def loss(v, t):
            return jnp.sum(enc.apply(v, t) ** 2)

        try:
            out[f"enc_L512_{tag}_fwd_bwd_ms"] = round(per_iter_time(
                lambda v, t: jax.value_and_grad(loss)(v, t), params,
                tokens, iters=6) * 1e3, 3)
        except Exception as exc:
            out[f"enc_L512_{tag}_error"] = f"{type(exc).__name__}: {exc}"
    os.environ.pop("MRGCN_TEXT_MLP", None)

    # numeric cross-check at L=512 on shared params
    os.environ["MRGCN_TEXT_MLP"] = "0"
    enc_x = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                        max_len=L, attn_impl="plain_fused")
    params = enc_x.init(jax.random.PRNGKey(0), tokens)
    a = jax.jit(lambda v, t: jnp.sum(enc_x.apply(v, t) ** 2))(params,
                                                              tokens)
    os.environ["MRGCN_TEXT_MLP"] = "fused"
    enc_k = TextEncoder(output_dim=16, num_heads=1, num_layers=2,
                        max_len=L, attn_impl="fused_core")
    b = jax.jit(lambda v, t: jnp.sum(enc_k.apply(v, t) ** 2))(params,
                                                              tokens)
    out["L512_rel_diff"] = float(abs(a - b) / abs(a))
    os.environ.pop("MRGCN_TEXT_MLP", None)
    report("FINAL_L512", out)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("long_seq", long_seq)
    print("FINAL_R4H", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
