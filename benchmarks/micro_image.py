"""Image-encoder cost sweep on TPU: depthwise-separable vs dense convs.

micro_mm_attrib measured the in-model image share of the multimodal
backward at ~173 ms fwd+bwd for N=2k 64x64 images — single-digit MFU.
Depthwise convolutions (feature_group_count == channels) are the prime
suspect: their backward lowers to grouped transposed convolutions that
XLA:TPU executes far off the MXU's speed of light, and at width<=512
channels each depthwise MAC moves as many bytes as it computes.

Variants:
  * sep      — the shipped ImageCNN (depthwise separable blocks)
  * dense    — same stage plan with ordinary 3x3 convs (more FLOPs,
               every op an MXU matmul)
  * sep_f32  — separable with f32 compute (is bf16 hurting grouped convs?)

Run:  python benchmarks/micro_image.py
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
    from mrgcn_tpu.models.encoders import ImageCNN

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2_000, 64, 64, 3)).astype(np.float32))

    results = {}

    def report(name, seconds):
        results[name] = round(seconds * 1e3, 3)
        print(json.dumps({name: results[name]}), flush=True)

    variants = (
        ("sep", dict()),
        ("dense", dict(block_impl="dense")),
        ("sep_f32", dict(dtype=jnp.float32)),
    )
    for label, kw in variants:
        enc = ImageCNN(output_dim=16, **kw)
        variables = enc.init(jax.random.PRNGKey(0), imgs)
        report(f"{label}_fwd_ms", per_iter_time(
            lambda v: enc.apply(v, imgs), variables, iters=20))
        report(f"{label}_fwd_bwd_ms", per_iter_time(
            lambda v: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, imgs)))(v),
            variables, iters=20))

        # train mode: BatchNorm batch statistics + their backward — the
        # in-model regime (micro_mm_attrib runs train=True)
        params, stats = variables["params"], variables["batch_stats"]
        key = __import__("jax").random.PRNGKey(1)

        def train_loss(p, enc=enc, stats=stats, key=key):
            out, _ = enc.apply({"params": p, "batch_stats": stats}, imgs,
                               train=True, rngs={"dropout": key},
                               mutable=["batch_stats"])
            return jnp.sum(out)

        report(f"{label}_train_fwd_bwd_ms", per_iter_time(
            lambda p: jax.value_and_grad(train_loss)(p), params, iters=20))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
