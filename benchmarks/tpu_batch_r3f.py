"""Round-3 TPU batch F: restricted output layer + LP corruption cost +
text-encoder variants.

Queued experiments (one TPU grant, every experiment guarded):

  1. bench_headline      -> headline epoch with the restricted output layer
                            (the NC driver's new default) vs the full
                            program (MRGCN_RESTRICT_OUT=0)
  2. lp_corruption       -> cost of the in-jit distinct-row corruption
                            (argsort of 272k keys) vs cheap alternatives
  3. grouped_dW          -> the relation-grouped path's weight-gradient
                            cost at NC and LP scales (the r3e comparison
                            measured only the H gradient)
  4. text_variants       -> head count x attention impl sweep + gelu
                            variants for the MLP-backward wall
  5. mlp_hlo             -> optimized-HLO op histogram for the MLP block
                            backward (23x fwd->bwd ratio smells like the
                            compose layout story)

Run:  python benchmarks/tpu_batch_r3f.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def _report(results, name, seconds):
    results[name] = round(seconds * 1e3, 3)
    print(json.dumps({name: results[name]}), flush=True)


def bench_headline():
    from bench import run_jax_epochs
    from benchmarks.torch_baseline import build_workload

    w = build_workload()
    results = {}
    os.environ["MRGCN_RESTRICT_OUT"] = "1"
    results["epoch_restricted_s"] = round(run_jax_epochs(w, steps=10), 6)
    print(json.dumps({"epoch_restricted_s": results["epoch_restricted_s"]}),
          flush=True)
    os.environ["MRGCN_RESTRICT_OUT"] = "0"
    results["epoch_full_s"] = round(run_jax_epochs(w, steps=10), 6)
    print(json.dumps({"epoch_full_s": results["epoch_full_s"]}), flush=True)
    os.environ["MRGCN_RESTRICT_OUT"] = "1"
    print("FINAL_HEADLINE " + json.dumps(results), flush=True)


def lp_corruption():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time

    M = 272_384                   # bucket-padded FB15k-237 train size
    ncp = M // 5
    num_triples = 272_115
    data = jnp.asarray(
        np.random.default_rng(0).integers(0, 14_541, (M, 3)), jnp.int32)
    results = {}

    def argsort_pick(rng):
        key = jax.random.uniform(rng, (M,)) \
            + (jnp.arange(M) >= num_triples) * 10.0
        pick = jnp.argsort(key)[:ncp]
        return data[pick]

    def topk_pick(rng):
        key = jax.random.uniform(rng, (M,)) \
            - (jnp.arange(M) >= num_triples) * 10.0
        _, pick = jax.lax.top_k(key, ncp)
        return data[pick]

    def replace_pick(rng):
        pick = jax.random.randint(rng, (ncp,), 0, num_triples)
        return data[pick]

    def window_pick(rng):
        # distinct rows via a random arithmetic progression: stride drawn
        # from odd values (M even -> coprime), offset uniform
        k1, k2 = jax.random.split(rng)
        stride = jax.random.randint(k1, (), 0, M // 2) * 2 + 1
        offset = jax.random.randint(k2, (), 0, M)
        pick = (offset + jnp.arange(ncp) * stride) % M
        return data[pick]

    key = jax.random.PRNGKey(0)
    for name, fn in (("argsort", argsort_pick), ("topk", topk_pick),
                     ("replace", replace_pick), ("window", window_pick)):
        _report(results, f"corrupt_{name}_ms",
                per_iter_time(fn, key, iters=20))

    print("FINAL_CORRUPT " + json.dumps(results), flush=True)


def grouped_dW():
    import jax
    import jax.numpy as jnp

    from benchmarks.bench_suite import lp_workload
    from benchmarks.timing import per_iter_time
    from benchmarks.torch_baseline import build_workload
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import rspmm

    results = {}
    for label, w, hidden, out in (
            ("nc", build_workload(), 16, 14),
            ("lp", lp_workload(), 200, 200)):
        n, R = w["n"], w["R"]
        rng = np.random.default_rng(5)
        H = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
        W = jnp.asarray(rng.standard_normal((R, hidden, out)) * 0.1,
                        jnp.float32)
        g = group_by_relation(np.asarray(w["src"], np.int32),
                              np.asarray(w["dst"], np.int32),
                              np.asarray(w["rel"], np.int32),
                              np.asarray(w["norm"], np.float32), n)
        args = (jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.norm),
                jnp.asarray(g.group_rel), g.group_size, n)

        def loss_w(v, H=H, args=args):
            return jnp.sum(rspmm.transform_aggregate_grouped(
                H, *args, v) ** 2)

        def loss_hw(hv, W=W, args=args):
            return jnp.sum(rspmm.transform_aggregate_grouped(
                hv[0], *args, hv[1]) ** 2)

        _report(results, f"{label}_grouped_dW_ms", per_iter_time(
            lambda v: jax.value_and_grad(loss_w)(v), W, iters=10))
        _report(results, f"{label}_grouped_dHW_ms", per_iter_time(
            lambda hv: jax.value_and_grad(loss_hw)(hv), (H, W), iters=10))

    print("FINAL_GROUPED_DW " + json.dumps(results), flush=True)


def _tokens(n=8_000, L=128, seed=0):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 256, (n, L)).astype(np.int32)
    lengths = rng.integers(8, L + 1, n)
    for i, ln in enumerate(lengths):
        toks[i, ln:] = 256
    return toks


def text_variants():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.models.encoders import TextEncoder

    tokens = jnp.asarray(_tokens())
    results = {}

    for heads, impl in ((1, "xla"), (1, "flash"), (2, "xla"), (2, "flash")):
        enc = TextEncoder(output_dim=16, num_heads=heads, attn_impl=impl)
        v = enc.init(jax.random.PRNGKey(0), tokens)
        _report(results, f"enc_h{heads}_{impl}_fwd_bwd_ms", per_iter_time(
            lambda p, enc=enc: jax.value_and_grad(
                lambda q: jnp.sum(enc.apply(q, tokens)))(p), v, iters=20))

    print("FINAL_TEXT_VARIANTS " + json.dumps(results), flush=True)


def mlp_variants():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from benchmarks.timing import per_iter_time

    N, L, d = 8_000, 128, 128
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N, L, d)), jnp.bfloat16)
    results = {}

    def make_block(act, dtype):
        class Blk(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.LayerNorm(dtype=dtype)(x.astype(dtype))
                y = nn.Dense(4 * d, dtype=dtype)(y)
                y = act(y)
                y = nn.Dense(d, dtype=dtype)(y)
                return x.astype(dtype) + y
        return Blk()

    import functools
    variants = {
        "gelu_exact_bf16": make_block(nn.gelu, jnp.bfloat16),
        "gelu_tanh_bf16": make_block(
            functools.partial(nn.gelu, approximate=True), jnp.bfloat16),
        "relu_bf16": make_block(nn.relu, jnp.bfloat16),
        "gelu_exact_f32": make_block(nn.gelu, jnp.float32),
    }
    for name, mod in variants.items():
        v = mod.init(jax.random.PRNGKey(0), x0)
        _report(results, f"mlp_{name}_fwd_ms", per_iter_time(
            lambda p, mod=mod: mod.apply(p, x0), v, iters=20))
        _report(results, f"mlp_{name}_fwd_bwd_ms", per_iter_time(
            lambda p, mod=mod: jax.value_and_grad(
                lambda q: jnp.sum(mod.apply(q, x0)
                                  .astype(jnp.float32)))(p), v, iters=20))

    print("FINAL_MLP_VARIANTS " + json.dumps(results), flush=True)


def mlp_hlo():
    """Optimized-HLO op histogram for the MLP block backward: what ops,
    how many bytes, any physical copies/transposes/converts."""
    import re

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    N, L, d = 8_000, 128, 128
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N, L, d)), jnp.bfloat16)

    class MlpBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            y = nn.Dense(4 * d, dtype=jnp.bfloat16)(y)
            y = nn.gelu(y)
            y = nn.Dense(d, dtype=jnp.bfloat16)(y)
            return x + y

    mod = MlpBlock()
    v = mod.init(jax.random.PRNGKey(0), x0)

    def fwd_bwd(p):
        return jax.value_and_grad(
            lambda q: jnp.sum(mod.apply(q, x0).astype(jnp.float32)))(p)

    txt = jax.jit(fwd_bwd).lower(v).compile().as_text()
    out_path = "/root/repo/docs/hlo_mlp_bwd.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    # histogram of top-level fusion kinds and any copy/transpose ops
    ops = re.findall(r"= (?:\(.*?\)|\S+?) (\w+)\(", txt)
    from collections import Counter
    hist = Counter(ops)
    print("HLO op histogram:", dict(hist.most_common(20)), flush=True)
    copies = [ln.strip()[:200] for ln in txt.splitlines()
              if re.search(r"= \S+ (copy|transpose)\(", ln)]
    print(f"copy/transpose ops: {len(copies)}", flush=True)
    for ln in copies[:20]:
        print("  " + ln, flush=True)
    print(f"full HLO written to {out_path} ({len(txt)} bytes)", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== headline: restricted vs full output layer =====",
          flush=True)
    guarded("bench_headline", bench_headline)

    print("\n===== LP corruption cost =====", flush=True)
    guarded("lp_corruption", lp_corruption)

    print("\n===== grouped dW =====", flush=True)
    guarded("grouped_dW", grouped_dW)

    print("\n===== text encoder variants =====", flush=True)
    guarded("text_variants", text_variants)

    print("\n===== MLP block variants =====", flush=True)
    guarded("mlp_variants", mlp_variants)

    print("\n===== MLP backward HLO =====", flush=True)
    guarded("mlp_hlo", mlp_hlo)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
