"""Fused attention core (ops/attention.py): interpret-mode Pallas kernel
vs the plain XLA chain, at padded and unpadded shapes, fwd + grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrgcn_tpu.ops.attention import fused_attention, xla_attention


@pytest.mark.parametrize("N,L,d", [(16, 128, 128),   # exact kernel shape
                                   (11, 12, 16)])    # everything padded
def test_fused_attention_matches_xla(N, L, d):
    rng = np.random.default_rng(N + L)
    q = jnp.asarray(rng.standard_normal((N, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((N, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((N, L, d)).astype(np.float32))
    lengths = rng.integers(1, L + 1, N)
    keys_valid = jnp.asarray(
        np.arange(L)[None, :] < lengths[:, None])

    want = xla_attention(q, k, v, keys_valid)
    got = fused_attention(q, k, v, keys_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.standard_normal((N, L, d)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.vdot(xla_attention(q, k, v, keys_valid), cot)

    def loss_new(q, k, v):
        return jnp.vdot(fused_attention(q, k, v, keys_valid,
                                        interpret=True), cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # tiering: encoder-level pin; kernel oracle stays quick
def test_text_encoder_fused_core_matches_plain_fused(monkeypatch):
    """attn_impl='fused_core' (Pallas interpret) == 'plain_fused' on the
    same params (identical param tree: fused qkv + out Dense)."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 250, (5, 12)).astype(np.int32)
    for i, keep in enumerate([12, 7, 3, 9, 1]):
        tokens[i, keep:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=1, num_layers=2,
              max_len=12, dtype=jnp.float32)
    enc_pf = TextEncoder(attn_impl="plain_fused", **kw)
    enc_fc = TextEncoder(attn_impl="fused_core", **kw)
    variables = enc_pf.init(jax.random.PRNGKey(0), tokens)

    out_pf = enc_pf.apply(variables, tokens)
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    out_fc = enc_fc.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(out_pf), np.asarray(out_fc),
                               rtol=1e-5, atol=1e-5)

    g_pf = jax.grad(lambda v: jnp.sum(enc_pf.apply(v, tokens) ** 2)
                    )(variables)
    g_fc = jax.grad(lambda v: jnp.sum(enc_fc.apply(v, tokens) ** 2)
                    )(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_pf),
                    jax.tree_util.tree_leaves(g_fc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mlp_matches_plain():
    """ops/fused_mlp.py (interpret) == gelu-MLP chain, fwd + grads wrt
    x and all params, at padded (M not a block multiple) shape."""
    from mrgcn_tpu.ops.fused_mlp import fused_mlp

    rng = np.random.default_rng(3)
    M, d, hd = 37, 16, 64
    x = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hd)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(hd).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((hd, d)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))

    def ref(x, w1, b1, w2, b2):
        return jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2

    def loss_ref(*a):
        return jnp.vdot(ref(*a), cot)

    def loss_new(*a):
        return jnp.vdot(fused_mlp(*a, interpret=True), cot)

    want = ref(x, w1, b1, w2, b2)
    got = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_text_encoder_fused_mlp_flag_parity(monkeypatch):
    """MRGCN_TEXT_MLP=fused runs the same function on the SAME param tree
    (the _DenseParams holder reuses nn.Dense's names/inits)."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, 250, (5, 12)).astype(np.int32)
    for i, keep in enumerate([12, 7, 3, 9, 1]):
        tokens[i, keep:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=1, num_layers=2,
              max_len=12, dtype=jnp.float32)
    enc = TextEncoder(attn_impl="plain_fused", **kw)

    monkeypatch.setenv("MRGCN_TEXT_MLP", "0")   # stock nn.Dense pair
    variables = enc.init(jax.random.PRNGKey(0), tokens)
    out_plain = enc.apply(variables, tokens)
    g_plain = jax.grad(lambda v: jnp.sum(enc.apply(v, tokens) ** 2)
                       )(variables)

    monkeypatch.setenv("MRGCN_TEXT_MLP", "fused")
    monkeypatch.setenv("MRGCN_FORCE_PALLAS_GATHER", "1")
    variables_f = enc.init(jax.random.PRNGKey(0), tokens)
    assert jax.tree_util.tree_structure(variables_f) \
        == jax.tree_util.tree_structure(variables)
    out_fused = enc.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(out_plain),
                               np.asarray(out_fused),
                               rtol=1e-5, atol=1e-5)
    g_fused = jax.grad(lambda v: jnp.sum(enc.apply(v, tokens) ** 2)
                       )(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
