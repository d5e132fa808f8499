"""Model-layer tests: RGCN stack and multimodal MRGCN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.models.mrgcn import MRGCN, module_names
from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock


def _edges(rng, n=10, R=3, E=60):
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    return EdgeBlock(src=jnp.asarray(src), dst=jnp.asarray(dst),
                     rel=jnp.asarray(rel), norm=jnp.asarray(norm),
                     num_out=n)


def test_featureless_rgcn_forward():
    rng = np.random.default_rng(0)
    n, R = 10, 3
    edges = _edges(rng, n, R)
    model = RGCN(hidden_dims=(8, 4), num_relations=R, num_nodes=n,
                 featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)
    out = model.apply(params, None, edges)
    assert out.shape == (n, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rgcn_with_bases_param_shapes():
    rng = np.random.default_rng(1)
    n, R, B = 10, 4, 2
    edges = _edges(rng, n, R)
    model = RGCN(hidden_dims=(8, 5), num_relations=R, num_nodes=n,
                 num_bases=B, featureless=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)
    p0 = params["params"]["layer_0"]
    # out=8 -> packed layout: 16 rows per 128-lane line; rows pre-padded to
    # the engine's 512-row table blocks (in-program pads are pathological
    # on TPU — see rspmm.packed_identity_shape)
    assert p0["weight_i_packed"].shape == (B, 512, 128)
    # padding rows/lanes are exactly zero (regularisation-neutral)
    w = np.asarray(p0["weight_i_packed"])
    assert np.all(w[:, -(-n // 16):, :] == 0)
    assert p0["comp_i"].shape == (R, B)
    p1 = params["params"]["layer_1"]
    assert p1["weight_f"].shape == (B, 8, 5)


def test_rgcn_shared_bases_weights():
    """shared_bases_weights=True reuses comp_i for the input layer's
    feature weights instead of a separate comp_f
    (reference: layers/graph.py:42-44)."""
    rng = np.random.default_rng(7)
    n, R, B = 10, 4, 2
    edges = _edges(rng, n, R)
    X = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))

    shared = RGCN(hidden_dims=(8, 5), num_relations=R, num_nodes=n,
                  num_bases=B, shared_bases_weights=True)
    p_shared = shared.init(jax.random.PRNGKey(0), X, edges)
    l0 = p_shared["params"]["layer_0"]
    assert "comp_i" in l0 and "comp_f" not in l0

    separate = RGCN(hidden_dims=(8, 5), num_relations=R, num_nodes=n,
                    num_bases=B)
    p_sep = separate.init(jax.random.PRNGKey(0), X, edges)
    assert "comp_f" in p_sep["params"]["layer_0"]

    out = shared.apply(p_shared, X, edges)
    assert out.shape == (n, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rgcn_link_prediction_relations():
    rng = np.random.default_rng(2)
    n, R = 8, 3
    edges = _edges(rng, n, R)
    model = RGCN(hidden_dims=(6, 6), num_relations=R, num_nodes=n,
                 featureless=True, link_prediction=True)
    params = model.init(jax.random.PRNGKey(0), None, edges)
    assert params["params"]["relations"].shape == (R, 6)


def test_node_dropout_train_vs_eval():
    rng = np.random.default_rng(3)
    n, R = 12, 2
    edges = _edges(rng, n, R)
    model = RGCN(hidden_dims=(4, 4), num_relations=R, num_nodes=n,
                 featureless=True, p_dropout=0.5)
    params = model.init(jax.random.PRNGKey(0), None, edges)
    eval1 = model.apply(params, None, edges, train=False)
    eval2 = model.apply(params, None, edges, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
    train_out = model.apply(params, None, edges, train=True,
                            rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(train_out), np.asarray(eval1))


MODULES_CONFIG = (
    ("xsd.numeric", (1, 4, 0.0)),
    ("xsd.gYear", (6, 2, 0.0)),
    ("xsd.string", (None, 8, 0.1)),
    ("ogc.wktLiteral", (9, 4, "S", 0.0)),
    ("blob.image", (None, {"mean": [0.5, 0.5, 0.5],
                           "std": [0.25, 0.25, 0.25]}, 4, 0.0)),
)


def _multimodal_inputs(rng, n):
    feats = {}
    names = module_names(MODULES_CONFIG)
    feats[names[0]] = (jnp.asarray(rng.random((5, 1)), dtype=jnp.float32),
                       jnp.asarray([0, 1, 2, 3, 4], dtype=jnp.int32))
    feats[names[1]] = (jnp.asarray(rng.random((3, 6)), dtype=jnp.float32),
                       jnp.asarray([2, 5, 7], dtype=jnp.int32))
    feats[names[2]] = (jnp.asarray(
        rng.integers(0, 259, (4, 16)), dtype=jnp.int32),
        jnp.asarray([1, 3, 5, 6], dtype=jnp.int32))
    feats[names[3]] = (jnp.asarray(rng.random((2, 9, 20)),
                                   dtype=jnp.float32),
                       jnp.asarray([0, 9], dtype=jnp.int32))
    feats[names[4]] = (jnp.asarray(
        rng.integers(0, 255, (2, 3, 32, 32)), dtype=jnp.uint8),
        jnp.asarray([4, 8], dtype=jnp.int32))
    return feats


def test_module_names_match_reference_scheme():
    names = module_names(MODULES_CONFIG)
    assert names == ("xsd_numeric_0", "xsd_gYear_0", "xsd_string_0",
                     "ogc_wktLiteral_0", "blob_image_0")


@pytest.mark.slow  # tiering: exhaustive pin, covered faster elsewhere in the quick loop
def test_mrgcn_multimodal_forward_and_gradients():
    """Forward shape/gates plus gradient flow to every encoder — one test
    so the expensive 5-encoder init+compile happens once (it dominated the
    quick tier at ~90 s as two tests)."""
    rng = np.random.default_rng(4)
    n, R = 10, 3
    edges = _edges(rng, n, R)
    model = MRGCN(hidden_dims=(16, 3), modules_config=MODULES_CONFIG,
                  num_relations=R, num_nodes=n)
    feats = _multimodal_inputs(rng, n)
    variables = model.init(jax.random.PRNGKey(0), feats, edges)
    out = model.apply(variables, feats, edges)
    assert out.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # gates exist, init 0.1 (reference: mrgcn.py:150-156)
    gates = variables["params"]["gate_weights"]
    np.testing.assert_allclose(np.asarray(gates), 0.1)
    assert gates.shape == (5,)

    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply({"params": p, **other}, feats, edges,
                             train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads["gate_weights"]).sum()) > 0
    for name in module_names(MODULES_CONFIG):
        leaf_sum = sum(float(jnp.abs(g).sum())
                       for g in jax.tree.leaves(grads[name]))
        assert leaf_sum > 0, f"no gradient reached encoder {name}"


def test_mrgcn_jit_compiles_once():
    rng = np.random.default_rng(6)
    n, R = 10, 3
    edges = _edges(rng, n, R)
    model = MRGCN(hidden_dims=(8, 2), modules_config=MODULES_CONFIG[:2],
                  num_relations=R, num_nodes=n)
    names = module_names(MODULES_CONFIG[:2])
    feats = {k: v for k, v in _multimodal_inputs(rng, n).items()
             if k in names}
    params = model.init(jax.random.PRNGKey(0), feats, edges)

    @jax.jit
    def fwd(p, f, e):
        return model.apply(p, f, e)

    out1 = fwd(params, feats, edges)
    out2 = fwd(params, feats, edges)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow  # tiering: exhaustive pin, covered faster elsewhere in the quick loop
def test_gate_zero_encoder_skip():
    """A zero-gated encoder is compiled out (smaller program) yet outputs
    stay identical (reference: mrgcn.py:263-268)."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mrgcn_tpu.models.mrgcn import MRGCN, module_names
    from mrgcn_tpu.models.rgcn import EdgeBlock
    from mrgcn_tpu.tasks import utils as tutils

    n = 12
    modules_config = (("xsd.numeric", (1, 4, 0.0)),
                      ("xsd.string", (None, 8, 0.0)))
    names = module_names(modules_config)
    rng = np.random.default_rng(0)
    features = {
        names[0]: (jnp.asarray(rng.random((6, 1)), dtype=jnp.float32),
                   jnp.asarray(np.arange(6), dtype=jnp.int32)),
        names[1]: (jnp.asarray(rng.integers(0, 259, (6, 10)),
                               dtype=jnp.int32),
                   jnp.asarray(np.arange(6), dtype=jnp.int32)),
    }
    loop = np.arange(n, dtype=np.int32)
    edges = EdgeBlock(src=jnp.asarray(loop), dst=jnp.asarray(loop),
                      rel=jnp.asarray(np.zeros(n, np.int32)),
                      norm=jnp.ones(n, dtype=jnp.float32), num_out=n)
    model = MRGCN(hidden_dims=(8, 3), modules_config=modules_config,
                  num_relations=1, num_nodes=n, num_bases=0)
    variables = model.init(jax.random.PRNGKey(0), features, edges)
    params = dict(variables["params"])
    params["gate_weights"] = jnp.asarray([0.0, 0.1])  # kill the MLP gate

    skipped = tutils.with_gate_skip(model, params)
    assert skipped.skip_encoders == (names[0],)

    vs = {**variables, "params": params}
    out_full = model.apply(vs, features, edges)
    out_skip = skipped.apply(vs, features, edges)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_skip),
                               rtol=1e-6, atol=1e-6)

    # the skipped program is strictly smaller (the encoder never runs)
    jaxpr_full = jax.make_jaxpr(
        lambda v: model.apply(v, features, edges))(vs)
    jaxpr_skip = jax.make_jaxpr(
        lambda v: skipped.apply(v, features, edges))(vs)
    assert len(jaxpr_skip.jaxpr.eqns) < len(jaxpr_full.jaxpr.eqns)

    # live gates: no-op
    params["gate_weights"] = jnp.asarray([0.1, 0.1])
    assert tutils.with_gate_skip(model, params) is model


def test_text_encoder_key_only_mask_matches_full_mask():
    """Key-side-only padding masks give the same pooled (CLS) output as the
    full query x key mask: valid positions can only observe valid keys
    either way. f32 body so the comparison is tight."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 250, (5, 12)).astype(np.int32)
    # ragged padding on the right
    for i, keep in enumerate([12, 7, 3, 9, 1]):
        tokens[i, keep:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=2, num_layers=2,
              max_len=12, dtype=jnp.float32)
    enc_key = TextEncoder(key_only_mask=True, **kw)
    enc_full = TextEncoder(key_only_mask=False, **kw)
    variables = enc_key.init(jax.random.PRNGKey(0), tokens)
    out_key = enc_key.apply(variables, tokens)
    out_full = enc_full.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(out_key), np.asarray(out_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # tiering: exhaustive pin, covered faster elsewhere in the quick loop
def test_text_encoder_one_hot_embed_matches_gather():
    """embed_impl='one_hot' (embedding matmul) and 'gather' (table lookup)
    are the same math; both directions must agree bitwise-closely in f32."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 250, (4, 10)).astype(np.int32)
    tokens[2, 6:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=2, num_layers=1,
              max_len=10, dtype=jnp.float32)
    enc_g = TextEncoder(embed_impl="gather", **kw)
    enc_o = TextEncoder(embed_impl="one_hot", **kw)
    variables = enc_g.init(jax.random.PRNGKey(0), tokens)

    out_g = enc_g.apply(variables, tokens)
    out_o = enc_o.apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_o),
                               rtol=1e-5, atol=1e-5)

    g_g = jax.grad(lambda v: jnp.sum(enc_g.apply(v, tokens)))(variables)
    g_o = jax.grad(lambda v: jnp.sum(enc_o.apply(v, tokens)))(variables)
    emb_g = np.asarray(g_g["params"]["embedding"])
    emb_o = np.asarray(g_o["params"]["embedding"])
    np.testing.assert_allclose(emb_g, emb_o, rtol=1e-4, atol=1e-5)


def test_text_encoder_plain_attention_matches_flax():
    """attn_impl='plain' (hand-rolled single-head attention on (N, L, d))
    computes the same function as the flax MultiHeadDotProductAttention
    path at num_heads=1 once its (d, h, dh) kernels are reshaped into the
    plain layout's (d, d) Dense kernels. f32 body for a tight check."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, 250, (5, 12)).astype(np.int32)
    for i, keep in enumerate([12, 7, 3, 9, 1]):
        tokens[i, keep:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=1, num_layers=2,
              max_len=12, dtype=jnp.float32)
    enc_flax = TextEncoder(attn_impl="xla", **kw)
    enc_plain = TextEncoder(attn_impl="plain", **kw)
    v_flax = enc_flax.init(jax.random.PRNGKey(0), tokens)

    # map the MHA params (kernels (d, 1, d) / out (1, d, d)) into the plain
    # layout's plain Dense (d, d) params
    d = kw["model_dim"]
    params = jax.tree_util.tree_map(lambda x: x, v_flax["params"])
    for i in range(kw["num_layers"]):
        blk = dict(params[f"_TextBlock_{i}"])
        mha = blk.pop("MultiHeadDotProductAttention_0")
        for name in ("query", "key", "value"):
            blk[name] = {"kernel": mha[name]["kernel"].reshape(d, d),
                         "bias": mha[name]["bias"].reshape(d)}
        blk["out"] = {"kernel": mha["out"]["kernel"].reshape(d, d),
                      "bias": mha["out"]["bias"]}
        params[f"_TextBlock_{i}"] = blk

    out_flax = enc_flax.apply(v_flax, tokens)
    out_plain = enc_plain.apply({"params": params}, tokens)
    np.testing.assert_allclose(np.asarray(out_flax), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_text_encoder_plain_fused_matches_plain():
    """attn_impl='plain_fused' (one (d, 3d) QKV matmul) computes the same
    function as 'plain' once the three (d, d) kernels are concatenated
    into the fused layout. f32 body for a tight check."""
    from mrgcn_tpu.models.encoders import TextEncoder

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, 250, (5, 12)).astype(np.int32)
    for i, keep in enumerate([12, 7, 3, 9, 1]):
        tokens[i, keep:] = 256
    tokens = jnp.asarray(tokens)

    kw = dict(output_dim=4, model_dim=16, num_heads=1, num_layers=2,
              max_len=12, dtype=jnp.float32)
    enc_plain = TextEncoder(attn_impl="plain", **kw)
    enc_fused = TextEncoder(attn_impl="plain_fused", **kw)
    v_plain = enc_plain.init(jax.random.PRNGKey(0), tokens)

    params = jax.tree_util.tree_map(lambda x: x, v_plain["params"])
    for i in range(kw["num_layers"]):
        blk = dict(params[f"_TextBlock_{i}"])
        kernels = [blk.pop(n) for n in ("query", "key", "value")]
        blk["qkv"] = {
            "kernel": jnp.concatenate([k["kernel"] for k in kernels],
                                      axis=1),
            "bias": jnp.concatenate([k["bias"] for k in kernels])}
        params[f"_TextBlock_{i}"] = blk

    out_plain = enc_plain.apply(v_plain, tokens)
    out_fused = enc_fused.apply({"params": params}, tokens)
    np.testing.assert_allclose(np.asarray(out_plain),
                               np.asarray(out_fused),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # tiering: exhaustive pin, covered faster elsewhere in the quick loop
def test_image_cnn_dense_blocks():
    """block_impl='dense' trains: forward shape, finite grads, param tree
    differs from the separable default (plain 3x3 convs, no depthwise)."""
    from mrgcn_tpu.models.encoders import ImageCNN

    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.random((3, 32, 32, 3)).astype(np.float32))

    enc = ImageCNN(output_dim=5, block_impl="dense")
    variables = enc.init(jax.random.PRNGKey(0), imgs)
    out = enc.apply(variables, imgs)
    assert out.shape == (3, 5)
    assert np.isfinite(np.asarray(out)).all()

    g = jax.grad(lambda v: jnp.sum(enc.apply(v, imgs)))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_text_encoder_rejects_unknown_attn_impl():
    """A typo'd MRGCN_TEXT_ATTN fails up front, not as an opaque
    checkpoint tree mismatch (the flax-MHA fallthrough it used to hit
    has a different param tree)."""
    import jax
    import jax.numpy as jnp
    import pytest
    from mrgcn_tpu.models.encoders import TextEncoder

    enc = TextEncoder(output_dim=4, attn_impl="fused")
    tokens = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="Unknown attn_impl"):
        enc.init(jax.random.PRNGKey(0), tokens)
