"""Pretrained-backbone parity tests (no network needed).

* MobileNetV2: a minimal torch implementation (built here from the
  architecture spec, with torchvision's state-dict naming) provides both a
  randomly initialised checkpoint and a reference forward; the flax
  re-implementation + converter must reproduce it numerically.
* Text: a tiny randomly initialised flax DistilBERT saved to a temp dir
  exercises ``load_text_backbone`` + ``PretrainedTextEncoder`` end to end.
"""


import pytest as _pytest

# tiering: exhaustive engine/backbone pins run in the slow tier;
# the quick edit-test loop keeps driver-level coverage of the
# same paths (test_mesh_training quick subset, test_models)
pytestmark = _pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from mrgcn_tpu.models import mobilenet  # noqa: E402


# --------------------------------------------------------------------------
# minimal torch MobileNetV2 (torchvision state-dict naming, from the paper
# spec — torchvision itself is not installed in this environment)
# --------------------------------------------------------------------------

def conv_bn(inp, out, kernel, stride, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, out, kernel, stride, kernel // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(out),
        tnn.ReLU6(inplace=True))


class TorchInvertedResidual(tnn.Module):
    def __init__(self, inp, out, stride, expand):
        super().__init__()
        hidden = inp * expand
        self.use_res = stride == 1 and inp == out
        layers = []
        if expand != 1:
            layers.append(conv_bn(inp, hidden, 1, 1))
        layers.append(conv_bn(hidden, hidden, 3, stride, groups=hidden))
        layers.append(tnn.Conv2d(hidden, out, 1, 1, 0, bias=False))
        layers.append(tnn.BatchNorm2d(out))
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class TorchMobileNetV2(tnn.Module):
    def __init__(self):
        super().__init__()
        feats = [conv_bn(3, mobilenet.STEM_CHANNELS, 3, 2)]
        inp = mobilenet.STEM_CHANNELS
        for t, c, n, s in mobilenet.INVERTED_RESIDUAL_PLAN:
            for i in range(n):
                feats.append(TorchInvertedResidual(
                    inp, c, s if i == 0 else 1, t))
                inp = c
        feats.append(conv_bn(inp, mobilenet.HEAD_CHANNELS, 1, 1))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(
            tnn.Dropout(0.2), tnn.Linear(mobilenet.HEAD_CHANNELS, 1000))

    def forward(self, x):
        return self.features(x)  # classifier stripped, like the reference


@pytest.fixture(scope="module")
def torch_mnv2():
    torch.manual_seed(0)
    model = TorchMobileNetV2()
    # non-trivial running stats so BN conversion is actually exercised
    with torch.no_grad():
        model.train()
        model(torch.randn(2, 3, 64, 64))
    model.eval()
    return model


def test_state_dict_names_match_torchvision_format(torch_mnv2):
    names = set(torch_mnv2.state_dict().keys())
    # spot-check the exact names the converter expects
    for expected in ["features.0.0.weight", "features.0.1.running_mean",
                     "features.1.conv.0.0.weight",
                     "features.1.conv.1.weight", "features.1.conv.2.bias",
                     "features.2.conv.0.0.weight",
                     "features.2.conv.1.0.weight",
                     "features.2.conv.2.weight", "features.2.conv.3.weight",
                     "features.18.0.weight", "classifier.1.weight"]:
        assert expected in names, expected


def test_convert_and_forward_parity(torch_mnv2):
    variables = mobilenet.convert_torch_state_dict(torch_mnv2.state_dict())
    x = np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)).astype(np.float32)

    flax_out = mobilenet.MobileNetV2Features().apply(
        variables, jnp.asarray(x))
    with torch.no_grad():
        torch_out = torch_mnv2(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    torch_out = np.transpose(torch_out.numpy(), (0, 2, 3, 1))

    assert flax_out.shape == torch_out.shape == (2, 1, 1, 1280)
    np.testing.assert_allclose(np.asarray(flax_out), torch_out,
                               rtol=2e-4, atol=2e-4)


def test_pretrained_image_encoder_trains_head_only(torch_mnv2, tmp_path,
                                                   monkeypatch):
    torch.save(torch_mnv2.state_dict(), tmp_path / "mobilenet_v2-test.pth")
    monkeypatch.setenv("MRGCN_VISION_WEIGHTS",
                       str(tmp_path / "mobilenet_v2-test.pth"))

    loaded = mobilenet.load_image_backbone(["pytorch/vision", "mobilenet_v2"])
    assert loaded is not None
    module, variables = loaded

    from mrgcn_tpu.models.pretrained import PretrainedImageEncoder
    enc = PretrainedImageEncoder(backbone=module,
                                 backbone_variables=variables,
                                 output_dim=8)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (3, 32, 32, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    out = enc.apply({"params": params}, x)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # only the 2-layer head is trainable: pre_fc + fc kernels and biases
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 4
    # gradients flow through the frozen backbone into the head only
    g = jax.grad(lambda p: jnp.sum(enc.apply({"params": p}, x) ** 2))(params)
    assert all(float(jnp.max(jnp.abs(leaf))) > 0
               for leaf in jax.tree_util.tree_leaves(g))


def test_mrgcn_uses_pretrained_image_backbone(torch_mnv2, tmp_path,
                                              monkeypatch):
    """modules_config with a model spec routes images through the frozen
    backbone when a checkpoint is available locally."""
    torch.save(torch_mnv2.state_dict(), tmp_path / "mobilenet_v2-test.pth")
    monkeypatch.setenv("MRGCN_VISION_WEIGHTS",
                       str(tmp_path / "mobilenet_v2-test.pth"))

    from mrgcn_tpu.models.mrgcn import MRGCN, module_names
    from mrgcn_tpu.models.rgcn import EdgeBlock

    n = 16
    rng = np.random.default_rng(3)
    modules_config = (("blob.image", (["pytorch/vision", "mobilenet_v2"],
                                      {}, 4, 0.0)),)
    name = module_names(modules_config)[0]
    features = {name: (jnp.asarray(rng.integers(0, 255, (4, 3, 32, 32)),
                                   dtype=jnp.uint8),
                       jnp.asarray(np.arange(4), dtype=jnp.int32))}
    edges = EdgeBlock(src=jnp.asarray(np.arange(n, dtype=np.int32)),
                      dst=jnp.asarray(np.arange(n, dtype=np.int32)),
                      rel=jnp.asarray(np.zeros(n, dtype=np.int32)),
                      norm=jnp.ones(n, dtype=jnp.float32), num_out=n)
    model = MRGCN(hidden_dims=(8, 3), modules_config=modules_config,
                  num_relations=1, num_nodes=n, num_bases=0)
    variables = model.init(jax.random.PRNGKey(0), features, edges)
    out = model.apply(variables, features, edges)
    assert out.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # the frozen backbone contributes no trainable parameters
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    assert not any("backbone" in jax.tree_util.keystr(path).lower()
                   for path, _ in flat)


def test_pretrained_text_encoder_with_local_flax_lm(tmp_path):
    transformers = pytest.importorskip("transformers")
    from transformers import DistilBertConfig, FlaxDistilBertModel

    cfg = DistilBertConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                           hidden_dim=64, max_position_embeddings=64)
    lm = FlaxDistilBertModel(cfg, seed=0)
    lm.save_pretrained(str(tmp_path / "tiny-lm"))

    from mrgcn_tpu.models.pretrained import (PretrainedTextEncoder,
                                             load_text_backbone)
    loaded = load_text_backbone([str(tmp_path / "tiny-lm")])
    assert loaded is not None, "locally saved LM must load offline"
    module, frozen = loaded

    enc = PretrainedTextEncoder(backbone=module, backbone_params=frozen,
                                output_dim=6)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(1, 64, (5, 12)), dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), tokens)["params"]
    out = enc.apply({"params": params}, tokens)
    assert out.shape == (5, 6)
    assert np.all(np.isfinite(np.asarray(out)))
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 4  # trainable head only


def test_load_text_backbone_absent_returns_none():
    from mrgcn_tpu.models.pretrained import load_text_backbone
    assert load_text_backbone(["distilbert-base-nonexistent-xyz"]) is None
    assert load_text_backbone([]) is None
