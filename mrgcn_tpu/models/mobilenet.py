"""MobileNetV2 feature extractor in flax + torch-checkpoint converter.

The v3.0 reference wraps a frozen torchvision MobileNetV2 as the image
backbone (reference: mrgcn/models/imagecnn.py:17-30, loaded via torch.hub in
mrgcn/models/utils.py:32-44). torchvision has no flax port and this
environment is zero-egress, so parity comes in two pieces:

  * :class:`MobileNetV2Features` — the feature extractor re-implemented in
    flax from the architecture spec (Sandler et al. 2018): stem conv 32/s2,
    17 inverted-residual blocks with expansion/depthwise/projection and the
    (t, c, n, s) plan below, head conv 1280, ReLU6 everywhere, BatchNorm in
    inference mode. The classifier is omitted — the reference strips it too
    (``stripClassifier``, models/utils.py:20-30).
  * :func:`convert_torch_state_dict` — maps a torchvision-format MobileNetV2
    checkpoint (``features.<i>...`` naming, OIHW conv kernels) onto the flax
    parameter tree, so any locally available ``mobilenet_v2-*.pth`` plugs in
    without torchvision installed.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)

# (expansion t, output channels c, repeats n, first stride s) —
# the MobileNetV2 block plan
INVERTED_RESIDUAL_PLAN = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
STEM_CHANNELS = 32
HEAD_CHANNELS = 1280


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _ConvBN(nn.Module):
    """Conv -> BatchNorm (inference) -> optional ReLU6. Explicit symmetric
    padding to match torch's ``padding=k//2`` exactly (flax "SAME" pads
    asymmetrically for even inputs with stride 2)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn")(x)
        return relu6(x) if self.act else x


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        hidden = in_feat * self.expand
        y = x
        if self.expand != 1:
            y = _ConvBN(hidden, kernel=1, name="expand")(y)
        y = _ConvBN(hidden, kernel=3, stride=self.stride, groups=hidden,
                    name="depthwise")(y)
        y = _ConvBN(self.features, kernel=1, act=False, name="project")(y)
        if self.stride == 1 and in_feat == self.features:
            y = x + y
        return y


class MobileNetV2Features(nn.Module):
    """Feature extractor: (N, H, W, 3) float -> (N, H/32, W/32, 1280)."""

    @nn.compact
    def __call__(self, x):
        x = _ConvBN(STEM_CHANNELS, kernel=3, stride=2, name="stem")(x)
        idx = 1
        for t, c, n, s in INVERTED_RESIDUAL_PLAN:
            for i in range(n):
                x = _InvertedResidual(c, s if i == 0 else 1, t,
                                      name=f"block_{idx}")(x)
                idx += 1
        return _ConvBN(HEAD_CHANNELS, kernel=1, name="head")(x)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW (depthwise: (C,1,H,W)) -> flax HWIO ((H,W,1,C) for
    depthwise with feature_group_count=C)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray]
                             ) -> Dict[str, Dict]:
    """torchvision MobileNetV2 state dict -> flax variables
    ``{"params": ..., "batch_stats": ...}`` for
    :class:`MobileNetV2Features`. Accepts torch tensors or numpy arrays;
    classifier entries are ignored (the reference strips the classifier)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("classifier") or k.endswith("num_batches_tracked"):
            continue
        sd[k] = np.asarray(getattr(v, "detach", lambda: v)().numpy()
                           if hasattr(v, "detach") else v, dtype=np.float32)

    params: Dict = {}
    stats: Dict = {}

    def put(flax_name: str, tconv: str, tbn: str):
        params[flax_name] = {
            "conv": {"kernel": jnp.asarray(_conv_kernel(sd[tconv]))},
            "bn": {"scale": jnp.asarray(sd[f"{tbn}.weight"]),
                   "bias": jnp.asarray(sd[f"{tbn}.bias"])},
        }
        stats[flax_name] = {
            "bn": {"mean": jnp.asarray(sd[f"{tbn}.running_mean"]),
                   "var": jnp.asarray(sd[f"{tbn}.running_var"])},
        }

    put("stem", "features.0.0.weight", "features.0.1")

    idx = 1
    for t, c, n, s in INVERTED_RESIDUAL_PLAN:
        for _ in range(n):
            base = f"features.{idx}.conv"
            block: Dict = {}
            block_stats: Dict = {}

            def bput(sub: str, tconv: str, tbn: str):
                block[sub] = {
                    "conv": {"kernel": jnp.asarray(_conv_kernel(sd[tconv]))},
                    "bn": {"scale": jnp.asarray(sd[f"{tbn}.weight"]),
                           "bias": jnp.asarray(sd[f"{tbn}.bias"])}}
                block_stats[sub] = {
                    "bn": {"mean": jnp.asarray(sd[f"{tbn}.running_mean"]),
                           "var": jnp.asarray(sd[f"{tbn}.running_var"])}}

            if t == 1:  # no expansion: conv.0 = depthwise, conv.1/2 proj
                bput("depthwise", f"{base}.0.0.weight", f"{base}.0.1")
                bput("project", f"{base}.1.weight", f"{base}.2")
            else:       # conv.0 expand, conv.1 depthwise, conv.2/3 proj
                bput("expand", f"{base}.0.0.weight", f"{base}.0.1")
                bput("depthwise", f"{base}.1.0.weight", f"{base}.1.1")
                bput("project", f"{base}.2.weight", f"{base}.3")

            params[f"block_{idx}"] = block
            stats[f"block_{idx}"] = block_stats
            idx += 1

    put("head", f"features.{idx}.0.weight", f"features.{idx}.1")
    return {"params": params, "batch_stats": stats}


def find_local_checkpoint() -> Tuple[str, None] | None:
    """Locate a MobileNetV2 torch checkpoint without network access:
    ``MRGCN_VISION_WEIGHTS`` env var, then the torch.hub cache."""
    import glob
    import os
    explicit = os.environ.get("MRGCN_VISION_WEIGHTS")
    if explicit and os.path.exists(explicit):
        return explicit
    hub = os.environ.get("TORCH_HOME",
                         os.path.expanduser("~/.cache/torch"))
    hits = sorted(glob.glob(os.path.join(hub, "hub", "checkpoints",
                                         "*mobilenet_v2*.pth")))
    return hits[0] if hits else None


def load_image_backbone(hub_spec) -> Tuple[nn.Module, Dict] | None:
    """(flax module, variables) for a locally available MobileNetV2 torch
    checkpoint, else None (compact trainable ImageCNN is used instead)."""
    path = find_local_checkpoint()
    if path is None:
        logger.info("No local MobileNetV2 checkpoint; using the "
                    "from-scratch image CNN")
        return None
    try:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        variables = convert_torch_state_dict(sd)
        logger.info("Using pretrained image backbone %s (frozen)", path)
        return MobileNetV2Features(), variables
    except Exception as exc:  # pragma: no cover - defensive
        logger.warning("Failed to load %s (%s); using the from-scratch "
                       "image CNN", path, exc)
        return None
