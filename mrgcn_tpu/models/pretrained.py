"""Pretrained-backbone loading (v3.0 reference behaviour, offline-gated).

The v3.0 reference pulls frozen DistilBERT / MobileNetV2 from torch.hub
(reference: mrgcn/models/utils.py:32-44, mrgcn/models/mrgcn.py:83-111). In a
zero-egress TPU environment those downloads fail, so:

  * when the configured HF language model is available in the *local* cache,
    :func:`load_text_backbone` returns its flax module + frozen params and
    the MRGCN uses :class:`PretrainedTextEncoder` (CLS pooling + trainable
    pre_fc/fc head, mirroring reference: mrgcn/models/transformer.py);
  * otherwise the from-scratch :class:`~mrgcn_tpu.models.encoders.TextEncoder`
    is used — the v2.0 paper-parity design;
  * when a torchvision-format MobileNetV2 checkpoint is available locally,
    :func:`mrgcn_tpu.models.mobilenet.load_image_backbone` converts it and
    the MRGCN wraps it in :class:`PretrainedImageEncoder` (frozen backbone +
    trainable fc head, mirroring reference: mrgcn/models/imagecnn.py);
    otherwise the compact trainable ImageCNN is used (logged once). The
    wiring lives in models/mrgcn.py (setup of the blob.image encoder).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mrgcn_tpu.models import init as tinit

logger = logging.getLogger(__name__)


def hub_model_name(hub_spec) -> Optional[str]:
    """Extract the model name from a torch.hub-style spec list
    (reference: models/utils.py:32-44): the last positional entry."""
    if not hub_spec:
        return None
    return next((s for s in reversed(hub_spec)
                 if isinstance(s, str) and "=" not in s), None)


from mrgcn_tpu.utils.hf import force_hf_offline as _force_hf_offline


def load_text_backbone(hub_spec) -> Optional[Tuple]:
    """(flax module, frozen params) for a locally cached HF LM, else None."""
    name = hub_model_name(hub_spec)
    if name is None:
        return None
    try:
        _force_hf_offline()
        from transformers import FlaxAutoModel
        model = FlaxAutoModel.from_pretrained(name, local_files_only=True)
        logger.info("Using pretrained language model %s (frozen)", name)
        return model.module, model.params
    except Exception:
        logger.info("Pretrained LM %s unavailable locally; using the "
                    "from-scratch text encoder", name)
        return None


class PretrainedImageEncoder(nn.Module):
    """Frozen pretrained vision backbone + trainable head: global average
    pool -> pre_fc -> ReLU -> dropout -> fc
    (reference: mrgcn/models/imagecnn.py:9-41).

    ``backbone_variables`` (params + batch_stats) are stored as constants —
    the reference freezes the base model too (imagecnn.py:17-19) — so only
    the head trains. Input: (N, H, W, C) float32, already normalised.
    """

    backbone: nn.Module
    backbone_variables: dict
    output_dim: int
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone.apply(self.backbone_variables, x)
        pooled = jnp.mean(feats, axis=(1, 2))   # AdaptiveAvgPool2d(1)
        inter = pooled.shape[-1]
        pooled = nn.Dense(inter,
                          kernel_init=tinit.torch_linear_kernel())(pooled)
        pooled = nn.relu(pooled)
        pooled = nn.Dropout(self.p_dropout, deterministic=not train)(pooled)
        return nn.Dense(self.output_dim,
                        kernel_init=tinit.torch_linear_kernel())(pooled)


class PretrainedTextEncoder(nn.Module):
    """Frozen pretrained LM + trainable head: CLS pooling -> pre_fc -> ReLU
    -> dropout -> fc (reference: mrgcn/models/transformer.py:17-38).

    ``backbone_params`` are stored as constants (frozen — the reference
    freezes the base model too, transformer.py:17-19), so only the head
    trains.
    """

    backbone: nn.Module
    backbone_params: dict
    output_dim: int
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        attention_mask = (tokens > 0).astype("i4")
        hidden = self.backbone.apply(
            {"params": self.backbone_params}, input_ids=tokens,
            attention_mask=attention_mask)[0]   # (N, L, D)
        pooled = hidden[:, 0]
        inter = pooled.shape[-1]
        pooled = nn.Dense(inter,
                          kernel_init=tinit.torch_linear_kernel())(pooled)
        pooled = nn.relu(pooled)
        pooled = nn.Dropout(self.p_dropout, deterministic=not train)(pooled)
        return nn.Dense(self.output_dim,
                        kernel_init=tinit.torch_linear_kernel())(pooled)
