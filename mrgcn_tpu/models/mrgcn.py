"""MR-GCN: multimodal encoders fused with the R-GCN, one XLA program.

TPU re-design of reference: mrgcn/models/mrgcn.py:25-305. The reference
scatters per-modality computations across CPU/GPU devices by hand; here every
modality encoder, the gated fusion, and the graph convolutions trace into a
single jitted program — XLA fuses the scatter of encoder outputs into the
feature matrix with the first graph convolution's gather.

Module naming matches the reference (``xsd_numeric_0``, ...) so optimizer
parameter groups can key off the same datatype prefixes
(reference: mrgcn/tasks/utils.py:33-43).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mrgcn_tpu.models.encoders import MLP, TCNN, ImageCNN, TextEncoder
from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
from mrgcn_tpu.ops.placement import place_rows, place_rows_pre

# datatypes handled per encoder family (reference: mrgcn.py:63-124)
_MLP1 = ("xsd.boolean", "xsd.numeric")
_MLP2 = ("xsd.date", "xsd.dateTime", "xsd.gYear")
_TEXT = ("xsd.string", "xsd.anyURI")


def module_names(modules_config) -> Tuple[str, ...]:
    """Stable encoder instance names, one per encoding set, with per-family
    counters (reference: mrgcn.py:56-134)."""
    counters = {"num": 0, "temp": 0, "llm": 0, "img": 0, "geo": 0}
    names = []
    for datatype, _ in modules_config:
        if datatype in _MLP1:
            key = "num"
        elif datatype in _MLP2:
            key = "temp"
        elif datatype in _TEXT:
            key = "llm"
        elif datatype == "blob.image":
            key = "img"
        elif datatype == "ogc.wktLiteral":
            key = "geo"
        else:
            raise ValueError(f"Datatype not supported: {datatype}")
        names.append(f"{datatype.replace('.', '_')}_{counters[key]}")
        counters[key] += 1
    return tuple(names)


def modality_output_dim(modules_config) -> int:
    dims = []
    for datatype, args in modules_config:
        if datatype in _MLP1 + _MLP2:
            dims.append(args[1])
        elif datatype in _TEXT:
            dims.append(args[1])
        elif datatype == "ogc.wktLiteral":
            dims.append(args[1])
        elif datatype == "blob.image":
            dims.append(args[2])
    return sum(dims)


class MRGCN(nn.Module):
    """Gated multimodal encoders + R-GCN.

    ``modules_config`` is a static tuple of ``(datatype, args)`` mirroring
    the reference contract (reference: graph_features.py:182-238):

      * boolean/numeric/temporal: ``(feature_size, embedding_dim, dropout)``
      * string/anyURI:            ``(model_config, embedding_dim, dropout)``
      * wktLiteral:               ``(feature_size, embedding_dim, size, dropout)``
      * image:                    ``(model_config, transform_config,
                                     embedding_dim, dropout)``

    The forward takes ``features``: a dict keyed by encoder instance name of
    ``(data, node_idx)`` or ``(data, node_idx, rows)`` arrays — data is raw
    (uint8 images, int32 tokens, float32 otherwise); casting/normalisation
    happens inside the program (reference defers image normalisation too,
    mrgcn.py:286-292). ``rows`` is the optional host-precomputed placement
    inverse map (ops/placement.build_rows) that turns the per-step
    placement into a single gather.
    """

    hidden_dims: Tuple[int, ...]
    modules_config: Tuple
    num_relations: int
    num_nodes: int
    num_bases: int = 0
    p_dropout: float = 0.0
    featureless: bool = False
    use_bias: bool = False
    link_prediction: bool = False
    gated: bool = True
    text_vocab_size: int = 259
    text_pad_id: int = 256
    # encoders to skip entirely at apply time — the static analogue of the
    # reference's runtime gate ~= 0 short-circuit
    # (reference: mrgcn.py:263-268). Params are still created at init so
    # checkpoints stay structurally stable; task drivers rebuild the model
    # with the dead set when loaded gates are zero.
    skip_encoders: Tuple[str, ...] = ()
    # built for multi-chip mesh training. A pallas custom call carries no
    # GSPMD partitioning rule, so when ``mesh`` is provided the encoder
    # Pallas kernels (fused attention core / fused MLP) run inside
    # shard_map over the data axis (ops/attention.fused_attention_mesh,
    # ops/fused_mlp.fused_mlp_mesh) — same pattern as the R-GCN engine.
    # ``under_mesh`` without a mesh object keeps the conservative
    # XLA-equivalent paths. Explicit MRGCN_TEXT_{ATTN,MLP} win.
    under_mesh: bool = False
    mesh: Optional[object] = None
    # explicit text-attention impl for THIS model (checkpoint restore
    # passes the reconciled impl here); None falls back to the
    # MRGCN_TEXT_ATTN env var / 'auto'. Kept off os.environ so one
    # restored legacy checkpoint can't contaminate later builds in the
    # same process.
    text_attn_impl: Optional[str] = None

    def setup(self):
        encoders = {}
        dims = {}
        for name, (datatype, args) in zip(module_names(self.modules_config),
                                          self.modules_config):
            if datatype in _MLP1:
                _, dim_out, dropout = args
                encoders[name] = MLP(output_dim=dim_out, num_layers=1,
                                     p_dropout=dropout, name=name)
            elif datatype in _MLP2:
                _, dim_out, dropout = args
                encoders[name] = MLP(output_dim=dim_out, num_layers=2,
                                     p_dropout=dropout, name=name)
            elif datatype in _TEXT:
                model_cfg, dim_out, dropout = args
                backbone = None
                if model_cfg:
                    from mrgcn_tpu.models.pretrained import (
                        PretrainedTextEncoder, load_text_backbone)
                    backbone = load_text_backbone(model_cfg)
                if backbone is not None:
                    module, frozen_params = backbone
                    encoders[name] = PretrainedTextEncoder(
                        backbone=module, backbone_params=frozen_params,
                        output_dim=dim_out, p_dropout=dropout, name=name)
                else:
                    import os
                    encoders[name] = TextEncoder(
                        output_dim=dim_out, p_dropout=dropout,
                        vocab_size=self.text_vocab_size,
                        pad_id=self.text_pad_id,
                        # measured-variant override (equivalence pinned in
                        # tests/test_models.py): "plain"/"plain_fused"/
                        # "fused_core"/"flash"; "auto" resolves per
                        # TextEncoder's measured defaults
                        attn_impl=self.text_attn_impl
                        or os.environ.get("MRGCN_TEXT_ATTN", "auto"),
                        under_mesh=self.under_mesh, mesh=self.mesh,
                        name=name)
            elif datatype == "ogc.wktLiteral":
                _, dim_out, size, dropout = args
                encoders[name] = TCNN(output_dim=dim_out, size=size,
                                      p_dropout=dropout, name=name)
            elif datatype == "blob.image":
                model_cfg, transform_cfg, dim_out, dropout = args
                backbone = None
                if model_cfg:
                    from mrgcn_tpu.models.mobilenet import \
                        load_image_backbone
                    backbone = load_image_backbone(model_cfg)
                if backbone is not None:
                    from mrgcn_tpu.models.pretrained import \
                        PretrainedImageEncoder
                    module, variables = backbone
                    encoders[name] = PretrainedImageEncoder(
                        backbone=module, backbone_variables=variables,
                        output_dim=dim_out, p_dropout=dropout, name=name)
                else:
                    encoders[name] = ImageCNN(output_dim=dim_out,
                                              p_dropout=dropout, name=name)
            dims[name] = dim_out
        self.encoders = encoders
        self.encoder_dims = dims
        self.modality_dim = sum(dims.values())

        num_gates = len(self.modules_config)
        if self.gated and num_gates > 0:
            # gates start at 0.1, heavily damping every encoder's signal
            # (reference: mrgcn.py:150-156)
            self.gate_weights = self.param(
                "gate_weights",
                lambda key, shape: jnp.full(shape, 0.1, dtype=jnp.float32),
                (num_gates,))
        else:
            self.gate_weights = jnp.ones(num_gates, dtype=jnp.float32)

        self.rgcn = RGCN(hidden_dims=self.hidden_dims,
                         num_relations=self.num_relations,
                         num_nodes=self.num_nodes,
                         num_bases=self.num_bases,
                         p_dropout=self.p_dropout,
                         featureless=self.featureless,
                         use_bias=self.use_bias,
                         link_prediction=self.link_prediction,
                         name="rgcn")

    def _prepare(self, datatype: str, args, data: jnp.ndarray) -> jnp.ndarray:
        """Per-modality casting (reference: mrgcn.py:286-292)."""
        if datatype in _TEXT:
            return data.astype(jnp.int32)
        if datatype == "blob.image":
            _, transform_cfg, _, _ = args
            x = data.astype(jnp.float32)
            # normalise only when the config provides mean AND std — the
            # reference builds its Normalizer under the same condition
            # (reference: mrgcn.py:107-111)
            if "mean" in transform_cfg and "std" in transform_cfg:
                mean = jnp.asarray(transform_cfg["mean"],
                                   dtype=jnp.float32) * 255.0
                std = jnp.asarray(transform_cfg["std"],
                                  dtype=jnp.float32) * 255.0
                x = (x - mean[None, :, None, None]) \
                    / std[None, :, None, None]
            return jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        if datatype == "ogc.wktLiteral":
            return jnp.transpose(data.astype(jnp.float32), (0, 2, 1))
        return data.astype(jnp.float32)

    def compute_modality_embeddings(self, features: Dict, num_rows: int,
                                    train: bool = False) -> jnp.ndarray:
        """Encode every modality and place the gated outputs into a dense
        (num_rows, modality_dim) matrix (reference: mrgcn.py:250-305).

        Placement is gather-only (``ops.placement.place_rows``): XLA:TPU
        lowers a row scatter to a serial while loop over updates, which
        dominated the multimodal train step (~250-300 ms of a 488 ms
        step; see benchmarks/micro_mm_trace.py). Padded feature rows
        carry out-of-range indices and are dropped by the op."""
        cols = []
        names = module_names(self.modules_config)
        for i, (name, (datatype, args)) in enumerate(
                zip(names, self.modules_config)):
            dim = self.encoder_dims[name]
            entry = features.get(name)
            dead = name in self.skip_encoders and not self.is_initializing()
            if entry is None or entry[0].shape[0] == 0 or dead:
                # dead gate / absent modality: contribute nothing, compile
                # nothing (reference: mrgcn.py:263-268)
                cols.append(jnp.zeros((num_rows, dim), dtype=jnp.float32))
                continue
            data, node_idx, *pre = entry
            out = self.encoders[name](self._prepare(datatype, args, data),
                                      train=train)
            out = out * self.gate_weights[i]
            out = out.astype(jnp.float32)
            if pre:
                # host-precomputed inverse map (ops/placement.build_rows)
                cols.append(place_rows_pre(out, node_idx, pre[0]))
            else:
                cols.append(place_rows(out, node_idx, num_rows))
        if not cols:
            return jnp.zeros((num_rows, self.modality_dim),
                             dtype=jnp.float32)
        return jnp.concatenate(cols, axis=1)

    def __call__(self, features: Optional[Dict], edges: EdgeBlock,
                 train: bool = False) -> jnp.ndarray:
        X = None
        if not self.featureless:
            first = edges[0] if isinstance(edges, (tuple, list)) else edges
            num_rows = first.num_in if first.num_in is not None \
                else self.num_nodes
            X = self.compute_modality_embeddings(features or {}, num_rows,
                                                 train)
        return self.rgcn(X, edges, train=train)

    @property
    def relations(self):
        return self.rgcn.relations
