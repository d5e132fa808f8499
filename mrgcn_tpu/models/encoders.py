"""Modality encoders: MLP, temporal CNN, text encoder, image CNN.

Functional re-designs of the reference encoder wrappers
(reference: mrgcn/models/{perceptron,temporal_cnn,transformer,imagecnn}.py).
The reference v3.0 wraps *frozen pretrained* DistilBERT / MobileNetV2 from
torch.hub; in an offline TPU environment pretrained weights are unavailable,
so the sequence/image encoders here are compact trainable networks — the
v2.0 paper-parity design — exposing the same head structure
(pre_fc -> ReLU -> dropout -> fc) so pretrained backbones can be slotted in
when locally cached.

All modules are flax.linen, NHWC/NLC layouts (TPU-native), and statically
shaped.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrgcn_tpu.models import init as tinit

# recognised TextEncoder attention implementations; anything else (e.g. a
# typo'd MRGCN_TEXT_ATTN) is rejected up front — an unknown value used to
# fall through to the flax MHA branch, whose DIFFERENT param tree surfaces
# as an opaque checkpoint tree-mismatch far from the cause
ATTN_IMPLS = ("auto", "xla", "flash", "plain", "plain_fused", "fused_core")

# TCNN input-length classes (reference: temporal_cnn.py:7-9; note size M
# uses LENGTH_L as its minimal input length, reference: temporal_cnn.py:57)
TCNN_LENGTH_S = 20
TCNN_LENGTH_M = 100
TCNN_LENGTH_L = 300
TCNN_MINIMAL_LENGTH = {"S": TCNN_LENGTH_S, "M": TCNN_LENGTH_L,
                       "L": TCNN_LENGTH_L}


class MLP(nn.Module):
    """N-layer perceptron with linearly interpolated widths; every layer is
    Dense -> Dropout -> ReLU (incl. the last), params init U(0, 1)
    (reference: perceptron.py:6-46)."""

    output_dim: int
    num_layers: int = 1
    p_dropout: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        input_dim = x.shape[-1]
        step = (input_dim - self.output_dim) // self.num_layers
        hidden = [self.output_dim + i * step
                  for i in reversed(range(self.num_layers))]
        for width in hidden:
            x = nn.Dense(width, use_bias=self.use_bias,
                         kernel_init=tinit.unit_uniform(),
                         bias_init=tinit.unit_uniform())(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
            x = nn.relu(x)
        return x


def adaptive_max_pool1d(x: jnp.ndarray, output_size: int) -> jnp.ndarray:
    """torch ``AdaptiveMaxPool1d`` over the length axis of (N, L, C):
    window i spans [floor(i*L/k), ceil((i+1)*L/k))."""
    L = x.shape[1]
    cols = []
    for i in range(output_size):
        lo = (i * L) // output_size
        hi = -(-((i + 1) * L) // output_size)
        cols.append(jnp.max(x[:, lo:hi, :], axis=1))
    return jnp.stack(cols, axis=1)  # (N, k, C)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int
    padding: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel,),
                    padding=[(self.padding, self.padding)],
                    kernel_init=tinit.torch_linear_kernel(),
                    bias_init=nn.initializers.zeros)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


def _max_pool1d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(k,), strides=(k,))


# channel plans per size (reference: temporal_cnn.py:24-139)
_TCNN_PLANS = {
    # (list of stages; each stage = list of (features, kernel, padding),
    #  followed by pool spec: ("max", k) | ("adaptive", k) | None)
    "S": ([([(64, 3, 1), (64, 3, 1)], ("max", 2)),
           ([(128, 3, 1), (128, 3, 1)], ("max", 2)),
           ([(256, 3, 1), (256, 3, 1)], ("adaptive", 2)),
           ([(512, 2, 0)], None)], 512),
    "M": ([([(64, 7, 3), (64, 7, 3)], ("max", 3)),
           ([(128, 3, 1), (128, 3, 1)], ("max", 3)),
           ([(256, 3, 1), (256, 3, 1)], ("adaptive", 3)),
           ([(512, 3, 1), (512, 3, 1), (1024, 3, 0)], None)], 1024),
    "L": ([([(64, 7, 3), (64, 7, 3)], ("max", 3)),
           ([(128, 7, 3), (128, 7, 3)], ("max", 3)),
           ([(256, 3, 1), (256, 3, 1)], ("max", 3)),
           ([(512, 3, 1), (512, 3, 1)], ("adaptive", 3)),
           ([(1024, 3, 1), (1024, 3, 1), (2048, 3, 0)], None)], 2048),
}


class TCNN(nn.Module):
    """Temporal CNN over (N, L, C) sequences in S/M/L capacities
    (reference: temporal_cnn.py:6-156). Used for WKT geometries and, in the
    from-scratch text path, for byte sequences."""

    output_dim: int
    size: str = "M"
    p_dropout: float = 0.0

    @property
    def minimal_length(self) -> int:
        return TCNN_MINIMAL_LENGTH[self.size]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stages, cnn_out = _TCNN_PLANS[self.size]
        for convs, pool in stages:
            for features, kernel, padding in convs:
                x = _ConvBNRelu(features, kernel, padding)(x, train)
            if pool is not None:
                kind, k = pool
                x = _max_pool1d(x, k) if kind == "max" \
                    else adaptive_max_pool1d(x, k)
        x = x.reshape(x.shape[0], -1)  # flatten (N, L', C') -> (N, L'*C')
        x = nn.Dense(cnn_out, kernel_init=tinit.torch_linear_kernel(),
                     bias_init=tinit.torch_linear_bias(x.shape[-1]))(x)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim,
                        kernel_init=tinit.torch_linear_kernel(),
                        bias_init=tinit.torch_linear_bias(cnn_out))(x)


def _flash_attention_fn(query, key, value, bias=None, mask=None,
                        **unused_kwargs):
    """Drop-in ``attention_fn`` for flax MultiHeadDotProductAttention
    backed by the Pallas TPU FlashAttention kernel.

    ``query/key/value``: (N, L, h, dh) — flax layout; the kernel wants
    (N, h, L, dh). The padding ``mask`` ((N, 1, 1, L) key-only, or the
    full (N, 1, L, L) from which the key mask is its last row) becomes
    flash segment ids: padded positions get segment 0, valid ones 1, so
    valid queries attend exactly the valid keys (padded queries attend
    padded keys — finite don't-care rows, same as the XLA path's
    masked-to-finite-min softmax).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    L, dh = query.shape[1], query.shape[3]
    q = jnp.moveaxis(query, 1, 2)
    k = jnp.moveaxis(key, 1, 2)
    v = jnp.moveaxis(value, 1, 2)

    segment_ids = None
    if mask is not None:
        # keys any query may attend — works for both the (N, 1, 1, L)
        # key-only and the (N, 1, L, L) full mask layouts
        key_valid = jnp.any(mask, axis=(1, 2)).astype(jnp.int32)  # (N, L)
        segment_ids = SegmentIds(q=key_valid, kv=key_valid)

    blk = min(128, L)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk)
    out = flash_attention(q, k, v, segment_ids=segment_ids,
                          sm_scale=1.0 / float(dh) ** 0.5,
                          block_sizes=block_sizes)
    return jnp.moveaxis(out, 1, 2).astype(query.dtype)


class TextEncoder(nn.Module):
    """Trainable sequence encoder with CLS pooling and the reference's head
    structure (pre_fc -> ReLU -> dropout -> fc,
    reference: transformer.py:21-38).

    A compact transformer encoder stands in for the frozen pretrained LM of
    the v3.0 reference; the v2.0 paper design likewise trained its own
    sequence encoder from scratch.
    """

    output_dim: int
    vocab_size: int = 259           # byte tokenizer default
    model_dim: int = 128
    # single-head default: with model_dim 128 one head gives head_dim 128
    # (full MXU lanes) while h heads pad every attention matmul 128/(d/h)x.
    # Measured full-encoder fwd+bwd at N=8k, L=128 on a v5e
    # (benchmarks/micro_text_bwd_parts.py + tpu_batch_r3f): h1 90.0 ms,
    # h2 100.5, h4 117.9, h8 151.5. The encoder is our own from-scratch
    # design (the v3.0 reference wraps a frozen pretrained LM, unavailable
    # offline), so head count is a free design variable; raise it per
    # dataset via the module config if quality ever demands it.
    num_heads: int = 1
    num_layers: int = 2
    p_dropout: float = 0.2
    max_len: int = 512
    pad_id: int = 256
    # compute dtype for the transformer body: bf16 activations halve the
    # (N, L, d)-scale HBM traffic that dominates this encoder on TPU
    # (params and LayerNorm statistics stay f32; the head returns f32)
    dtype: jnp.dtype = jnp.bfloat16
    # key-side-only padding mask, broadcast (N, 1, 1, L): padded KEYS are
    # excluded from every softmax, which is all that valid outputs (and
    # the pooled CLS position) can observe — identical results to the full
    # (N, 1, L, L) query x key mask, without materialising an L x L mask
    # per sequence (524 MB at the multimodal bench's N=8k, L=128)
    key_only_mask: bool = True
    # attention execution: "xla" (flax dot-product attention), "flash"
    # (Pallas TPU FlashAttention — attention probabilities never touch
    # HBM; padding via segment ids), "plain"/"plain_fused" (hand-rolled
    # single-head paths), or "auto" — plain_fused when single-head with
    # the key-only mask (measured v5e, benchmarks/tpu_batch_r4b.py:
    # fwd+bwd 85.4 ms vs flax 89.4 at N=8k, L=128 — the fused (d, 3d)
    # QKV matmul reads the activation once instead of three times),
    # flax otherwise. All give the same math for valid positions; flash
    # keeps f32 softmax statistics in-kernel.
    #
    # Measured (benchmarks/micro_text_attn.py, v5e, fwd+bwd): at N=8k
    # L=128, XLA 117 ms vs flash 304 ms; at N=2k L=512, XLA 244 ms vs
    # flash 640 ms (4 heads, head dim 32: MXU tiles 4x-padded). Even at
    # full 128-lane head dim the short-L grid degenerates to N
    # single-block programs and flash still loses (h1: 122.8 vs 90.0 ms,
    # h2: 181.1 vs 100.5 — tpu_batch_r3f) — it remains an explicit
    # opt-in for long-sequence configurations.
    attn_impl: str = "auto"
    # token embedding: "gather" (nn.Embed-style table lookup) or "one_hot"
    # (embedding matmul). The gather backward is an N*L-row scatter-add
    # into the vocab-sized table; measured (micro_text_attn.py) the two are
    # within 8% at bench shapes (117 vs 109 ms), so the default stays
    # gather, which never materialises (N, L, V).
    embed_impl: str = "gather"
    # rematerialise each transformer block in the backward pass. Measured
    # at the multimodal bench shape (N=8k, L=128, v5e,
    # benchmarks/tpu_batch_r3k.py): remat LOSES — 88.6 -> 94.9 ms fwd+bwd
    # (the stored-activation reads are not this encoder's wall; recompute
    # adds a full forward). Default stays off; the flag remains the
    # standard memory/time trade for long-sequence or large-batch
    # configurations where activations would not fit HBM.
    remat: bool = False
    # see models/mrgcn.py: with a ``mesh`` the Pallas encoder kernels run
    # inside shard_map over the data axis; ``under_mesh`` WITHOUT a mesh
    # keeps the XLA-equivalent paths (no SPMD partitioning rule for bare
    # pallas custom calls)
    under_mesh: bool = False
    mesh: Optional[object] = None


    @nn.compact
    def __call__(self, tokens: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        # tokens: (N, L) int32
        if self.attn_impl not in ATTN_IMPLS:
            raise ValueError(
                f"Unknown attn_impl {self.attn_impl!r} (check "
                f"MRGCN_TEXT_ATTN); expected one of {ATTN_IMPLS}")
        mask = (tokens != self.pad_id)
        embedding = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal",
                                             out_axis=0),
            (self.vocab_size, self.model_dim))
        if self.embed_impl == "one_hot":
            one_hot = jax.nn.one_hot(tokens, self.vocab_size,
                                     dtype=self.dtype)
            x = one_hot @ embedding.astype(self.dtype)
        else:
            x = embedding.astype(self.dtype)[tokens]
        pos = self.param("pos_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (self.max_len, self.model_dim))
        x = x + pos[:tokens.shape[1]][None, :, :].astype(self.dtype)

        attn_mask = mask[:, None, None, :] if self.key_only_mask \
            else nn.make_attention_mask(mask, mask)
        attn_impl = self.attn_impl
        if attn_impl == "auto":
            # measured defaults (tpu_batch_r4b/r4e): fused QKV wins 85.4
            # vs flax 89.4 ms; the Pallas fused core on top takes the
            # encoder to 82.5 and the multimodal epoch 150.0 -> 142.6
            # (on non-TPU backends fused_core computes the identical
            # plain XLA chain — ops/attention.xla_attention).
            # NOTE: this changed the auto param tree in round 4 (fused
            # qkv/out Dense instead of flax MHA params) — checkpoints
            # saved on the old default load with MRGCN_TEXT_ATTN=xla
            # (detected at load time by tasks/utils.reconcile_text_attn).
            # Under a mesh, fused_core runs shard_map-wrapped; under_mesh
            # WITHOUT a mesh object keeps the pallas-free fused path
            if self.num_heads == 1 and self.key_only_mask:
                attn_impl = "plain_fused" \
                    if (self.under_mesh and self.mesh is None) \
                    else "fused_core"
            else:
                attn_impl = "xla"
        block_cls = nn.remat(_TextBlock) if self.remat else _TextBlock
        for i in range(self.num_layers):
            # explicit name: keeps the param tree identical whether or not
            # the block is remat-wrapped (nn.remat mangles the auto name)
            x = block_cls(model_dim=self.model_dim,
                          num_heads=self.num_heads, dtype=self.dtype,
                          attn_impl=attn_impl,
                          deterministic=not train,
                          under_mesh=self.under_mesh, mesh=self.mesh,
                          name=f"_TextBlock_{i}")(x, attn_mask)
        x = nn.LayerNorm(dtype=self.dtype)(x)

        pooled = x[:, 0].astype(jnp.float32)  # CLS pooling
        # (reference: transformer.py:30-31)
        pooled = nn.Dense(self.model_dim,
                          kernel_init=tinit.torch_linear_kernel())(pooled)
        pooled = nn.relu(pooled)
        pooled = nn.Dropout(self.p_dropout, deterministic=not train)(pooled)
        return nn.Dense(self.output_dim,
                        kernel_init=tinit.torch_linear_kernel())(pooled)


class _TextBlock(nn.Module):
    """One pre-norm transformer block (attention + MLP, residuals) —
    factored out of :class:`TextEncoder` so ``nn.remat`` can wrap it."""

    model_dim: int
    num_heads: int
    dtype: jnp.dtype
    attn_impl: str = "auto"
    deterministic: bool = True
    under_mesh: bool = False
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_mask: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        if self.attn_impl in ("plain", "plain_fused", "fused_core"):
            # hand-rolled single-head attention on (N, L, d) directly: no
            # (N, L, h, dh) head split/merge, no per-head mask broadcast.
            # Measured (benchmarks/tpu_batch_r3m.py, v5e, N=8k L=128
            # fwd+bwd): 92.0 ms vs flax 89.0 — the singleton head axis is
            # FREE (XLA reshapes it away); hypothesis refuted, flax stays
            # the default. Kept as the measured variant + numeric oracle
            # (tests/test_models.py pins equivalence at mapped params).
            #
            # "plain_fused" additionally merges the three (d, d)
            # projections into ONE (d, 3d) matmul: the (N, L, d)
            # activation is read once instead of three times forward, and
            # the backward folds dW_q/dW_k/dW_v and the three d_y terms
            # into single contractions (VERDICT r4 trial for the 28.6 ms
            # attn matmul chain).
            assert self.num_heads == 1, "plain attention is single-head"
            assert attn_mask.ndim == 4 and attn_mask.shape[1:3] == (1, 1), \
                "plain attention needs the key-only (N, 1, 1, L) mask"
            d = self.model_dim
            if self.attn_impl in ("plain_fused", "fused_core"):
                qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(y)
                q, k, v = (qkv[..., :d], qkv[..., d:2 * d],
                           qkv[..., 2 * d:])
            else:
                q = nn.Dense(d, dtype=self.dtype, name="query")(y)
                k = nn.Dense(d, dtype=self.dtype, name="key")(y)
                v = nn.Dense(d, dtype=self.dtype, name="value")(y)
            keys_valid = attn_mask.reshape(attn_mask.shape[0], -1)
            if self.attn_impl == "fused_core":
                # multi-sequence-per-program Pallas kernel: the (L, L)
                # probabilities never touch HBM (ops/attention.py); XLA
                # chain on non-TPU backends, interpret mode in tests
                from mrgcn_tpu.ops.attention import (fused_attention,
                                                     fused_attention_mesh,
                                                     xla_attention)
                from mrgcn_tpu.ops.pallas_gather import _use_pallas
                if _use_pallas():
                    import os
                    interp = os.environ.get(
                        "MRGCN_FORCE_PALLAS_GATHER") == "1"
                    if self.mesh is not None:
                        # shard_map over the data axis — a bare pallas
                        # call has no GSPMD partitioning rule
                        y = fused_attention_mesh(q, k, v, keys_valid,
                                                 self.mesh,
                                                 interpret=interp)
                    else:
                        y = fused_attention(q, k, v, keys_valid,
                                            interpret=interp)
                else:
                    y = xla_attention(q, k, v, keys_valid)
            else:
                logits = jnp.einsum("nld,nmd->nlm", q, k,
                                    preferred_element_type=jnp.float32)
                logits = logits / jnp.sqrt(jnp.float32(d))
                logits = jnp.where(keys_valid[:, None, :], logits,
                                   jnp.float32(-1e9))
                p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                y = jnp.einsum("nlm,nmd->nld", p, v)
            y = nn.Dense(d, dtype=self.dtype, name="out")(y)
        else:
            attention_fn = _flash_attention_fn \
                if self.attn_impl == "flash" else nn.dot_product_attention
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.model_dim,
                dtype=self.dtype, attention_fn=attention_fn,
                deterministic=self.deterministic)(y, y, mask=attn_mask)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        import os
        mlp_default = "0" if (self.under_mesh and self.mesh is None) \
            else "fused"
        if os.environ.get("MRGCN_TEXT_MLP", mlp_default) == "fused":
            # fused MLP kernel (DEFAULT; MRGCN_TEXT_MLP=0 reverts): the
            # (rows, 4d) hidden tensor stays in VMEM, backward recomputes
            # it (ops/fused_mlp.py) — isolated bwd 13.9 -> 8.2 ms,
            # encoder 85.5 -> 82.8 (tpu_batch_r4f). Param tree is
            # IDENTICAL to the two nn.Dense modules below (same
            # auto-names, inits), so the flag flips on a checkpoint; on
            # non-TPU backends the same params run the plain jnp chain.
            # Under a mesh the kernel runs shard_map-wrapped over rows.
            from mrgcn_tpu.ops.fused_mlp import fused_mlp, fused_mlp_mesh
            from mrgcn_tpu.ops.pallas_gather import _use_pallas
            d = self.model_dim
            k1, b1 = _DenseParams(4 * d, name="Dense_0")(d)
            k2, b2 = _DenseParams(d, name="Dense_1")(4 * d)
            if _use_pallas():
                interp = os.environ.get(
                    "MRGCN_FORCE_PALLAS_GATHER") == "1"
                args = (y, k1.astype(self.dtype), b1.astype(self.dtype),
                        k2.astype(self.dtype), b2.astype(self.dtype))
                y = fused_mlp_mesh(*args, self.mesh, interpret=interp) \
                    if self.mesh is not None \
                    else fused_mlp(*args, interpret=interp)
                y = y.astype(self.dtype)
            else:
                h = jnp.dot(y, k1.astype(self.dtype)) \
                    + b1.astype(self.dtype)
                h = nn.gelu(h)
                y = jnp.dot(h, k2.astype(self.dtype)) \
                    + b2.astype(self.dtype)
        else:
            y = nn.Dense(4 * self.model_dim, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.model_dim, dtype=self.dtype)(y)
        return x + y


class _DenseParams(nn.Module):
    """Kernel/bias parameters with nn.Dense's names and initializers,
    WITHOUT applying the matmul — lets a fused kernel consume the same
    checkpoint tree the stock nn.Dense path writes."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,))
        return kernel, bias


class _SeparableBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_feat = x.shape[-1]
        x = nn.Conv(in_feat, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=in_feat,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class _DenseBlock(nn.Module):
    """Plain 3x3 conv + BN + relu. More FLOPs than a separable block, but
    every op is an MXU matmul — on TPU the depthwise half of a separable
    block runs off the MXU and its backward lowers to slow grouped
    transposed convolutions (measured in benchmarks/micro_image.py)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class ImageCNN(nn.Module):
    """Compact depthwise-separable image CNN with global average pooling and
    the reference's head (reference: imagecnn.py:9-41). Input (N, H, W, C)
    float32 (already normalised)."""

    output_dim: int
    p_dropout: float = 0.2
    width: int = 32
    # bf16 conv compute (params f32; head in f32) — see TextEncoder.dtype
    dtype: jnp.dtype = jnp.bfloat16
    # "sep" (depthwise separable, MobileNet-style) or "dense" (plain 3x3
    # convs). See benchmarks/micro_image.py for the TPU trade-off.
    block_impl: str = "sep"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.width
        block = _DenseBlock if self.block_impl == "dense" else \
            _SeparableBlock
        x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        for features, stride in ((w * 2, 2), (w * 2, 1), (w * 4, 2),
                                 (w * 4, 1), (w * 8, 2), (w * 8, 1),
                                 (w * 16, 2)):
            x = block(features, stride, dtype=self.dtype)(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global avg pool
        inter = x.shape[-1]
        x = nn.Dense(inter, kernel_init=tinit.torch_linear_kernel())(x)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim,
                        kernel_init=tinit.torch_linear_kernel())(x)
