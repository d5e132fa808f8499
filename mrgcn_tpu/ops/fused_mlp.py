"""Fused transformer-MLP kernel (Pallas TPU): x @ W1 -> gelu -> @ W2
with the (rows, 4d) hidden activations resident in VMEM.

The text encoder's MLP block costs 12.6 ms fwd+bwd at (N*L, d) =
(1M, 128), ~2x its HBM bound (tpu_batch_r3f; docs/hlo_mlp_bwd.txt found
no layout pathology) — the cost is the (rows, 4d) hidden tensor
round-tripping HBM between the two matmuls and again in the backward.
This kernel never writes it: forward computes both matmuls per row
block; backward recomputes the hidden pre-activations in-kernel
(flash-style) and accumulates dW1/db1/dW2/db2 across the sequential
grid in f32 VMEM blocks.

Reference capability matched: the pre_fc/fc head + MLP blocks of
mrgcn/models/transformer.py:21-38 (our from-scratch v2.0-parity text
encoder's blocks, models/encoders.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: VMEM holds x/do/dx (Mb, d) + hidden (Mb, 4d)
# blocks (bf16) plus the f32 dW accumulators. Measured (tpu_batch_r4f,
# (1M, 128)x(128, 512) bf16): bwd 8.19 ms at 512 vs 8.90 at 1024; 2048
# exceeds the 16 MB scoped-VMEM limit.
ROW_BLOCK = 512


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[:]
    h_pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[0][None, :]
    h = _gelu(h_pre).astype(x.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) \
        + b2_ref[0][None, :]
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    do = do_ref[:]
    h_pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[0][None, :]
    h, gelu_vjp = jax.vjp(_gelu, h_pre)
    hb = h.astype(x.dtype)

    dw2_ref[:] += jax.lax.dot_general(
        hb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (4d, d)
    db2_ref[:] += jnp.sum(do.astype(jnp.float32), axis=0,
                          keepdims=True)

    dh = jax.lax.dot_general(
        do, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (Mb, 4d)
    dh_pre = gelu_vjp(dh)[0]                            # f32
    dh_b = dh_pre.astype(x.dtype)

    dx_ref[:] = jax.lax.dot_general(
        dh_b, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        x, dh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (d, 4d)
    db1_ref[:] += jnp.sum(dh_pre, axis=0, keepdims=True)


def _row_spec(Mb, d):
    return pl.BlockSpec((Mb, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp_core(x, w1, b1, w2, b2, interpret):
    M, d = x.shape
    Mb = min(ROW_BLOCK, M)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(M // Mb,),
        in_specs=[_row_spec(Mb, d), _const_spec(w1.shape),
                  _const_spec(b1.shape), _const_spec(w2.shape),
                  _const_spec(b2.shape)],
        out_specs=_row_spec(Mb, d),
        out_shape=jax.ShapeDtypeStruct((M, d), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _mlp_core_fwd(x, w1, b1, w2, b2, interpret):
    return _mlp_core(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _mlp_core_bwd(interpret, res, d_out):
    x, w1, b1, w2, b2 = res
    M, d = x.shape
    hd = w1.shape[1]
    Mb = min(ROW_BLOCK, M)
    shapes = (jax.ShapeDtypeStruct((M, d), x.dtype),       # dx
              jax.ShapeDtypeStruct((d, hd), jnp.float32),  # dw1
              jax.ShapeDtypeStruct((1, hd), jnp.float32),  # db1
              jax.ShapeDtypeStruct((hd, d), jnp.float32),  # dw2
              jax.ShapeDtypeStruct((1, d), jnp.float32))   # db2
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(M // Mb,),
        in_specs=[_row_spec(Mb, d), _const_spec(w1.shape),
                  _const_spec(b1.shape), _const_spec(w2.shape),
                  _row_spec(Mb, d)],
        out_specs=(_row_spec(Mb, d), _const_spec((d, hd)),
                   _const_spec((1, hd)), _const_spec((hd, d)),
                   _const_spec((1, d))),
        out_shape=shapes,
        interpret=interpret,
    )(x, w1, b1, w2, d_out.astype(x.dtype))
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """``gelu(x @ w1 + b1) @ w2 + b2`` over flattened rows.

    ``x``: (..., d) — leading dims flattened; rows padded to the kernel's
    row block (padded rows produce garbage that is sliced away; their
    cotangent is zero so gradients are exact). ``b1``/``b2`` may be 1-D.
    """
    lead = x.shape[:-1]
    d = x.shape[-1]
    hd = w1.shape[1]
    x2 = x.reshape(-1, d)
    M = x2.shape[0]
    M8 = -(-M // 16) * 16               # sublane multiple (16 covers
    #                                       bf16's (16, 128) native tile;
    #                                       f32 needs only 8)
    Mb = min(ROW_BLOCK, M8)
    Mp = -(-M8 // Mb) * Mb
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _mlp_core(x2, w1, b1.reshape(1, hd), w2, b2.reshape(1, d),
                    interpret)
    return out[:M].reshape(*lead, d)


def fused_mlp_mesh(x, w1, b1, w2, b2, mesh, interpret=False):
    """Row-parallel :func:`fused_mlp` under a device mesh (see
    attention.fused_attention_mesh for the rationale). Rows shard over
    ``data``; the weights enter replicated (``P()``) and shard_map's
    transpose psums their per-shard cotangents over the mesh — verified
    exact on a 4x2 virtual mesh (tests/test_mesh_training.py). Falls back
    to the plain XLA chain (identical math) when the leading dim does not
    divide the data axis."""
    from jax.sharding import PartitionSpec as P
    if x.shape[0] % mesh.shape["data"] != 0:
        h = jnp.dot(x, w1) + b1.reshape(1, -1)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.dot(h, w2) + b2.reshape(1, -1)
    sx = P(*(("data",) + (None,) * (x.ndim - 1)))
    rep = P()
    fn = jax.shard_map(
        lambda x, w1, b1, w2, b2: fused_mlp(x, w1, b1, w2, b2, interpret),
        mesh=mesh, in_specs=(sx, rep, rep, rep, rep), out_specs=sx,
        check_vma=False)
    return fn(x, w1, b1, w2, b2)
