"""Fused single-head attention core for short sequences (Pallas TPU).

The text encoder's attention core (score -> masked softmax -> PV) costs
9.8 ms fwd+bwd per layer at N=8k, L=128, d=128 under XLA — the (N, L, L)
logits/probability tensors round-trip HBM in both directions
(benchmarks/tpu_batch_r4b.py FINAL_ATTN_PARTS). Stock Pallas
FlashAttention loses at these shapes (tpu_batch_r3f: 122.8 vs 90.0 ms
full-encoder — its grid degenerates to N single-block programs). This
kernel keeps flash's no-HBM-logits property but processes ``G``
sequences per grid step, amortising program overhead:

    grid = (N / G,); per program, an unrolled loop over G sequences runs
    (L, d) @ (L, d)^T -> masked f32 softmax -> (L, L) @ (L, d), all in
    VMEM. Backward recomputes the probabilities in-kernel (standard
    flash-style recompute) and emits d_q/d_k/d_v in one pass.

Shapes are static per compile: L and d padded to 128 by the caller
(:func:`fused_attention` handles N % G and mask padding). Single head
with a key-only additive bias — exactly the text encoder's regime
(models/encoders.py; reference capability matched:
mrgcn/models/transformer.py:21-38).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sequences per grid step: VMEM residency is 7 (G, L, d) bf16 blocks
# (~256 KB each at G=8, L=d=128) + one (L, L) f32 temporary.
# MRGCN_ATTN_GROUP overrides for the r4e sweep (read at trace time).
GROUP = 8


def _group() -> int:
    import os
    return int(os.environ.get("MRGCN_ATTN_GROUP", str(GROUP)))


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g]                                    # (L, d) bf16
        k = k_ref[g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L, L)
        logits = logits + bias_ref[g][None, :]
        p = jax.nn.softmax(logits, axis=-1)
        out_ref[g] = jnp.dot(p.astype(v_ref.dtype), v_ref[g],
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref,
                dv_ref, *, scale: float):
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = logits + bias_ref[g][None, :]
        p = jax.nn.softmax(logits, axis=-1)              # (L, L) f32
        pb = p.astype(do.dtype)
        # d_v = p^T @ do
        dv_ref[g] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # d_p = do @ v^T
        d_p = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (L, L) f32
        # softmax jvp transpose: d_s = p * (d_p - sum(d_p * p, -1))
        d_s = p * (d_p - jnp.sum(d_p * p, axis=-1, keepdims=True))
        d_s = (d_s * scale).astype(q.dtype)
        dq_ref[g] = jnp.dot(d_s, k, preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            d_s, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(G, L, d):
    blk = pl.BlockSpec((G, L, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((G, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return blk, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_core(q, k, v, bias, interpret):
    """(N, L, d) single-head attention, N divisible by GROUP, L/d 128-
    multiples, ``bias`` (N, L) f32 additive key mask."""
    N, L, d = q.shape
    G = _group()
    scale = 1.0
    blk, bspec = _specs(G, L, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(N // G,),
        in_specs=[blk, blk, blk, bspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((N, L, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _attention_core_fwd(q, k, v, bias, interpret):
    return _attention_core(q, k, v, bias, interpret), (q, k, v, bias)


def _attention_core_bwd(interpret, res, d_out):
    q, k, v, bias = res
    N, L, d = q.shape
    G = _group()
    scale = 1.0
    blk, bspec = _specs(G, L, d)
    shape = jax.ShapeDtypeStruct((N, L, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(N // G,),
        in_specs=[blk, blk, blk, bspec, blk],
        out_specs=(blk, blk, blk),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, bias, d_out.astype(q.dtype))
    return dq, dk, dv, None


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    keys_valid: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Single-head attention with a key-only mask via the fused kernel.

    ``q``/``k``/``v``: (N, L, d); ``keys_valid``: (N, L) bool. Pads N to
    a GROUP multiple and L/d to 128 multiples (padded keys are masked
    out; padded query rows are dropped on return). Falls back to plain
    XLA attention when the kernel is unavailable (CPU tests use
    ``interpret=True`` instead).
    """
    N, L, d = q.shape
    Np = -(-N // _group()) * _group()
    Lp = -(-L // 128) * 128
    dp = -(-d // 128) * 128
    # fold the TRUE 1/sqrt(d) into q before padding (the kernel would
    # otherwise scale by the padded width)
    q = q * jnp.asarray(1.0 / (d ** 0.5), q.dtype)
    bias = jnp.where(keys_valid, 0.0, -1e9).astype(jnp.float32)
    if (Np, Lp, dp) != (N, L, d):
        pad3 = ((0, Np - N), (0, Lp - L), (0, dp - d))
        q = jnp.pad(q, pad3)
        k = jnp.pad(k, pad3)
        v = jnp.pad(v, pad3)
        # padded keys masked; padded sequences attend to key 0 (finite
        # softmax, rows dropped below)
        bias = jnp.pad(bias, ((0, Np - N), (0, Lp - L)),
                       constant_values=-1e9)
        bias = bias.at[N:, 0].set(0.0)
    out = _attention_core(q, k, v, bias, interpret)
    return out[:N, :L, :d]


def xla_attention(q, k, v, keys_valid):
    """Oracle: the plain single-head chain (models/encoders.py 'plain'
    path semantics) — used by tests and as the non-TPU fallback."""
    d = q.shape[-1]
    logits = jnp.einsum("nld,nmd->nlm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    logits = jnp.where(keys_valid[:, None, :], logits, jnp.float32(-1e9))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nlm,nmd->nld", p, v)


def fused_attention_mesh(q, k, v, keys_valid, mesh, interpret=False):
    """Row-parallel :func:`fused_attention` under a device mesh.

    A pallas custom call carries no GSPMD partitioning rule, so inside a
    mesh-partitioned program the kernel is wrapped in ``shard_map`` over
    the ``data`` axis: each chip runs the single-chip kernel on its local
    sequence rows (attention is per-sequence, so there is nothing to
    communicate; parameters live OUTSIDE this wrapper). Falls back to the
    numerically identical XLA chain when the row count does not divide
    the data axis. Transpose correctness of the replicated-over-``model``
    specs is pinned in tests/test_mesh_training.py."""
    from jax.sharding import PartitionSpec as P
    if q.shape[0] % mesh.shape["data"] != 0:
        return xla_attention(q, k, v, keys_valid)
    s3, s2 = P("data", None, None), P("data", None)
    fn = jax.shard_map(
        lambda q, k, v, m: fused_attention(q, k, v, m, interpret),
        mesh=mesh, in_specs=(s3, s3, s3, s2), out_specs=s3,
        check_vma=False)
    return fn(q, k, v, keys_valid)
