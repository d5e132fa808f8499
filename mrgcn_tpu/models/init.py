"""Weight initializers replicating the reference's torch init semantics.

The reference initializes R-GCN weights with ``nn.init.xavier_uniform_``
(reference: mrgcn/layers/graph.py:104-116), MLPs with ``nn.init.uniform_``
over [0, 1] (reference: mrgcn/models/perceptron.py:44-46), and leaves
conv/linear layers at torch defaults (kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in))). Matching the init *distributions* keeps
training dynamics comparable for parity runs.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _torch_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """torch ``_calculate_fan_in_and_fan_out``: for ndim > 2,
    fan_in = shape[1] * prod(shape[2:]), fan_out = shape[0] * prod(shape[2:]).
    """
    if len(shape) < 2:
        raise ValueError("fan computation needs >= 2 dims")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def xavier_uniform(fan_shape: Sequence[int] = None):
    """Xavier-uniform with torch fan semantics. ``fan_shape`` overrides the
    shape used for fan computation (the reference computes fans over the
    flattened ``(S*n, out)`` identity-weight matrix)."""

    def init(key, shape, dtype=jnp.float32):
        fin, fout = _torch_fans(fan_shape if fan_shape is not None else shape)
        bound = math.sqrt(6.0 / (fin + fout))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def unit_uniform():
    """U(0, 1) over every element — the reference MLP's init
    (reference: perceptron.py:44-46)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, 0.0, 1.0)

    return init


def packed_xavier_uniform(fan_shape, num_nodes: int, out_dim: int, k: int):
    """Xavier-uniform for the packed identity weight layout
    ``(S, rows, lanes)``: sampled with the fans of the logical
    ``(S*n, out)`` matrix, with the padding slots (lanes beyond ``out`` and
    rows beyond ``n``) zeroed so they never contribute to regularisation or
    weight decay."""

    def init(key, shape, dtype=jnp.float32):
        lanes = shape[2]
        sub = lanes // k
        fin, fout = _torch_fans(fan_shape)
        bound = math.sqrt(6.0 / (fin + fout))
        vals = jax.random.uniform(key, shape, dtype, -bound, bound)
        lane = jnp.arange(lanes)
        node_of = (jnp.arange(shape[1])[:, None] * k + lane[None, :] // sub)
        valid = (node_of < num_nodes) & ((lane % sub) < out_dim)[None, :]
        return vals * valid[None, :, :].astype(dtype)

    return init


def torch_linear_kernel():
    """torch Linear/Conv default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax kernels are (in, out) / (*window, in, out); fan_in is the product of
    all dims but the last."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for s in shape[:-1]:
            fan_in *= s
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
