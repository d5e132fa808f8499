"""Trustworthy TPU timing through the axon tunnel.

``jax.block_until_ready`` does NOT synchronize on the axon remote backend
(measured: a 137-GFLOP matmul "completes" in 22 us; fetching one element of
the result takes ~30 ms). Every wall-clock measurement must therefore force
a device->host value fetch, and the ~27 ms fixed tunnel round-trip must be
subtracted.

Protocol: run the op K times inside one jitted ``lax.fori_loop`` whose carry
forces a true data dependency between iterations (no hoisting, no dead
code), fetch a scalar, and compare against the 1-iteration run:

    per_iter = (t(K) - t(1)) / (K - 1)

CALLER FOOT-GUN: only the op's *returned* leaves are forced. An op like
``lambda x: jax.value_and_grad(f)(x)[0]`` returns just the loss, so XLA
dead-code-eliminates the whole backward pass (except opaque Pallas
custom_calls) and the measurement silently collapses to forward-only —
return the full ``(value, grad)`` tuple instead. (This bug invalidated
the first FINAL_LP fwd_bwd numbers in round 3; the tell is
fwd_bwd == fwd.)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def _fetch(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def timed_loop(op: Callable, iters: int, *args) -> float:
    """Wall-clock seconds for ``iters`` dependent executions of ``op`` plus
    one scalar fetch. ``op(*args) -> array``; a scalar derived from each
    iteration's output perturbs the first argument of the next so XLA can
    neither hoist nor elide iterations."""

    def _perturb(tree, eps):
        """Add a zero-valued, data-dependent eps to the first float leaf
        (works for arrays and pytrees alike)."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        done = False
        out = []
        for leaf in leaves:
            if not done and jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(leaf + eps.astype(leaf.dtype))
                done = True
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    def _first_scalar(tree):
        """Data-dependent scalar that forces EVERY float leaf in full —
        a single element would let XLA dead-code-eliminate whole branches
        (sum cannot be sliced through, and x*0 is not folded because of
        NaN semantics)."""
        total = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                total = total + jnp.sum(leaf).astype(jnp.float32)
        return total

    @partial(jax.jit, static_argnums=())
    def run(first, rest, n):
        def body(_, carry):
            first, acc = carry
            out = op(first, *rest)
            # fold a data-dependent, numerically-negligible scalar back in
            eps = _first_scalar(out) * 0.0
            return _perturb(first, eps), acc + eps
        first, acc = jax.lax.fori_loop(0, n, body, (first, 0.0))
        return acc + _first_scalar(first)

    first, rest = args[0], args[1:]
    n = jnp.asarray(iters, dtype=jnp.int32)
    _fetch(run(first, rest, n))         # compile + warm up
    reps = []
    for _ in range(3):
        t0 = time.time()
        _fetch(run(first, rest, n))
        reps.append(time.time() - t0)
    return float(np.median(reps))


def per_iter_time(op: Callable, *args, iters: int = 20) -> float:
    """Median per-execution seconds of ``op(*args)``, tunnel overhead and
    loop scaffolding subtracted."""
    t_many = timed_loop(op, iters, *args)
    t_one = timed_loop(op, 1, *args)
    return max(0.0, (t_many - t_one) / (iters - 1))
