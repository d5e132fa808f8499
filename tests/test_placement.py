"""place_rows: gather-only modality placement vs a brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.ops.placement import place_rows


def _oracle(out, idx, n):
    ref = np.zeros((n, out.shape[1]), np.float32)
    for j in range(out.shape[0]):
        if 0 <= idx[j] < n:
            ref[idx[j]] = out[j]
    return ref


@pytest.mark.parametrize("sorted_idx", [True, False])
def test_place_rows_matches_scatter_oracle(sorted_idx):
    rng = np.random.default_rng(0)
    n, m, d = 120, 17, 5
    idx = rng.choice(n, m, replace=False).astype(np.int32)
    # padding rows: out-of-range, duplicates allowed (subset_features
    # pads every row with the same 2**30 index)
    idx[-3:] = [n, 2 ** 30, 2 ** 30]
    if sorted_idx:
        idx = np.sort(idx)
    else:
        rng.shuffle(idx)
    out = rng.random((m, d)).astype(np.float32)

    X = np.asarray(place_rows(jnp.asarray(out), jnp.asarray(idx), n))
    np.testing.assert_array_equal(X, _oracle(out, idx, n))


def test_place_rows_grad_is_row_gather():
    rng = np.random.default_rng(1)
    n, m, d = 64, 9, 4
    idx = rng.choice(n, m, replace=False).astype(np.int32)
    idx[0] = n + 1  # dropped row gets zero grad
    out = jnp.asarray(rng.random((m, d)).astype(np.float32))
    W = rng.random((n, d)).astype(np.float32)

    g = jax.grad(lambda o: jnp.sum(
        place_rows(o, jnp.asarray(idx), n) * W))(out)
    gref = np.zeros((m, d), np.float32)
    for j in range(m):
        if 0 <= idx[j] < n:
            gref[j] = W[idx[j]]
    np.testing.assert_allclose(np.asarray(g), gref, atol=0)


def test_place_rows_jits_and_vjp_under_jit():
    rng = np.random.default_rng(2)
    n, m, d = 200, 31, 8
    idx = jnp.asarray(np.sort(rng.choice(n, m, replace=False))
                      .astype(np.int32))
    out = jnp.asarray(rng.random((m, d)).astype(np.float32))

    f = jax.jit(lambda o: jnp.sum(place_rows(o, idx, n) ** 2))
    g = jax.jit(jax.grad(lambda o: jnp.sum(place_rows(o, idx, n) ** 2)))
    np.testing.assert_allclose(float(f(out)), float(jnp.sum(out ** 2)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g(out)), np.asarray(2 * out),
                               rtol=1e-6)
