"""place_rows: gather-only modality placement vs a brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.ops.placement import build_rows, place_rows, place_rows_pre


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


@pytest.mark.parametrize("n,m,d", [(120, 17, 5), (64, 64, 3)])
def test_place_rows_pre_matches_place_rows(n, m, d):
    rng = np.random.default_rng(3)
    idx = rng.choice(n, m, replace=False).astype(np.int32)
    if m >= 3:
        idx[-2:] = [n, 2 ** 30]  # padding rows
    out = jnp.asarray(rng.random((m, d)).astype(np.float32))
    rows = jnp.asarray(build_rows(idx, n))
    idx = jnp.asarray(idx)

    np.testing.assert_array_equal(
        np.asarray(place_rows_pre(out, idx, rows)),
        np.asarray(place_rows(out, idx, n)))

    W = jnp.asarray(rng.random((n, d)).astype(np.float32))
    g_pre = jax.grad(lambda o: jnp.sum(place_rows_pre(o, idx, rows) * W))(out)
    g_ref = jax.grad(lambda o: jnp.sum(place_rows(o, idx, n) * W))(out)
    np.testing.assert_array_equal(np.asarray(g_pre), np.asarray(g_ref))


def test_subset_features_emits_inverse_map():
    from mrgcn_tpu.data.batching import subset_features
    data = np.arange(12, dtype=np.float32).reshape(6, 2)
    node_idx = np.array([5, 9, 14, 2, 7, 11], dtype=np.int32)
    outer = np.array([2, 7, 9], dtype=np.int32)
    num_rows = 64
    out = subset_features({"enc": (data, node_idx)}, outer,
                          num_rows=num_rows)
    rows_arr, local, inv = out["enc"]
    assert inv.shape == (num_rows,)
    X = np.asarray(place_rows_pre(jnp.asarray(rows_arr.astype(np.float32)),
                                  jnp.asarray(local), jnp.asarray(inv)))
    # outer node 2 -> local 0 carries data row 3, node 7 -> row 4, 9 -> row 1
    np.testing.assert_array_equal(X[0], data[3])
    np.testing.assert_array_equal(X[1], data[4])
    np.testing.assert_array_equal(X[2], data[1])
    assert np.all(X[3:] == 0)


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
