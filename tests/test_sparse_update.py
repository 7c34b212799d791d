"""Sparse RMSProp vs dense-masked reference semantics."""

import jax.numpy as jnp
import numpy as np

from topk_rec_tpu.ops.sparse_update import sparse_rmsprop


def _dense_reference(table, acc, idx, grads, lr, decay=0.9, eps=1e-10):
    """Aggregate grads per row, single accumulator update per touched row."""
    table = table.copy()
    acc = acc.copy()
    g = np.zeros_like(table)
    if table.ndim == 1:
        np.add.at(g, idx, grads)
    else:
        np.add.at(g, idx, grads)
    touched = np.zeros(table.shape[0], bool)
    touched[idx] = True
    acc[touched] = decay * acc[touched] + (1 - decay) * g[touched] ** 2
    table[touched] -= lr * g[touched] / np.sqrt(acc[touched] + eps)
    return table, acc


def test_sparse_matches_dense_with_duplicates():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(20, 4)).astype(np.float32)
    acc = np.abs(rng.normal(size=(20, 4))).astype(np.float32)
    idx = np.array([3, 7, 3, 0, 7, 7], dtype=np.int32)  # duplicates
    grads = rng.normal(size=(6, 4)).astype(np.float32)
    got_t, got_a = sparse_rmsprop(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(grads), lr=0.1,
    )
    want_t, want_a = _dense_reference(table, acc, idx, grads, lr=0.1)
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-5)


def test_sparse_vector_table():
    rng = np.random.default_rng(1)
    table = rng.normal(size=12).astype(np.float32)
    acc = np.abs(rng.normal(size=12)).astype(np.float32)
    idx = np.array([5, 5, 1], dtype=np.int32)
    grads = rng.normal(size=3).astype(np.float32)
    got_t, got_a = sparse_rmsprop(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(grads), lr=0.01,
    )
    want_t, want_a = _dense_reference(table, acc, idx, grads, lr=0.01)
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-5)


def test_untouched_rows_unchanged():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(10, 3)).astype(np.float32)
    acc = np.abs(rng.normal(size=(10, 3))).astype(np.float32)
    idx = np.array([2, 4], dtype=np.int32)
    grads = rng.normal(size=(2, 3)).astype(np.float32)
    got_t, got_a = sparse_rmsprop(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(idx),
        jnp.asarray(grads), lr=0.1,
    )
    untouched = [0, 1, 3, 5, 6, 7, 8, 9]
    np.testing.assert_array_equal(np.asarray(got_t)[untouched], table[untouched])
    np.testing.assert_array_equal(np.asarray(got_a)[untouched], acc[untouched])
