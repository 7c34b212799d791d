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


def test_planned_matches_sparse_rmsprop():
    """plan_sparse_updates + planned_rmsprop == sparse_rmsprop, per step."""
    from topk_rec_tpu.ops.sparse_update import (
        plan_sparse_updates,
        planned_rmsprop,
    )

    rng = np.random.default_rng(3)
    n_rows, k, steps, m = 17, 5, 4, 9
    idx_all = rng.integers(0, n_rows, size=(steps, m)).astype(np.int32)
    idx_all[0, :4] = 7  # force heavy duplication
    grads_all = rng.normal(size=(steps, m, k)).astype(np.float32)
    uniq, seg = plan_sparse_updates(jnp.asarray(idx_all))

    t_ref = jnp.asarray(rng.normal(size=(n_rows, k)).astype(np.float32))
    a_ref = jnp.asarray(np.abs(rng.normal(size=(n_rows, k))).astype(np.float32))
    t_new, a_new = t_ref, a_ref
    for s in range(steps):
        g = jnp.asarray(grads_all[s])
        t_ref, a_ref = sparse_rmsprop(
            t_ref, a_ref, jnp.asarray(idx_all[s]), g, lr=0.05
        )
        t_new, a_new = planned_rmsprop(
            t_new, a_new, uniq[s], seg[s], g, lr=0.05
        )
        np.testing.assert_allclose(
            np.asarray(t_new), np.asarray(t_ref), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(a_new), np.asarray(a_ref), rtol=1e-5, atol=1e-6
        )


def test_planned_vector_table():
    from topk_rec_tpu.ops.sparse_update import (
        plan_sparse_updates,
        planned_rmsprop,
    )

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.normal(size=12).astype(np.float32))
    acc = jnp.asarray(np.abs(rng.normal(size=12)).astype(np.float32))
    idx = np.array([[5, 5, 1]], dtype=np.int32)
    grads = jnp.asarray(rng.normal(size=3).astype(np.float32))
    uniq, seg = plan_sparse_updates(jnp.asarray(idx))
    got_t, got_a = planned_rmsprop(table, acc, uniq[0], seg[0], grads, lr=0.01)
    want_t, want_a = sparse_rmsprop(
        table, acc, jnp.asarray(idx[0]), grads, lr=0.01
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5)


def test_planned_split_matches_fused_planned_rmsprop():
    """planned_rows + segment_sum + apply_planned_rmsprop (the production
    split used by the BPR/VBPR steps) must bitwise-match the fused
    planned_rmsprop, including duplicate rows and OOB padding slots."""
    import jax
    import jax.numpy as jnp

    from topk_rec_tpu.ops.sparse_update import (
        apply_planned_rmsprop,
        plan_sparse_updates,
        planned_rmsprop,
        planned_rows,
    )

    rng = np.random.default_rng(8)
    n_rows, k, m = 40, 6, 16
    table = jnp.asarray(rng.normal(size=(n_rows, k)).astype(np.float32))
    acc = jnp.asarray(
        np.abs(rng.normal(size=(n_rows, k))).astype(np.float32)
    )
    # duplicates guaranteed: sample rows from a small pool
    idx = rng.integers(0, 9, size=m).astype(np.int32)
    grads = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    uniq, seg = plan_sparse_updates(jnp.asarray(idx)[None, :])
    uniq, seg = uniq[0], seg[0]

    t_fused, a_fused = planned_rmsprop(table, acc, uniq, seg, grads, 0.1)

    rows, acc_rows = planned_rows(table, acc, uniq)
    agg = jax.ops.segment_sum(grads, seg, num_segments=m)
    t_split, a_split = apply_planned_rmsprop(
        table, acc, uniq, rows, acc_rows, agg, 0.1
    )
    np.testing.assert_array_equal(np.asarray(t_fused), np.asarray(t_split))
    np.testing.assert_array_equal(np.asarray(a_fused), np.asarray(a_split))
    # rows not touched stay bitwise-identical
    untouched = np.setdiff1d(np.arange(n_rows), idx)
    np.testing.assert_array_equal(
        np.asarray(t_split)[untouched], np.asarray(table)[untouched]
    )
