"""Batched ALS correctness: block kernel == per-row closed-form NumPy."""

import jax.numpy as jnp
import numpy as np

from topk_rec_tpu.ops.als import ALSPlan, half_sweep, weighted_als_user_update


def _numpy_user_update(user_emb, item_emb, inter, a, b, lam, prior=None):
    """Sequential per-entity solves, the reference's structure
    (wmf.py:70-81 / cer.py:39-46 with intended semantics)."""
    n_users, k = user_emb.shape
    out = user_emb.copy()
    indptr, flat = inter.user_csr
    Vr = item_emb[inter.rated_items]
    XX = b * (Vr.T @ Vr) + lam * np.eye(k, dtype=np.float64)
    for u in range(n_users):
        items = flat[indptr[u]:indptr[u + 1]]
        if len(items) == 0 and prior is None:
            continue
        Vi = item_emb[items]
        A = XX + (a - b) * (Vi.T @ Vi)
        rhs = a * Vi.sum(axis=0) if len(items) else np.zeros(k)
        if prior is not None:
            rhs = rhs + lam * prior[u]
        out[u] = np.linalg.solve(A, rhs)
    return out


def test_half_sweep_matches_numpy(small_inter):
    rng = np.random.default_rng(0)
    k = 6
    U = rng.normal(size=(small_inter.n_users, k)).astype(np.float32)
    V = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    a, b, lam = 1.0, 0.01, 0.05
    got = weighted_als_user_update(U, V, small_inter, a, b, lam, block_size=32)
    want = _numpy_user_update(U, V, small_inter, a, b, lam)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_half_sweep_with_prior(small_inter):
    """Prior branch: every entity updated, unrated solved from prior alone
    (CER semantics, ref cer.py:49-63)."""
    rng = np.random.default_rng(1)
    k = 5
    # item-side sweep
    U = rng.normal(size=(small_inter.n_users, k)).astype(np.float32)
    V = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    prior = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    a, b, lam = 1.0, 0.01, 10.0
    indptr, flat = small_inter.item_csr
    plan = ALSPlan(indptr, flat, small_inter.n_items, block_size=17)
    got, fit = half_sweep(
        plan, V, U, jnp.asarray(small_inter.rated_users), a, b, lam,
        prior=prior,
    )

    class ItemView:
        user_csr = small_inter.item_csr
        rated_items = small_inter.rated_users

    want = _numpy_user_update(V, U, ItemView, a, b, lam, prior=prior)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    # fit loss formula check against direct computation (ref wmf.py:91-96)
    Ur = U[small_inter.rated_users]
    XXb = b * (Ur.T @ Ur)
    expect_fit = 0.0
    for j in range(small_inter.n_items):
        users = flat[indptr[j]:indptr[j + 1]]
        if len(users) == 0:
            continue
        Uj = U[users]
        A = XXb + (a - b) * (Uj.T @ Uj)
        v = want[j]
        expect_fit += 0.5 * len(users) * a + 0.5 * v @ A @ v - a * np.sum(Uj @ v)
    np.testing.assert_allclose(fit, expect_fit, rtol=1e-3)


def test_unrated_entities_kept_without_prior(tiny_inter):
    rng = np.random.default_rng(2)
    U = rng.normal(size=(tiny_inter.n_users, 3)).astype(np.float32)
    V = rng.normal(size=(tiny_inter.n_items, 3)).astype(np.float32)
    got = weighted_als_user_update(U, V, tiny_inter, 1.0, 0.01, 0.1)
    # user 3 has no positives -> row unchanged
    np.testing.assert_array_equal(got[3], U[3])
    assert not np.allclose(got[0], U[0])


def test_half_sweep_as_numpy_false_device_resident(small_inter):
    """as_numpy=False must return device arrays identical to the np path
    (the WMF/CER/DPM train loops run the whole alternation device-resident
    and only sync on the scalar loss — see ops/als.half_sweep)."""
    import jax

    rng = np.random.default_rng(3)
    k = 4
    U = rng.normal(size=(small_inter.n_users, k)).astype(np.float32)
    V = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    indptr, flat = small_inter.user_csr
    plan = ALSPlan(indptr, flat, small_inter.n_users, block_size=16)
    rated = jnp.asarray(small_inter.rated_items)
    want, want_fit = half_sweep(plan, U, V, rated, 1.0, 0.01, 0.05)
    got, got_fit = half_sweep(
        plan, U, V, rated, 1.0, 0.01, 0.05, as_numpy=False
    )
    assert isinstance(got, jax.Array) and isinstance(got_fit, jax.Array)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert float(got_fit) == want_fit


def test_wmf_train_restores_host_arrays(small_inter):
    """After train() the embeddings are mutable host ndarrays again
    (export / cold-start writeback contract) despite the device-resident
    loop."""
    from topk_rec_tpu.models import WMF

    m = WMF(k=4, seed=0)
    m.set_interactions(small_inter)
    m.train(max_iter=3, tol=0.0, verbose=False)
    assert type(m.fue) is np.ndarray and type(m.fie) is np.ndarray
    m.fue[0, 0] = 123.0  # must be writable
    assert m.fue[0, 0] == 123.0
