"""Fusion-strategy tests: weights semantics + fused evaluation."""

import numpy as np
import pytest

from topk_rec_tpu.data.dataset import Interactions, synthetic_interactions
from topk_rec_tpu.eval import evaluate_oracle
from topk_rec_tpu.fusion import (
    ModalityScores,
    average_weights,
    bpr_fusion_weights,
    error_weights,
    evaluate_fused,
    rank_geometric_weights,
    svm_fusion_weights,
)


@pytest.fixture(scope="module")
def modal_setup():
    """Two modalities: one informative, one pure noise."""
    rng = np.random.default_rng(0)
    inter = synthetic_interactions(80, 60, 1200, seed=4)
    k = 8
    u_lat = inter._cache["u_lat"][:, :k].astype(np.float32)
    i_lat = inter._cache["i_lat"][:, :k].astype(np.float32)
    good = (u_lat, i_lat)  # scores ~ true affinity
    noise = (
        rng.normal(size=(80, k)).astype(np.float32),
        rng.normal(size=(60, k)).astype(np.float32),
    )
    modalities = ModalityScores([good, noise])
    return inter, modalities


def test_weight_constructors():
    np.testing.assert_allclose(average_weights(4), [0.25] * 4)
    w = rank_geometric_weights(3, 0.5)
    np.testing.assert_allclose(w, [0.5, 0.25, 0.125])


def test_chunk_stack_matches_numpy(modal_setup):
    inter, modalities = modal_setup
    cand = np.arange(10, 40)
    stack = np.asarray(modalities.chunk_stack(5, 25, cand))
    for f, (U, V) in enumerate(zip(modalities._U, modalities._V)):
        want = np.asarray(U)[5:25] @ np.asarray(V)[cand].T
        np.testing.assert_allclose(stack[:, :, f], want, rtol=1e-5)


def test_error_weights_favor_calibrated_modality():
    """The RMSE weighting rewards calibration to the 0/1 ratings
    (efusion.py:78 measures (S - L)² on liked entries), so a modality whose
    scores track the like matrix must beat an uncalibrated/noisy one."""
    rng = np.random.default_rng(7)
    inter = synthetic_interactions(50, 40, 600, seed=9)
    L = inter.dense_matrix()
    # calibrated modality: V = I so S = U = L + small noise
    U_good = (L + 0.1 * rng.normal(size=L.shape)).astype(np.float32)
    V_good = np.eye(inter.n_items, dtype=np.float32)
    U_bad = rng.normal(size=(inter.n_users, 8)).astype(np.float32)
    V_bad = rng.normal(size=(inter.n_items, 8)).astype(np.float32)
    m = ModalityScores([(U_good, V_good), (U_bad, V_bad)])
    w = error_weights(m, inter, np.arange(inter.n_items), user_chunk=16)
    assert w.shape == (inter.n_users, 2)
    better = (w[:, 0] > w[:, 1]).mean()
    assert better > 0.9, better


def test_error_weights_semantics_tiny():
    """Exact-value check against the reference formula (efusion.py:57-82)."""
    # 1 user, 2 candidates, 2 modalities
    U1 = np.array([[1.0]], dtype=np.float32)
    V1 = np.array([[0.9], [0.1]], dtype=np.float32)   # close to likes
    U2 = np.array([[1.0]], dtype=np.float32)
    V2 = np.array([[0.0], [1.0]], dtype=np.float32)   # far from likes
    inter = Interactions(
        1, 2, np.array([0], np.int32), np.array([0], np.int32)
    )
    m = ModalityScores([(U1, V1), (U2, V2)])
    w = error_weights(m, inter, np.arange(2), user_chunk=8)
    # L = [1, 0]; rmse_f = sqrt(((S_f - L)^2 * L).sum() / 1)
    r1 = abs(0.9 - 1.0)
    r2 = abs(0.0 - 1.0)
    mean = (r1 + r2) / 2
    np.testing.assert_allclose(
        w[0], [np.exp(-(r1 - mean)), np.exp(-(r2 - mean))], rtol=1e-5
    )
    assert w[0, 0] > w[0, 1]


def test_svm_weights_favor_good_modality(modal_setup):
    inter, modalities = modal_setup
    w = svm_fusion_weights(modalities, inter, n_samples=20_000, seed=1)
    assert w[0] > abs(w[1]) * 2, w


def test_bpr_weights_favor_good_modality(modal_setup):
    inter, modalities = modal_setup
    w = bpr_fusion_weights(
        modalities, inter, n_samples=200_000, batch_size=5000, lr=1e-3, seed=2
    )
    assert w[0] > abs(w[1]) * 2, w


def test_evaluate_fused_matches_oracle(modal_setup):
    inter, modalities = modal_setup
    rng = np.random.default_rng(3)
    cand = np.arange(inter.n_items)
    likes = {
        u: list(rng.choice(inter.n_items, size=2, replace=False))
        for u in range(0, inter.n_users, 3)
    }
    w = np.array([0.7, 0.3], dtype=np.float32)
    res = evaluate_fused(
        modalities, w, inter.seen_bitmap, cand, likes, step=5, total=20,
        user_chunk=17,
    )
    # oracle on the dense fused matrix
    S = sum(
        wf * (np.asarray(U) @ np.asarray(V).T)
        for wf, U, V in zip(w, modalities._U, modalities._V)
    )
    seen = np.zeros((inter.n_users, inter.n_items), bool)
    seen[inter.seen_u, inter.seen_i] = True
    oracle = evaluate_oracle(S, seen, likes, step=5, total=20)
    np.testing.assert_array_equal(res.hits, oracle.hits)
    assert res.count == oracle.count


def test_evaluate_fused_per_user_weights(modal_setup):
    inter, modalities = modal_setup
    rng = np.random.default_rng(5)
    cand = np.arange(inter.n_items)
    likes = {u: [int(rng.integers(inter.n_items))] for u in range(10)}
    w = rng.random((inter.n_users, 2)).astype(np.float32)
    res = evaluate_fused(
        modalities, w, inter.seen_bitmap, cand, likes, step=5, total=20
    )
    S = np.zeros((inter.n_users, inter.n_items), np.float32)
    for f, (U, V) in enumerate(zip(modalities._U, modalities._V)):
        S += w[:, f : f + 1] * (np.asarray(U) @ np.asarray(V).T)
    seen = np.zeros((inter.n_users, inter.n_items), bool)
    seen[inter.seen_u, inter.seen_i] = True
    oracle = evaluate_oracle(S, seen, likes, step=5, total=20)
    np.testing.assert_array_equal(res.hits, oracle.hits)


def test_evaluate_fused_want_rr(modal_setup):
    """Default fused eval skips the raw-rank pass (rr zeros); want_rr=True
    reproduces the oracle's reciprocal-rank variant."""
    from topk_rec_tpu.eval.protocol import evaluate_oracle

    inter, modalities = modal_setup
    rng = np.random.default_rng(9)
    cand = np.arange(inter.n_items)
    likes = {u: [int(rng.integers(inter.n_items))] for u in range(12)}
    w = np.array([0.5, 0.5], dtype=np.float32)
    res_norr = evaluate_fused(
        modalities, w, inter.seen_bitmap, cand, likes, step=5, total=20
    )
    assert not res_norr.rr.any()
    res_rr = evaluate_fused(
        modalities, w, inter.seen_bitmap, cand, likes, step=5, total=20,
        want_rr=True,
    )
    S = sum(
        wf * (np.asarray(U) @ np.asarray(V).T)
        for wf, U, V in zip(w, modalities._U, modalities._V)
    )
    seen = np.zeros((inter.n_users, inter.n_items), bool)
    seen[inter.seen_u, inter.seen_i] = True
    oracle = evaluate_oracle(S, seen, likes, step=5, total=20)
    np.testing.assert_array_equal(res_rr.hits, oracle.hits)
    np.testing.assert_allclose(res_rr.rr, oracle.rr, rtol=1e-6)
    np.testing.assert_array_equal(res_norr.hits, oracle.hits)


def test_bpr_fusion_heterogeneous_k():
    """Modalities with DIFFERENT embedding widths must fuse correctly
    (the concat-table precompute reduces per-modality column segments;
    a uniform reshape would silently mix columns across modalities)."""
    from topk_rec_tpu.data.dataset import synthetic_interactions
    from topk_rec_tpu.fusion import ModalityScores, bpr_fusion_weights

    rng = np.random.default_rng(4)
    n_u, n_i = 120, 80
    inter = synthetic_interactions(n_u, n_i, 1500, seed=5)
    # modality 0 (k=6) encodes real preference structure; modality 1
    # (k=11, different width) is noise — the learned weight must favor 0
    u_lat = rng.normal(size=(n_u, 6)).astype(np.float32)
    i_lat = rng.normal(size=(n_i, 6)).astype(np.float32)
    # align modality 0 with the actual interactions: bump liked dots
    U0 = u_lat.copy()
    V0 = i_lat.copy()
    for u, i in zip(inter.pos_u.tolist(), inter.pos_i.tolist()):
        V0[i] += 0.05 * U0[u]
    U1 = rng.normal(size=(n_u, 11)).astype(np.float32)
    V1 = rng.normal(size=(n_i, 11)).astype(np.float32)
    m = ModalityScores([(U0, V0), (U1, V1)])
    w = bpr_fusion_weights(m, inter, n_samples=40_000, batch_size=2_000,
                           lr=0.01, seed=0)
    assert w.shape == (2,)
    assert np.all(np.isfinite(w))
    assert w[0] > w[1], w  # informative modality wins
