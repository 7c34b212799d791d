"""Fused score+top-k Pallas kernel vs lax.top_k reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topk_rec_tpu.ops.topk_pallas import (
    expand_seen_mask,
    fused_score_topk,
    pack_candidate_bitmap,
)


def _reference(U, V, bias, mask, k):
    scores = U @ V.T
    if bias is not None:
        scores = scores + bias[None, :]
    scores = np.where(mask != 0, np.float32(np.finfo(np.float32).min), scores)
    vals, idx = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(vals), np.asarray(idx)


@pytest.mark.parametrize("n_u,n_i,d,k", [(64, 96, 16, 8), (130, 300, 20, 30)])
def test_fused_matches_topk(n_u, n_i, d, k):
    rng = np.random.default_rng(0)
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    bias = rng.normal(size=n_i).astype(np.float32)
    mask = (rng.random((n_u, n_i)) < 0.2).astype(np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(bias), jnp.asarray(mask),
        k, block_u=32, block_i=128, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, bias, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_no_bias_and_overflow():
    """Users whose unseen count < k get float32.min sentinels, like the
    -inf padding in the XLA path."""
    rng = np.random.default_rng(1)
    U = rng.normal(size=(8, 4)).astype(np.float32)
    V = rng.normal(size=(10, 4)).astype(np.float32)
    mask = np.zeros((8, 10), np.int8)
    mask[0, :] = 1
    mask[0, 3] = 0  # user 0 has exactly one unseen item
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        5, block_u=8, block_i=128, interpret=True,
    )
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    assert idx[0, 0] == 3
    assert (vals[0, 1:] == np.finfo(np.float32).min).all()


def test_mask_roundtrip():
    rng = np.random.default_rng(2)
    n_users, n_items = 40, 100
    dense = (rng.random((n_users, n_items)) < 0.3).astype(np.uint32)
    n_words = (n_items + 31) // 32
    bm = np.zeros((n_users, n_words), dtype=np.uint32)
    for u, i in zip(*np.nonzero(dense)):
        bm[u, i >> 5] |= np.uint32(1) << np.uint32(i & 31)
    cand = rng.choice(n_items, size=37, replace=False)
    packed = pack_candidate_bitmap(bm, cand)
    expanded = np.asarray(expand_seen_mask(jnp.asarray(packed), 37))
    np.testing.assert_array_equal(expanded, dense[:, cand].astype(np.int8))


def test_fused_adversarial_group_collision():
    """Three of the top-k inside ONE lane-strided group: top-2 visibility
    misses the third, the m3 suspect detector must fire and the in-jit
    exact fallback must repair the row to lax.top_k's answer."""
    n_i, k = 384, 4  # one tile, C=3 chunks -> groups of 3
    d = 1
    U = np.ones((8, d), np.float32)
    V = np.full((n_i, d), -5.0, np.float32)
    # group j=5 = lanes {5, 133, 261}: all three carry top scores
    V[5, 0], V[133, 0], V[261, 0] = 100.0, 99.0, 98.0
    V[7, 0] = 50.0  # 4th best lives elsewhere
    mask = np.zeros((8, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=8, block_i=384, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert list(np.asarray(idx)[0]) == [5, 133, 261, 7]


def test_fused_adversarial_depth3_collision():
    """FOUR of the top-k inside ONE lane-strided group: depth-3 (top-3
    per group) visibility misses the fourth, the m4 suspect detector must
    fire and the in-jit exact fallback must repair the row."""
    n_i, k = 640, 5  # one tile, C=5 chunks -> groups of 5
    d = 1
    U = np.ones((8, d), np.float32)
    V = np.full((n_i, d), -5.0, np.float32)
    # group j=9 = lanes {9, 137, 265, 393, 521}: four carry top scores
    V[9, 0], V[137, 0], V[265, 0], V[393, 0] = 100.0, 99.0, 98.0, 97.0
    V[11, 0] = 50.0  # 5th best lives elsewhere
    mask = np.zeros((8, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=8, block_i=640, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert list(np.asarray(idx)[0]) == [9, 137, 265, 393, 11]


def test_fused_all_ties_full_fallback():
    """Fully tied scores trigger the >= suspect condition on every row;
    the overflow path must fall back to full lax.top_k (identical order)."""
    n_u, n_i, k = 16, 384, 6
    U = np.ones((n_u, 2), np.float32)
    V = np.ones((n_i, 2), np.float32)
    mask = np.zeros((n_u, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=8, block_i=384, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_large_catalog_span_merge():
    """Catalogs beyond 3 item tiles process in column spans (bounded VMEM
    scratch) whose exact per-span top-ks merge to the exact global top-k,
    tie order included."""
    rng = np.random.default_rng(7)
    n_u, n_i, d, k = 48, 1500, 12, 16  # block_i=128 -> 3-tile spans of 384
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    bias = rng.normal(size=n_i).astype(np.float32)
    mask = (rng.random((n_u, n_i)) < 0.1).astype(np.int8)
    # plant exact cross-span ties (same embedding row in three spans)
    V[700] = V[10]
    V[1300] = V[10]
    bias[700] = bias[10]
    bias[1300] = bias[10]
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(bias), jnp.asarray(mask),
        k, block_u=16, block_i=128, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, bias, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_adversarial_regroup_m5_collision():
    """FIVE of the top-k share one lane class (col mod 128) spread across
    item tiles: every one survives the per-tile depth-3 stats, but the v4
    regroup (depth 4 per lane) must displace the fifth — the m5 trigger
    has to fire and the in-jit exact fallback must repair the row."""
    n_i, k = 768, 6  # 3 tiles of 256 (C=2), merged W=1152 -> regroup to 512
    d = 1
    U = np.ones((8, d), np.float32)
    V = np.full((n_i, d), -5.0, np.float32)
    # lane class 7: cols 7,135 (tile 0), 263,391 (tile 1), 519 (tile 2) —
    # at most 2 per (tile, group) so all are stats-visible (C=2)
    for col, s in [(7, 100.0), (135, 99.0), (263, 98.0), (391, 97.0),
                   (519, 96.0)]:
        V[col, 0] = s
    V[11, 0] = 50.0  # 6th best lives in another lane class
    mask = np.zeros((8, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=8, block_i=256, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert list(np.asarray(idx)[0]) == [7, 135, 263, 391, 519, 11]


def test_fused_large_k_skips_regroup():
    """k above _REGROUP_MAX_K must bypass the regroup (quintuple-collision
    rate would swamp the repair capacity) and still match lax.top_k on a
    multi-tile catalog."""
    rng = np.random.default_rng(11)
    n_u, n_i, d, k = 32, 768, 8, 64
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    mask = (rng.random((n_u, n_i)) < 0.1).astype(np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=16, block_i=256, interpret=True,
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


@pytest.mark.parametrize("n_u,n_i,d,k", [(64, 96, 16, 8), (130, 300, 20, 30)])
def test_fused_xla_extract_matches_topk(n_u, n_i, d, k):
    """extract='xla' (candidate buffers selected by lax.top_k on the XLA
    side) must equal the in-kernel rounds path and lax.top_k."""
    rng = np.random.default_rng(5)
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    bias = rng.normal(size=n_i).astype(np.float32)
    mask = (rng.random((n_u, n_i)) < 0.2).astype(np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(bias), jnp.asarray(mask),
        k, block_u=32, block_i=128, interpret=True, extract="xla",
    )
    want_vals, want_idx = _reference(U, V, bias, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_xla_extract_tie_repair():
    """Buffer-position tie order differs from item order: the xla-extract
    path must flag tie rows suspect and repair to lax.top_k order."""
    n_u, n_i, k = 16, 384, 6
    U = np.ones((n_u, 2), np.float32)
    V = np.ones((n_i, 2), np.float32)  # fully tied scores
    mask = np.zeros((n_u, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), None, jnp.asarray(mask),
        k, block_u=8, block_i=128, interpret=True, extract="xla",
    )
    want_vals, want_idx = _reference(U, V, None, mask, k)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_fused_span_padding_never_returned():
    """Catalog padded to a whole number of spans: padded columns score
    0 from zero embeddings, so if their mask=1 were lost they would WIN
    over these all-negative real scores — assert they never appear."""
    rng = np.random.default_rng(11)
    n_u, n_i, d, k = 32, 400, 8, 10  # spans of 384 -> padded to 768
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    # shift all real scores strictly negative via a large negative bias
    bias = np.full(n_i, -100.0, np.float32)
    mask = np.zeros((n_u, n_i), np.int8)
    vals, idx = fused_score_topk(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(bias), jnp.asarray(mask),
        k, block_u=16, block_i=128, interpret=True,
    )
    idx = np.asarray(idx)
    assert idx.max() < n_i, "padded span column leaked into results"
    want_vals, want_idx = _reference(U, V, bias, mask, k)
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-5)
