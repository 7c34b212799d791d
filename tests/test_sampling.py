"""Triplet sampler tests: validity + distribution properties."""

import jax
import numpy as np

from topk_rec_tpu.ops.sampling import TripletSampler


def test_triplets_valid(small_inter):
    sampler = TripletSampler(small_inter)
    pos = set(zip(small_inter.pos_u.tolist(), small_inter.pos_i.tolist()))
    u, i, j = sampler.sample_numpy(jax.random.PRNGKey(0), 4096)
    rated = set(small_inter.rated_users.tolist())
    for uu, ii, jj in zip(u, i, j):
        assert uu in rated
        assert (uu, ii) in pos, "i must be a positive of u"
        assert (uu, jj) not in pos, "j must not be a positive of u"
        assert 0 <= jj < small_inter.n_items


def test_user_uniformity(small_inter):
    sampler = TripletSampler(small_inter)
    u, _, _ = sampler.sample_numpy(jax.random.PRNGKey(1), 60000)
    counts = np.bincount(u, minlength=small_inter.n_users)
    rated = small_inter.rated_users
    expected = 60000 / len(rated)
    assert counts[rated].min() > 0.6 * expected
    assert counts[rated].max() < 1.5 * expected
    unrated = np.setdiff1d(np.arange(small_inter.n_users), rated)
    assert counts[unrated].sum() == 0


def test_positive_uniform_within_user(small_inter):
    sampler = TripletSampler(small_inter)
    u, i, _ = sampler.sample_numpy(jax.random.PRNGKey(2), 120000)
    # pick the highest-degree user and check its positives are ~uniform
    target = int(np.argmax(small_inter.user_deg))
    indptr, flat = small_inter.user_csr
    positives = flat[indptr[target]:indptr[target + 1]]
    sel = i[u == target]
    counts = np.bincount(sel, minlength=small_inter.n_items)[positives]
    assert counts.min() > 0
    assert counts.max() < 3.5 * max(1, counts.mean())


def test_negative_distribution(small_inter):
    """Kept negatives are ~uniform over each user's non-positives."""
    sampler = TripletSampler(small_inter)
    u, _, j = sampler.sample_numpy(jax.random.PRNGKey(3), 120000)
    target = int(np.argmax(small_inter.user_deg))
    indptr, flat = small_inter.user_csr
    positives = set(flat[indptr[target]:indptr[target + 1]].tolist())
    negs = [x for x in range(small_inter.n_items) if x not in positives]
    sel = j[u == target]
    counts = np.bincount(sel, minlength=small_inter.n_items)
    assert counts[list(positives)].sum() == 0
    neg_counts = counts[negs]
    assert neg_counts.max() < 4.0 * max(1.0, neg_counts.mean())


def test_determinism(small_inter):
    s1 = TripletSampler(small_inter)
    s2 = TripletSampler(small_inter)
    a = s1.sample_numpy(jax.random.PRNGKey(7), 256)
    b = s2.sample_numpy(jax.random.PRNGKey(7), 256)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sorted_membership_identical_to_bitmap(small_inter):
    """The sorted-CSR probe consumes the PRNG exactly like the bitmap
    probe, so the same key yields BYTE-IDENTICAL triplets — the strongest
    form of "identical sampling distribution" (VERDICT r4 next #1a)."""
    bm = TripletSampler(small_inter, membership="bitmap")
    so = TripletSampler(small_inter, membership="sorted")
    assert bm.membership == "bitmap" and so.membership == "sorted"
    for seed in (0, 3, 11):
        a = bm.sample_numpy(jax.random.PRNGKey(seed), 4096)
        b = so.sample_numpy(jax.random.PRNGKey(seed), 4096)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_sorted_membership_valid(small_inter):
    """Sorted-path triplets satisfy the full validity contract on their
    own (not only via equality with the bitmap path)."""
    sampler = TripletSampler(small_inter, membership="sorted")
    pos = set(zip(small_inter.pos_u.tolist(), small_inter.pos_i.tolist()))
    u, i, j = sampler.sample_numpy(jax.random.PRNGKey(5), 4096)
    rated = set(small_inter.rated_users.tolist())
    for uu, ii, jj in zip(u, i, j):
        assert uu in rated
        assert (uu, ii) in pos
        assert (uu, jj) not in pos
        assert 0 <= jj < small_inter.n_items


def test_membership_auto_selection(small_inter):
    """auto picks bitmap under the budget, sorted above it."""
    assert TripletSampler(small_inter).membership == "bitmap"
    tiny_budget = TripletSampler(
        small_inter, membership="auto", bitmap_budget_bytes=1
    )
    assert tiny_budget.membership == "sorted"
    # and the tiny-budget sampler still samples correctly
    u, i, j = tiny_budget.sample_numpy(jax.random.PRNGKey(9), 512)
    assert len(u) == 512


def test_bpr_training_identical_across_membership(small_inter):
    """End-to-end: BPR trained with the sorted-CSR store yields exactly
    the same parameters as with the bitmap store (same seed => identical
    triplet stream => identical SGD trajectory)."""
    from topk_rec_tpu.models import BPR

    out = {}
    for membership in ("bitmap", "sorted"):
        m = BPR(k=8, seed=3, membership=membership)
        m.set_interactions(small_inter)
        m.train(epochs=1, batch_size=64, epoch_sample_limit=640,
                scan_steps=10, verbose=False)
        out[membership] = (m.fue.copy(), m.fie.copy(), m.fib.copy())
    for a, b in zip(out["bitmap"], out["sorted"]):
        np.testing.assert_array_equal(a, b)


def test_single_negative_user_both_stores():
    """A user whose positives cover all items but one: every sampled
    negative for that user must be that one item, through both
    membership stores (stresses the rejection fixup loop)."""
    from topk_rec_tpu.data.dataset import Interactions

    n_items = 40
    # user 0 likes everything except item 17; user 1 likes item 3 only
    pos_u = np.array([0] * (n_items - 1) + [1], np.int32)
    pos_i = np.array(
        [i for i in range(n_items) if i != 17] + [3], np.int32
    )
    inter = Interactions(2, n_items, pos_u, pos_i)
    for membership in ("bitmap", "sorted"):
        s = TripletSampler(inter, membership=membership)
        u, i, j = s.sample_numpy(jax.random.PRNGKey(1), 512)
        assert np.all(j[u == 0] == 17), membership
        assert np.all(j[u == 1] != 3), membership
