"""Exactness tests for the approx-repair top-k path (ops/topk_hybrid.py).

The hybrid is exact BY CONSTRUCTION (count audit + bounded re-rank), not
by the approx pass's recall — these tests drive it at hostile settings
(k_extra=0, low recall, tiny repair capacity, engineered ties, rows with
fewer than k unseen items) and require bit-equality with ``lax.top_k``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topk_rec_tpu.ops.topk_hybrid import exact_topk_hybrid
from topk_rec_tpu.ops.topk_pallas import NEG_INF


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n_u, n_i, d = 300, 500, 20
    U = rng.normal(size=(n_u, d)).astype(np.float32)
    V = rng.normal(size=(n_i, d)).astype(np.float32)
    b = rng.normal(size=n_i).astype(np.float32)
    mask = (rng.random((n_u, n_i)) < 0.05).astype(np.int8)
    # engineered ties: quantized blocks create many exact duplicates
    U[:50] = np.round(U[:50])
    V[:100] = np.round(V[:100])
    b = np.round(b)
    scores = U @ V.T + b[None, :]
    scores = np.where(mask != 0, NEG_INF, scores).astype(np.float32)
    return U, V, b, mask, scores


@pytest.mark.parametrize(
    "k_extra,cap,recall", [(20, 64, 0.95), (2, 32, 0.8), (0, 128, 0.9)]
)
def test_hybrid_exact_with_ties(problem, k_extra, cap, recall):
    U, V, b, mask, scores = problem
    k = 30
    ev, ei = jax.lax.top_k(jnp.asarray(scores), k)
    hv, hi = exact_topk_hybrid(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(b), jnp.asarray(mask),
        k, k_extra=k_extra, cap=cap, recall=recall,
        block_u=128, block_i=256,
    )
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(ev))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ei))


def test_hybrid_rows_with_too_few_unseen(problem):
    U, V, b, mask, _ = problem
    k = 30
    mask2 = mask.copy()
    mask2[7, :] = 1
    mask2[7, :5] = 0  # only 5 unseen items -> t collapses to the fill
    scores = U @ V.T + b[None, :]
    scores = np.where(mask2 != 0, NEG_INF, scores).astype(np.float32)
    ev, ei = jax.lax.top_k(jnp.asarray(scores), k)
    hv, hi = exact_topk_hybrid(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(b), jnp.asarray(mask2),
        k, block_u=128, block_i=256,
    )
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(ev))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ei))


def test_hybrid_reports_repair_stats(problem):
    U, V, b, mask, _ = problem
    _, _, n_bad = exact_topk_hybrid(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(b), jnp.asarray(mask),
        10, k_extra=4, block_u=128, block_i=256, with_stats=True,
    )
    assert 0 <= int(n_bad) <= U.shape[0]
