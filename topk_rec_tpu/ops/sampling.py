"""Device-side BPR triplet sampling.

Replaces the reference's per-element Python rejection loop
(reference single/bpr.py:155-165: uniform user, uniform positive from the
user's list, rejection-sampled uniform negative) with a fully vectorized,
jit-compiled scheme that preserves the sampling distribution:

* users: uniform over users with >=1 positive (``np.random.choice(tr_users)``
  parity);
* positives: uniform over the user's CSR positive list;
* negatives: draw K uniform item candidates per triplet, probe
  positive-set membership, and keep the first non-positive candidate; the
  rare rows where all K draws hit positives (probability (deg/m)^K) are
  fixed up by a ``while_loop`` that redraws until valid — so every kept
  draw is *exactly* uniform over the user's negatives: the same
  distribution as the reference's rejection sampler, with no residual
  bias.

Two membership stores, auto-selected by footprint (``membership=``):

* ``"bitmap"``: packed uint32 bitmap, n_users × ceil(n_items/32) words
  (one gather + shift per probe). ~87 MB at MovieLens scale, but
  n_users×n_items/8 bytes generally — 12.5 GB at 1M users × 100K items,
  past HBM at production scale.
* ``"sorted"``: per-user sorted CSR positive lists probed by a
  fixed-depth vectorized binary search (ceil(log2(max_deg+1)) gathers
  per probe). nnz × 4 bytes total — scale-independent of the catalog
  size. Both paths consume the PRNG identically, so the same key yields
  byte-identical triplets (tested).

All state lives on device; one fused kernel produces (u, i, j) per batch.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Interactions


@partial(jax.jit, static_argnames=("batch_size", "n_items", "k_candidates"))
def _sample_triplets(
    key: jax.Array,
    user_rows: jax.Array,   # int32 [n_tr_users, 3]: (user id, CSR start, degree)
    flat_pos: jax.Array,    # int32 [nnz]
    pos_bitmap: jax.Array,  # uint32 [n_users, n_words]
    batch_size: int,
    n_items: int,
    k_candidates: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    ku, ki, kj, kfix = jax.random.split(key, 4)
    uidx = jax.random.randint(ku, (batch_size,), 0, user_rows.shape[0])
    # one [B,3] row gather for (user id, CSR start, degree) instead of
    # three scalar gathers — TPU gather cost is per-index, not per-byte
    rows = user_rows[uidx]
    u = rows[:, 0]
    r = jax.random.randint(ki, (batch_size,), 0, rows[:, 2])
    i = flat_pos[rows[:, 1] + r]
    cand = jax.random.randint(kj, (batch_size, k_candidates), 0, n_items)
    words = pos_bitmap[u[:, None], cand >> 5]
    is_pos = (words >> cand.astype(jnp.uint32) % 32) & jnp.uint32(1)
    valid = is_pos == 0
    # argmax picks the first True column
    first = jnp.argmax(valid, axis=1)
    j = cand[jnp.arange(batch_size), first]
    invalid = ~jnp.any(valid, axis=1)

    # Exact-rejection fixup for rows where every candidate was a positive.
    def cond(state):
        _, _, invalid = state
        return jnp.any(invalid)

    def body(state):
        key, j, invalid = state
        key, sub = jax.random.split(key)
        redraw = jax.random.randint(sub, (batch_size,), 0, n_items)
        w = pos_bitmap[u, redraw >> 5]
        ok = ((w >> redraw.astype(jnp.uint32) % 32) & jnp.uint32(1)) == 0
        take = invalid & ok
        return key, jnp.where(take, redraw, j), invalid & ~take

    _, j, _ = jax.lax.while_loop(cond, body, (kfix, j, invalid))
    return u, i, j


def _lower_bound(
    flat_sorted: jax.Array, lo: jax.Array, hi: jax.Array, x: jax.Array,
    n_iters: int,
) -> jax.Array:
    """Vectorized lower_bound of x within flat_sorted[lo:hi) segments.

    Fixed iteration depth (static n_iters >= ceil(log2(max segment
    length + 1))) so the whole search is straight-line code under jit —
    each round is ONE gather over the flat array plus elementwise
    selects; converged rows idle via where-masking."""
    n = flat_sorted.shape[0]

    def body(_, state):
        lo, hi = state
        # overflow-safe midpoint: (lo+hi) wraps int32 past nnz ~ 2^30,
        # exactly the huge-nnz regime this store exists for
        mid = lo + ((hi - lo) >> 1)
        v = flat_sorted[jnp.clip(mid, 0, n - 1)]
        less = v < x
        active = lo < hi
        new_lo = jnp.where(less, mid + 1, lo)
        new_hi = jnp.where(less, hi, mid)
        return (
            jnp.where(active, new_lo, lo),
            jnp.where(active, new_hi, hi),
        )

    lo, _ = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_items", "k_candidates", "n_probe_iters"),
)
def _sample_triplets_sorted(
    key: jax.Array,
    user_rows: jax.Array,    # int32 [n_tr_users, 3]: (user id, CSR start, degree)
    flat_pos: jax.Array,     # int32 [nnz] (CSR order, for positive draws)
    flat_sorted: jax.Array,  # int32 [nnz] (per-user segments ascending)
    batch_size: int,
    n_items: int,
    k_candidates: int,
    n_probe_iters: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sorted-CSR membership variant of `_sample_triplets` — identical
    PRNG consumption pattern, so same key => byte-identical triplets."""
    # 0 probe iterations would silently skip membership detection and
    # let positives through as "negatives" — fail at trace time instead.
    # NOTE this only rejects the obviously-broken value: the SUFFICIENT
    # bound is ceil(log2(max_deg+1)), which depends on the fold and is
    # derived by TripletSampler.__init__ — direct callers own it.
    if n_probe_iters < 1:
        raise ValueError(
            "n_probe_iters must be >= 1 (TripletSampler derives the "
            "sufficient ceil(log2(max_deg+1)); an under-provisioned "
            "value corrupts membership detection silently)"
        )
    ku, ki, kj, kfix = jax.random.split(key, 4)
    uidx = jax.random.randint(ku, (batch_size,), 0, user_rows.shape[0])
    rows = user_rows[uidx]
    u = rows[:, 0]
    start = rows[:, 1]
    deg = rows[:, 2]
    r = jax.random.randint(ki, (batch_size,), 0, deg)
    i = flat_pos[start + r]
    cand = jax.random.randint(kj, (batch_size, k_candidates), 0, n_items)
    lb = _lower_bound(
        flat_sorted, jnp.broadcast_to(start[:, None], cand.shape),
        jnp.broadcast_to((start + deg)[:, None], cand.shape),
        cand, n_probe_iters,
    )
    n = flat_sorted.shape[0]
    is_pos = (lb < (start + deg)[:, None]) & (
        flat_sorted[jnp.clip(lb, 0, n - 1)] == cand
    )
    valid = ~is_pos
    first = jnp.argmax(valid, axis=1)
    j = cand[jnp.arange(batch_size), first]
    invalid = ~jnp.any(valid, axis=1)

    def cond(state):
        _, _, invalid = state
        return jnp.any(invalid)

    def body(state):
        key, j, invalid = state
        key, sub = jax.random.split(key)
        redraw = jax.random.randint(sub, (batch_size,), 0, n_items)
        lb = _lower_bound(
            flat_sorted, start, start + deg, redraw, n_probe_iters
        )
        hit = (lb < start + deg) & (
            flat_sorted[jnp.clip(lb, 0, n - 1)] == redraw
        )
        take = invalid & ~hit
        return key, jnp.where(take, redraw, j), invalid & ~take

    _, j, _ = jax.lax.while_loop(cond, body, (kfix, j, invalid))
    return u, i, j


class TripletSampler:
    """Stateless device sampler bound to one fold's membership layout.

    ``membership``: ``"bitmap"`` | ``"sorted"`` | ``"auto"`` (default).
    Auto picks the dense bitmap while it fits ``bitmap_budget_bytes``
    (default 1 GiB — MovieLens is ~87 MB) and the catalog-size-independent
    sorted-CSR probe beyond (1M users × 100K items would need a 12.5 GB
    bitmap; the sorted store is nnz × 4 B). Replaces the reference's
    per-user Python set probe (reference single/bpr.py:159-164)."""

    def __init__(
        self,
        inter: Interactions,
        k_candidates: int = 2,
        membership: str = "auto",
        bitmap_budget_bytes: int = 1 << 30,
    ):
        indptr, flat = inter.user_csr
        tr = np.asarray(inter.rated_users, dtype=np.int32)
        self.user_rows = jnp.asarray(
            np.stack(
                [
                    tr,
                    np.asarray(indptr, np.int32)[tr],
                    np.asarray(inter.user_deg, np.int32)[tr],
                ],
                axis=1,
            )
        )
        self.flat_pos = jnp.asarray(flat)
        assert membership in ("auto", "bitmap", "sorted"), membership
        if membership == "auto":
            bitmap_bytes = inter.n_users * ((inter.n_items + 31) // 32) * 4
            membership = (
                "bitmap" if bitmap_bytes <= bitmap_budget_bytes else "sorted"
            )
        self.membership = membership
        if membership == "bitmap":
            self.pos_bitmap = jnp.asarray(inter.pos_bitmap)
        else:
            # per-user ascending positive lists: same CSR segments, cols
            # sorted within each row (lexsort keeps it O(nnz log nnz) on
            # host, once per fold)
            order = np.lexsort((inter.pos_i, inter.pos_u))
            self.flat_sorted = jnp.asarray(
                np.ascontiguousarray(inter.pos_i[order], dtype=np.int32)
            )
            max_deg = int(inter.user_deg.max()) if len(tr) else 1
            self.n_probe_iters = max(1, int(np.ceil(np.log2(max_deg + 1))))
        self.n_items = inter.n_items
        self.k_candidates = k_candidates

    def __call__(
        self, key: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.membership == "sorted":
            return _sample_triplets_sorted(
                key,
                self.user_rows,
                self.flat_pos,
                self.flat_sorted,
                batch_size,
                self.n_items,
                self.k_candidates,
                self.n_probe_iters,
            )
        return _sample_triplets(
            key,
            self.user_rows,
            self.flat_pos,
            self.pos_bitmap,
            batch_size,
            self.n_items,
            self.k_candidates,
        )

    def sample_numpy(self, key, batch_size: int):
        u, i, j = self(key, batch_size)
        return np.asarray(u), np.asarray(i), np.asarray(j)
