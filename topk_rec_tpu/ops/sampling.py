"""Device-side BPR triplet sampling.

Replaces the reference's per-element Python rejection loop
(reference single/bpr.py:155-165: uniform user, uniform positive from the
user's list, rejection-sampled uniform negative) with a fully vectorized,
jit-compiled scheme that preserves the sampling distribution:

* users: uniform over users with >=1 positive (``np.random.choice(tr_users)``
  parity);
* positives: uniform over the user's CSR positive list;
* negatives: draw K uniform item candidates per triplet, probe the packed
  positive bitmap (one uint32 gather + shift per candidate), and keep the
  first non-positive candidate; the rare rows where all K draws hit
  positives (probability (deg/m)^K) are fixed up by a ``while_loop`` that
  redraws until valid — so every kept draw is *exactly* uniform over the
  user's negatives: the same distribution as the reference's rejection
  sampler, with no residual bias.

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


class TripletSampler:
    """Stateless device sampler bound to one fold's CSR/bitmap layout."""

    def __init__(self, inter: Interactions, k_candidates: int = 2):
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
        self.pos_bitmap = jnp.asarray(inter.pos_bitmap)
        self.n_items = inter.n_items
        self.k_candidates = k_candidates

    def __call__(
        self, key: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
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
