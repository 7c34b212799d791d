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
  first non-positive candidate. With catalog size m and user degree deg the
  chance that all K draws hit positives is (deg/m)^K — at K=8 this is
  astronomically small for any realistic degree, and each *kept* draw is
  exactly uniform over the user's negatives, matching the reference's
  rejection sampler's distribution.

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
    tr_users: jax.Array,    # int32 [n_tr_users]
    indptr: jax.Array,      # int32 [n_users + 1]
    flat_pos: jax.Array,    # int32 [nnz]
    deg: jax.Array,         # int32 [n_users]
    pos_bitmap: jax.Array,  # uint32 [n_users, n_words]
    batch_size: int,
    n_items: int,
    k_candidates: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    ku, ki, kj = jax.random.split(key, 3)
    uidx = jax.random.randint(ku, (batch_size,), 0, tr_users.shape[0])
    u = tr_users[uidx]
    r = jax.random.randint(ki, (batch_size,), 0, deg[u])
    i = flat_pos[indptr[u] + r]
    cand = jax.random.randint(kj, (batch_size, k_candidates), 0, n_items)
    words = pos_bitmap[u[:, None], cand >> 5]
    is_pos = (words >> cand.astype(jnp.uint32) % 32) & jnp.uint32(1)
    valid = is_pos == 0
    # argmax picks the first True column; if none valid (probability
    # (deg/m)^K) we fall back to the first candidate.
    first = jnp.argmax(valid, axis=1)
    j = cand[jnp.arange(batch_size), first]
    return u, i, j


class TripletSampler:
    """Stateless device sampler bound to one fold's CSR/bitmap layout."""

    def __init__(self, inter: Interactions, k_candidates: int = 8):
        indptr, flat = inter.user_csr
        self.tr_users = jnp.asarray(inter.rated_users)
        self.indptr = jnp.asarray(indptr)
        self.flat_pos = jnp.asarray(flat)
        self.deg = jnp.asarray(inter.user_deg)
        self.pos_bitmap = jnp.asarray(inter.pos_bitmap)
        self.n_items = inter.n_items
        self.k_candidates = k_candidates

    def __call__(
        self, key: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return _sample_triplets(
            key,
            self.tr_users,
            self.indptr,
            self.flat_pos,
            self.deg,
            self.pos_bitmap,
            batch_size,
            self.n_items,
            self.k_candidates,
        )

    def sample_numpy(self, key, batch_size: int):
        u, i, j = self(key, batch_size)
        return np.asarray(u), np.asarray(i), np.asarray(j)
