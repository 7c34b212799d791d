"""Sparse row-wise RMSProp: aggregate duplicate rows, update only touched rows.

The straightforward XLA formulation of an embedding-table update
(scatter-add into a dense zero gradient table, then a masked elementwise
update) moves O(n_rows·k) bytes per step even when the batch touches only
a few hundred rows. This helper keeps everything in O(batch·k):

  1. sort the row indices (tiny batch-sized sort),
  2. segment-sum gradients over duplicate runs and broadcast the aggregate
     back to every duplicate position,
  3. compute the RMSProp update from the *original* accumulator row — all
     duplicates of a row produce the identical new value,
  4. scatter with ``.set`` (duplicate writes carry equal values, so the
     result is deterministic regardless of write order).

Matches TF1's IndexedSlices RMSProp semantics (aggregate grads, one
accumulator update per touched row — decay 0.9, eps 1e-10 in the sqrt),
which is what the reference's ``embedding_lookup`` training used
(reference single/bpr.py:81-100).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sparse_rmsprop(
    table: jax.Array,   # [n_rows, k] (or [n_rows] for biases)
    acc: jax.Array,     # same shape — second-moment accumulator
    idx: jax.Array,     # int32 [M] touched rows (duplicates allowed)
    grads: jax.Array,   # [M, k] (or [M]) per-occurrence gradients
    lr: float,
    decay: float = 0.9,
    eps: float = 1e-10,
) -> Tuple[jax.Array, jax.Array]:
    """One sparse RMSProp step; returns (new_table, new_acc)."""
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
        acc = acc[:, None]
        grads = grads[:, None]
    m = idx.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    sgrads = grads[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]]
    )
    seg = jnp.cumsum(first) - 1                     # [M] segment id
    agg = jax.ops.segment_sum(sgrads, seg, num_segments=m)
    g = agg[seg]                                    # aggregate per duplicate
    acc_rows = acc[sidx]
    acc_new = decay * acc_rows + (1.0 - decay) * g * g
    upd = table[sidx] - lr * g / jnp.sqrt(acc_new + eps)
    table = table.at[sidx].set(upd)
    acc = acc.at[sidx].set(acc_new)
    if squeeze:
        table = table[:, 0]
        acc = acc[:, 0]
    return table, acc
