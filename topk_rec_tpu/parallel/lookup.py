"""Explicit all-to-all embedding lookup over a row-sharded table.

The distributed trainers lean on GSPMD to turn `table[idx]` into
collective gathers, which is optimal on a single slice. On multi-host
pods the production pattern is an EXPLICIT exchange — deduplicate the
indices each device needs, route each unique index to the shard that
owns the row (fixed per-destination capacity so shapes stay static),
gather locally, route the rows back — the parameter-server step rebuilt
on ``shard_map`` + ``lax.all_to_all`` (SURVEY §2.4 / §7 "hard parts":
dedup + capacity + overflow accounting; the reference has no
distribution at all, its only gather is a host ``embedding_lookup``,
reference single/bpr.py:81-86).

Layout (all static shapes; S shards, per-device batch b):
  1. sort + dedup the local indices (pad slots carry a sentinel);
  2. owners are contiguous runs of the sorted uniques (row-block
     sharding), so the [S, C] send buffer fills by run offset; uniques
     beyond a destination's capacity C are DROPPED and counted;
  3. ``all_to_all`` indices → each shard serves its rows → ``all_to_all``
     rows back;
  4. expand unique rows to the original occurrence order through the
     dedup segment map. Dropped/overflow slots return zero rows.

Returns per-device overflow counts so callers can size ``capacity`` (a
power-law-degree batch needs capacity ≈ batch/S only when indices are
uniformly owned — skewed batches need headroom; callers retry or resize
on overflow, they never get silently-wrong gradients: dropped rows are
zero, exactly like a masked-out example).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# plain int (NOT a jnp constant: module-level jnp array creation
# would initialize the XLA backend at import time and break
# jax.distributed.initialize ordering in multi-process workers)
_SENTINEL = 2**31 - 1


def _dedup_sorted(idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sorted uniques (sentinel-padded) + occurrence→slot segment map."""
    b = idx.shape[0]
    order = jnp.argsort(idx)
    sidx = idx[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    slot_sorted = (jnp.cumsum(first) - 1).astype(jnp.int32)
    seg = jnp.zeros((b,), jnp.int32).at[order].set(slot_sorted)
    uniq = jnp.full((b,), _SENTINEL, jnp.int32).at[slot_sorted].set(sidx)
    return uniq, seg


def _exchange(table_local, idx_local, axis, n_shards, rows_per_shard,
              capacity):
    """Per-device body (runs under shard_map)."""
    table_local = table_local  # [rows_per_shard, k]
    idx = idx_local.reshape(-1)  # [b]
    uniq, seg = _dedup_sorted(idx)
    owner = jnp.where(
        uniq == _SENTINEL, n_shards, uniq // rows_per_shard
    ).astype(jnp.int32)
    # uniq ascending => owner nondecreasing: destination runs are
    # contiguous; position within run = rank - first rank of that owner
    start = jnp.searchsorted(
        owner, jnp.arange(n_shards, dtype=jnp.int32), side="left"
    )
    pos_in_run = jnp.arange(uniq.shape[0], dtype=jnp.int32) - start[
        jnp.minimum(owner, n_shards - 1)
    ]
    ok = (uniq != _SENTINEL) & (pos_in_run < capacity)
    overflow = jnp.sum((uniq != _SENTINEL) & ~ok)
    send = jnp.full((n_shards, capacity), _SENTINEL, jnp.int32)
    # not-ok entries scatter out of bounds so mode="drop" discards them
    # (clamping them instead would overwrite valid slots with sentinels)
    send = send.at[
        jnp.where(ok, owner, n_shards), jnp.where(ok, pos_in_run, capacity)
    ].set(uniq, mode="drop")
    # route requests to owners; serve; route rows back
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    my_shard = jax.lax.axis_index(axis)
    local = recv - my_shard * rows_per_shard
    zero = jnp.zeros((), table_local.dtype)
    served = jnp.where(
        (recv != _SENTINEL)[..., None],
        table_local.at[jnp.clip(local, 0, rows_per_shard - 1)].get(),
        zero,
    )
    rows_back = jax.lax.all_to_all(served, axis, split_axis=0, concat_axis=0)
    # reconstruct per-unique rows, then expand to occurrences
    uniq_rows = jnp.where(
        ok[:, None],
        rows_back[
            jnp.minimum(owner, n_shards - 1),
            jnp.clip(pos_in_run, 0, capacity - 1),
        ],
        zero,
    )
    out = uniq_rows[seg]
    return (
        out.reshape(idx_local.shape + (table_local.shape[1],)),
        overflow.reshape(1).astype(jnp.int32),
    )


def sharded_lookup(
    table,
    idx,
    mesh: Mesh,
    axis: str = "mp",
    capacity: int = 0,
):
    """Gather ``table[idx]`` via explicit deduplicated all-to-all exchange.

    Args:
      table: [n_rows, k] (any dtype), row-sharded (or shardable) over
        ``axis``; n_rows must divide the axis size.
      idx: int32 [B] lookup indices, split over ``axis`` (B must divide).
      capacity: per-destination request slots per device; 0 picks
        ``2 * ceil(B_local / n_shards)`` (2x headroom over a uniform
        spread).

    Returns (rows [B, k], overflow int32[n_shards] — uniques dropped per
    requesting device; zero means the gather is exact).
    """
    n_shards = int(np.prod([
        s for s, n in zip(mesh.devices.shape, mesh.axis_names) if n == axis
    ]))
    n_rows, kdim = table.shape
    assert n_rows % n_shards == 0, (n_rows, n_shards)
    b_total = idx.shape[0]
    assert b_total % n_shards == 0, (b_total, n_shards)
    if capacity <= 0:
        capacity = 2 * (-(-(b_total // n_shards) // n_shards))
    rows_per_shard = n_rows // n_shards
    # other mesh axes are unused: keep table/idx replicated across them
    body = partial(
        _exchange,
        axis=axis,
        n_shards=n_shards,
        rows_per_shard=rows_per_shard,
        capacity=capacity,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis)),
    )
    table_d = jax.device_put(table, NamedSharding(mesh, P(axis, None)))
    idx_d = jax.device_put(
        jnp.asarray(idx, jnp.int32), NamedSharding(mesh, P(axis))
    )
    rows, overflow = jax.jit(fn)(table_d, idx_d)
    return rows, overflow
