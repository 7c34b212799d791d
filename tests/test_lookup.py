"""Explicit all-to-all embedding lookup (parallel/lookup.py) tests."""

import jax
import numpy as np
import pytest

from topk_rec_tpu.parallel import make_mesh
from topk_rec_tpu.parallel.lookup import sharded_lookup


@pytest.mark.parametrize("dp,mp", [(2, 4), (1, 8)])
def test_sharded_lookup_exact(dp, mp):
    rng = np.random.default_rng(0)
    n_rows, k, B = 64, 6, 48
    table = rng.normal(size=(n_rows, k)).astype(np.float32)
    idx = rng.integers(0, n_rows, size=B).astype(np.int32)
    # force duplicates (dedup path) and cross-shard traffic
    idx[::5] = idx[0]
    mesh = make_mesh(dp=dp, mp=mp)
    rows, overflow = sharded_lookup(table, idx, mesh, capacity=B)
    assert np.asarray(overflow).sum() == 0
    np.testing.assert_allclose(np.asarray(rows), table[idx], rtol=1e-6)


def test_sharded_lookup_overflow_counted():
    """A skewed batch (every index owned by shard 0) with tiny capacity
    must report drops — and dropped slots come back as zero rows, never
    wrong rows."""
    rng = np.random.default_rng(1)
    n_rows, k, B = 64, 4, 32
    table = rng.normal(size=(n_rows, k)).astype(np.float32)
    mesh = make_mesh(dp=1, mp=8)
    rows_per_shard = n_rows // 8
    # every device requests 4 indices, all owned by shard 0; capacity=2
    # forces drops on devices with >2 uniques
    idx = np.concatenate([
        dev * 0 + rng.choice(rows_per_shard, size=4, replace=False)
        for dev in range(8)
    ]).astype(np.int32)
    rows, overflow = sharded_lookup(table, idx, mesh, capacity=2)
    assert np.asarray(overflow).sum() > 0
    got = np.asarray(rows)
    want = table[idx]
    served = np.abs(got).sum(axis=1) > 0
    np.testing.assert_allclose(got[served], want[served], rtol=1e-6)
    assert (~served).any()  # dropped slots come back as zero rows


def test_sharded_lookup_default_capacity(small_inter):
    """Default capacity handles a realistic skewed batch end-to-end."""
    rng = np.random.default_rng(3)
    n_rows, k, B = 120, 8, 64
    table = rng.normal(size=(n_rows, k)).astype(np.float32)
    idx = small_inter.pos_u[:B].astype(np.int32)  # power-law-ish user ids
    mesh = make_mesh(dp=2, mp=4)
    rows, overflow = sharded_lookup(table, idx, mesh)
    if np.asarray(overflow).sum() == 0:
        np.testing.assert_allclose(np.asarray(rows), table[idx], rtol=1e-6)
    else:  # documented behavior: drops return zero rows
        got = np.asarray(rows)
        served = np.abs(got).sum(axis=1) > 0
        np.testing.assert_allclose(got[served], table[idx][served], rtol=1e-6)


# ---- reverse exchange: sharded_update ----

from topk_rec_tpu.parallel.lookup import sharded_update


@pytest.mark.parametrize("dp,mp", [(2, 4), (1, 8)])
def test_sharded_update_exact_scatter_add(dp, mp):
    """Reverse all-to-all scatter-add == dense np.add.at, duplicates
    (within AND across source devices) summed exactly."""
    rng = np.random.default_rng(5)
    n_rows, k, B = 64, 6, 48
    table = rng.normal(size=(n_rows, k)).astype(np.float32)
    idx = rng.integers(0, n_rows, size=B).astype(np.int32)
    idx[::5] = idx[0]          # duplicates within devices
    idx[B // 2 :] = idx[: B // 2]  # duplicates ACROSS devices
    rows = rng.normal(size=(B, k)).astype(np.float32)
    want = table.copy()
    np.add.at(want, idx, rows)
    mesh = make_mesh(dp=dp, mp=mp)
    new, overflow = sharded_update(table, idx, rows, mesh, capacity=B)
    assert np.asarray(overflow).sum() == 0
    np.testing.assert_allclose(np.asarray(new), want, rtol=1e-5, atol=1e-6)


def test_sharded_update_overflow_drops_whole_uniques():
    """Tiny capacity on a skewed batch: overflow counted; surviving rows
    carry exact sums of the contributions that were routed (dropped
    uniques vanish atomically — never a partial/garbled row)."""
    rng = np.random.default_rng(6)
    n_rows, k = 64, 4
    table = np.zeros((n_rows, k), dtype=np.float32)
    mesh = make_mesh(dp=1, mp=8)
    rows_per_shard = n_rows // 8
    # 4 indices per device, all owned by shard 0; capacity=2 drops some
    idx = np.concatenate([
        rng.choice(rows_per_shard, size=4, replace=False)
        for _ in range(8)
    ]).astype(np.int32)
    rows = np.ones((32, k), dtype=np.float32)
    new, overflow = sharded_update(table, idx, rows, mesh, capacity=2)
    assert np.asarray(overflow).sum() > 0
    got = np.asarray(new)
    # updates only land on requested rows, in whole-contribution units
    touched = np.unique(idx)
    untouched = np.setdiff1d(np.arange(n_rows), touched)
    assert np.abs(got[untouched]).sum() == 0
    full = np.zeros_like(table)
    np.add.at(full, idx, rows)
    assert (got <= full + 1e-6).all()  # never more than the full sum
    # per-row deltas are integral contribution counts (atomic drops)
    np.testing.assert_allclose(got, np.round(got), atol=1e-6)
