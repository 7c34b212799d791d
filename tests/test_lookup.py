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


def test_exchange_with_valid_mask_flags_drops():
    """_exchange(with_valid=True): the per-occurrence mask is True exactly
    on served occurrences; dropped ones are False with zero rows (the
    explicit-exchange trainer voids those triplets entirely)."""
    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from topk_rec_tpu.parallel.lookup import _exchange

    rng = np.random.default_rng(5)
    n_rows, k = 64, 4
    table = rng.normal(size=(n_rows, k)).astype(np.float32)
    mesh = make_mesh(dp=1, mp=8)
    rows_per_shard = n_rows // 8
    # all indices owned by shard 0, capacity 2: most devices drop some
    idx = np.concatenate([
        rng.choice(rows_per_shard, size=4, replace=False)
        for _ in range(8)
    ]).astype(np.int32)
    body = partial(
        _exchange, axis="mp", n_shards=8, rows_per_shard=rows_per_shard,
        capacity=2, with_valid=True,
    )
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("mp", None), P("mp")),
        out_specs=(P("mp", None), P("mp"), P("mp")),
    ))
    table_d = jax.device_put(
        jnp.asarray(table), NamedSharding(mesh, P("mp", None))
    )
    idx_d = jax.device_put(
        jnp.asarray(idx, jnp.int32), NamedSharding(mesh, P("mp"))
    )
    rows, valid, overflow = fn(table_d, idx_d)
    rows, valid = np.asarray(rows), np.asarray(valid)
    assert np.asarray(overflow).sum() > 0
    np.testing.assert_allclose(rows[valid], table[idx][valid], rtol=1e-6)
    assert not valid.all()
    assert (rows[~valid] == 0).all()


def test_pairwise_loss_weight_voids_example():
    """Weight 0 removes an example's loss AND all its gradients — the
    overflow-voiding contract the explicit-exchange step relies on."""
    import jax.numpy as jnp

    from topk_rec_tpu.models.bpr import _pairwise_loss

    rng = np.random.default_rng(6)
    k, b = 5, 7
    pu = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))
    pit = jnp.asarray(rng.normal(size=(b, k + 1)).astype(np.float32))
    pjt = jnp.asarray(rng.normal(size=(b, k + 1)).astype(np.float32))
    w = jnp.asarray(
        np.array([1, 0, 1, 0, 1, 1, 0], np.float32)
    )
    loss_w, grads = jax.value_and_grad(
        _pairwise_loss, argnums=(0, 1, 2)
    )(pu, pit, pjt, 0.1, 0.1, 0.01, 0.05, "l2", k, w)
    # voided examples: zero gradient rows everywhere (incl. bias column)
    for g in grads:
        assert (np.asarray(g)[np.asarray(w) == 0] == 0).all()
        assert (np.asarray(g)[np.asarray(w) == 1] != 0).any()
    # loss equals the loss of the kept subset alone
    keep = np.asarray(w) == 1
    loss_subset = _pairwise_loss(
        pu[keep], pit[keep], pjt[keep], 0.1, 0.1, 0.01, 0.05, "l2", k
    )
    np.testing.assert_allclose(float(loss_w), float(loss_subset), rtol=1e-6)


def test_explicit_trainer_overflow_stays_sane(small_inter):
    """Forced overflow (capacity=1): the trainer reports drops, the loss
    stays finite, and no parameter is corrupted by zero-row gradients."""
    import jax.numpy as jnp

    from topk_rec_tpu.models import BPR
    from topk_rec_tpu.parallel import DistributedBPRTrainer

    model = BPR(k=8, lr=0.05, seed=3)
    model.set_interactions(small_inter)
    model._init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(dp=1, mp=8)
    tr = DistributedBPRTrainer(
        model, mesh, batch_size=64, scan_steps=2,
        exchange="explicit", capacity=1,
    )
    loss = tr.train_chunk(jax.random.PRNGKey(9))
    assert np.isfinite(loss)
    assert tr.last_overflow > 0
    tr.sync_to_model()
    for name in ("ue", "ie", "ib"):
        assert np.isfinite(np.asarray(model._params[name])).all()


def test_sharded_lookup_jit_memo():
    """Repeated lookups with the same (mesh, shape) config must reuse one
    compiled program — a fresh jit(shard_map) per call re-traced every
    query (~2 s each, found by the Gloo throughput bench, round 4)."""
    import numpy as np

    from topk_rec_tpu.parallel import make_mesh
    from topk_rec_tpu.parallel import lookup as lk

    mesh = make_mesh(dp=1, mp=8)
    rng = np.random.default_rng(0)
    table = rng.normal(size=(32, 4)).astype(np.float32)
    idx = rng.integers(0, 32, size=16).astype(np.int32)
    lk._JIT_CACHE.clear()
    rows1, _ = lk.sharded_lookup(table, idx, mesh)
    n_after_first = len(lk._JIT_CACHE)
    rows2, _ = lk.sharded_lookup(table, idx, mesh)
    assert len(lk._JIT_CACHE) == n_after_first == 1
    np.testing.assert_allclose(np.asarray(rows1), table[idx], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows2), table[idx], rtol=1e-6)
    lk.sharded_update(table, idx, np.ones_like(table[idx]), mesh)
    assert len(lk._JIT_CACHE) == 2
