"""Probe: where does the BPR chunk's time go on the real chip?

Times (a) the production chunk at the parity config, (b) the same chunk
with 4x longer scans (amortizes per-chunk fixed costs: sampling, planning,
dispatch), (c) sampling+planning alone, and (d) an experimental variant
that merges the user and item tables into ONE [(n_u+n_i), k+1] table so
each step runs one gather / one segment-sum / one scatter pair instead of
two of each. Diagnostics only — not part of the bench contract.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from topk_rec_tpu.data.dataset import Interactions
from topk_rec_tpu.models import BPR
from topk_rec_tpu.models.bpr import _train_chunk
from topk_rec_tpu.ops.sampling import _sample_triplets
from topk_rec_tpu.ops.sparse_update import (
    apply_planned_rmsprop,
    plan_sparse_updates,
    planned_rows,
)


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_items", "k_candidates", "n_steps"),
    donate_argnums=(0, 1),
)
def _merged_chunk(
    tab, acc, key, user_rows, flat_pos, pos_bitmap, hyper,
    batch_size, n_items, k_candidates, n_steps,
):
    """One merged table [(n_u+n_i), k+1]: rows [0,n_u) are users (bias col
    unused, stays 0), rows [n_u,...) are items with bias in column k."""
    lu, li, lj, lb, lr = (
        hyper["lu"], hyper["li"], hyper["lj"], hyper["lb"], hyper["lr"],
    )
    n_users = tab.shape[0] - n_items
    k = tab.shape[1] - 1

    u_all, i_all, j_all = _sample_triplets(
        key, user_rows, flat_pos, pos_bitmap,
        n_steps * batch_size, n_items, k_candidates,
    )
    b = batch_size
    u_steps = u_all.reshape(n_steps, b)
    i_steps = i_all.reshape(n_steps, b) + n_users
    j_steps = j_all.reshape(n_steps, b) + n_users
    rows_all = jnp.concatenate([u_steps, i_steps, j_steps], axis=1)
    uniq, seg = plan_sparse_updates(rows_all)
    xs = (uniq, seg)

    def loss_fn(block):
        pu = block[:b, :k]
        pit = block[b : 2 * b]
        pjt = block[2 * b :]
        pi, bi = pit[:, :k], pit[:, k]
        pj, bj = pjt[:, :k], pjt[:, k]
        x = bi - bj + jnp.sum(pu * (pi - pj), axis=1)
        nll = jnp.sum(jnp.logaddexp(0.0, -x))
        reg = 0.5 * (
            jnp.sum(pu**2) * lu + jnp.sum(pi**2) * li + jnp.sum(pj**2) * lj
        ) + 0.5 * lb * (jnp.sum(bi**2) + jnp.sum(bj**2))
        return nll + reg

    def step(carry, xs):
        tab, acc = carry
        uq, sg = xs
        rows, acc_rows = planned_rows(tab, acc, uq)
        block = rows[sg]
        loss, g = jax.value_and_grad(loss_fn)(block)
        agg = jax.ops.segment_sum(g, sg, num_segments=uq.shape[0])
        tab, acc = apply_planned_rmsprop(tab, acc, uq, rows, acc_rows, agg, lr)
        return (tab, acc), loss

    (tab, acc), losses = jax.lax.scan(step, (tab, acc), xs)
    return tab, acc, jnp.sum(losses)


@partial(
    jax.jit,
    static_argnames=("batch_size", "n_items", "k_candidates", "n_steps"),
)
def _sample_plan_only(
    key, user_rows, flat_pos, pos_bitmap, batch_size, n_items,
    k_candidates, n_steps,
):
    u_all, i_all, j_all = _sample_triplets(
        key, user_rows, flat_pos, pos_bitmap,
        n_steps * batch_size, n_items, k_candidates,
    )
    u_steps = u_all.reshape(n_steps, batch_size)
    i_steps = i_all.reshape(n_steps, batch_size)
    j_steps = j_all.reshape(n_steps, batch_size)
    uq_u, sg_u = plan_sparse_updates(u_steps)
    uq_ij, sg_ij = plan_sparse_updates(
        jnp.concatenate([i_steps, j_steps], axis=1)
    )
    return (
        jnp.sum(uq_u) + jnp.sum(sg_u) + jnp.sum(uq_ij) + jnp.sum(sg_ij)
    )


def main():
    rng = np.random.default_rng(0)
    n_users, n_items, nnz = 69878, 10380, 4_000_000
    inter = Interactions(
        n_users, n_items,
        rng.integers(0, n_users, size=nnz).astype(np.int32),
        rng.integers(0, n_items, size=nnz).astype(np.int32),
    )
    model = BPR(k=50, seed=0)
    model.set_interactions(inter)
    model._init_params(jax.random.PRNGKey(0))
    s = model.sampler
    hyper = {"lu": model.lu, "li": model.li, "lj": model.lj,
             "lb": model.lb, "lr": model.lr}

    def time_chunks(fn, n_chunks, seed):
        key = jax.random.PRNGKey(seed)
        out = None
        t0 = time.time()
        for _ in range(n_chunks):
            key, sub = jax.random.split(key)
            out = fn(sub)
        _ = float(jax.tree.leaves(out)[-1])  # force
        return time.time() - t0

    results = {}

    # (a) production chunk, parity config
    pp, mm = model._params, model._ms

    def prod(sub, steps=128):
        nonlocal pp, mm
        pp, mm, loss = _train_chunk(
            pp, mm, sub, s.user_rows, s.flat_pos, s.pos_bitmap,
            hyper, 256, n_items, 2, steps, "l2",
        )
        return loss

    prod(jax.random.PRNGKey(99))  # compile
    dt = time_chunks(prod, 16, 1)
    results["prod_256x128"] = 16 * 128 * 256 / dt

    # (b) 4x scan length
    model._init_params(jax.random.PRNGKey(0))
    pp, mm = model._params, model._ms
    prod512 = lambda sub: prod(sub, 512)
    prod512(jax.random.PRNGKey(98))
    dt = time_chunks(prod512, 4, 2)
    results["prod_256x512"] = 4 * 512 * 256 / dt

    # (c) sampling + planning only
    def sp(sub):
        return _sample_plan_only(
            sub, s.user_rows, s.flat_pos, s.pos_bitmap, 256, n_items, 2, 128
        )

    sp(jax.random.PRNGKey(97))
    dt = time_chunks(sp, 16, 3)
    results["sample_plan_only_256x128"] = 16 * 128 * 256 / dt

    # (d) merged-table variant
    model._init_params(jax.random.PRNGKey(0))
    p = model._params
    tab = jnp.concatenate(
        [
            jnp.concatenate([p["ue"], jnp.zeros((n_users, 1))], axis=1),
            jnp.concatenate([p["ie"], p["ib"][:, None]], axis=1),
        ],
        axis=0,
    )
    acc = jnp.zeros_like(tab)

    def merged(sub):
        nonlocal tab, acc
        tab, acc, loss = _merged_chunk(
            tab, acc, sub, s.user_rows, s.flat_pos, s.pos_bitmap,
            hyper, 256, n_items, 2, 128,
        )
        return loss

    merged(jax.random.PRNGKey(96))
    dt = time_chunks(merged, 16, 4)
    results["merged_256x128"] = 16 * 128 * 256 / dt

    for name, sps in results.items():
        print(f"{name}: {sps:,.0f} samples/s")


if __name__ == "__main__":
    main()
