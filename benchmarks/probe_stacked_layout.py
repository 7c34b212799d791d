"""EXPERIMENT (round-2, RESOLVED: no win — layouts equal): per-table
[params; acc] row-stacked layout — one 2M-row gather/scatter per table
per step instead of two M-row ones. Estimated +10-15% on the
latency-bound SGD step; measured: none.

Resolution (2026-08-20, A-B-A rerun): the current layout's apparent
70ms/chunk here was an ORDER artifact, not a layout effect. The first
timed block in a fresh process measures ~71ms/chunk; every later block —
same program, same data, either layout, same-key or split-key — measures
~12.5ms/chunk. Even with the warmup float()-synced, a fresh process's
first timed dozen dispatches absorb ~700ms of one-time residual work
(tunnel/allocator stream setup). Measured A-B-A in one process:
current(first)=71.1ms, current(bench-style split keys)=13.3ms,
current(again)=12.6ms — vs stacked=12.46ms from the two-phase run.
Confirmed by this probe with the burn-in below: current=12.49ms,
stacked=12.56ms. So current ~= stacked within noise, matching the
op-count analysis in
BASELINE.md "training-step anatomy" (the two tables' independent update
chains already overlap; stacking merely serializes them into one chain
with the same op latency). The current split-table layout stays.

Probe-methodology lesson (now also in CLAUDE.md): never trust the FIRST
timed block of a fresh process on this tunnel; run a throwaway timed
block, or interleave A-B-A.

Known probe bug fixed here: model._params gets DONATED by the first
_train_chunk call, so snapshot ue/ie/ib BEFORE the baseline loop.

History: an earlier probe version measured current=72-78ms vs
stacked=12.5ms, first blamed on an unsynced baseline warmup; the synced
rerun still measured 70.1 vs 12.5, which is what prompted the A-B-A.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from topk_rec_tpu.data.dataset import Interactions
from topk_rec_tpu.models import BPR
from topk_rec_tpu.models.bpr import _train_chunk
from topk_rec_tpu.ops.sampling import _sample_triplets
from topk_rec_tpu.ops.sparse_update import plan_sparse_updates

rng = np.random.default_rng(0)
n_users, n_items, nnz = 69878, 10380, 4_000_000
draw = int(nnz*1.3)
uu = rng.integers(0, n_users, size=draw).astype(np.int64)
ii = ((rng.zipf(1.1, size=draw)-1) % n_items).astype(np.int64)
key_ = np.unique(uu*n_items+ii); rng.shuffle(key_); key_ = key_[:nnz]
inter = Interactions(n_users, n_items, (key_//n_items).astype(np.int32), (key_%n_items).astype(np.int32))
model = BPR(k=50, seed=0)
model.set_interactions(inter)
model._init_params(jax.random.PRNGKey(0))
s = model.sampler
hyper = {"lu": model.lu, "li": model.li, "lj": model.lj, "lb": model.lb, "lr": model.lr}
B, S = 256, 128

@partial(jax.jit, static_argnames=("batch_size","n_items","k_candidates","n_steps","mode"), donate_argnums=(0,))
def chunk_stacked(stk, key, user_rows, flat_pos, pos_bitmap, hyper, batch_size, n_items, k_candidates, n_steps, mode):
    """stk = dict(u=[2*n_users, k], it=[2*n_items, k+1]) rows 0..n-1 params, n..2n-1 acc."""
    lu, li, lj, lb, lr = hyper["lu"], hyper["li"], hyper["lj"], hyper["lb"], hyper["lr"]
    su, sit = stk["u"], stk["it"]
    nu = su.shape[0] // 2
    ni = sit.shape[0] // 2
    k = su.shape[1]

    def loss_fn(pu, pit, pjt):
        kk = k
        pi, bi = pit[:, :kk], pit[:, kk]
        pj, bj = pjt[:, :kk], pjt[:, kk]
        x = bi - bj + jnp.sum(pu * (pi - pj), axis=1)
        nll = jnp.sum(jnp.logaddexp(0.0, -x))
        reg = 0.5 * (jnp.sum(pu**2)*lu + jnp.sum(pi**2)*li + jnp.sum(pj**2)*lj) + 0.5*lb*(jnp.sum(bi**2)+jnp.sum(bj**2))
        return nll + reg

    u_all, i_all, j_all = _sample_triplets(key, user_rows, flat_pos, pos_bitmap, n_steps*batch_size, n_items, k_candidates)
    us = u_all.reshape(n_steps, batch_size)
    is_ = i_all.reshape(n_steps, batch_size)
    js = j_all.reshape(n_steps, batch_size)
    uq_u, sg_u = plan_sparse_updates(us)
    uq_ij, sg_ij = plan_sparse_updates(jnp.concatenate([is_, js], axis=1))
    xs = (uq_u, sg_u, uq_ij, sg_ij)
    oob = jnp.int32(2**31-1)

    def step(carry, xs):
        su, sit = carry
        uq_u, sg_u, uq_ij, sg_ij = xs
        m_u, m_ij = uq_u.shape[0], uq_ij.shape[0]
        # ONE gather per table: rows [uniq ; uniq+n]
        gu = su.at[jnp.concatenate([uq_u, jnp.where(uq_u==oob, oob, uq_u+nu)])].get(mode="fill", fill_value=0.0)
        git = sit.at[jnp.concatenate([uq_ij, jnp.where(uq_ij==oob, oob, uq_ij+ni)])].get(mode="fill", fill_value=0.0)
        rows_u, acc_u = gu[:m_u], gu[m_u:]
        rows_ij, acc_ij = git[:m_ij], git[m_ij:]
        b = batch_size
        pu = rows_u[sg_u][:, :k]  # user table width k (no bias col in this variant: keep k cols; bias in item table)
        pit = rows_ij[sg_ij[:b]]
        pjt = rows_ij[sg_ij[b:]]
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0,1,2))(rows_u[sg_u], pit, pjt)
        g_ij = jnp.concatenate([grads[1], grads[2]], axis=0)
        agg_u = jax.ops.segment_sum(grads[0], sg_u, num_segments=m_u)
        agg_ij = jax.ops.segment_sum(g_ij, sg_ij, num_segments=m_ij)
        accn_u = 0.9*acc_u + 0.1*agg_u*agg_u
        updn_u = rows_u - lr*agg_u/jnp.sqrt(accn_u + 1e-10)
        accn_ij = 0.9*acc_ij + 0.1*agg_ij*agg_ij
        updn_ij = rows_ij - lr*agg_ij/jnp.sqrt(accn_ij + 1e-10)
        su = su.at[jnp.concatenate([uq_u, jnp.where(uq_u==oob, oob, uq_u+nu)])].set(jnp.concatenate([updn_u, accn_u]), mode="drop")
        sit = sit.at[jnp.concatenate([uq_ij, jnp.where(uq_ij==oob, oob, uq_ij+ni)])].set(jnp.concatenate([updn_ij, accn_ij]), mode="drop")
        return (su, sit), loss
    (su, sit), losses = jax.lax.scan(step, (su, sit), xs)
    return {"u": su, "it": sit}, jnp.sum(losses)

def timeit_chunks(fn, n=12):
    fn()  # warm
    t0 = time.time()
    last = None
    for _ in range(n):
        last = fn()
    x = float(last)
    return (time.time()-t0)/n

# snapshot initial tables BEFORE any donating call deletes them
ue = np.asarray(model._params["ue"]); ie = np.asarray(model._params["ie"]); ib = np.asarray(model._params["ib"])

# baseline: current chunk
params, ms = model._params, model._ms
k0 = jax.random.PRNGKey(3)
def run_cur():
    global params, ms
    params, ms, loss = _train_chunk(params, ms, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    return loss.sum()
def run_cur_sync():
    global params, ms
    out = 0.0
    for _ in range(1):
        params, ms, loss = _train_chunk(params, ms, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    return loss
t_cur = None
# float() sync: without it the warm call's executable upload + first
# execution stay in flight and land inside the timed region
params, ms, loss = _train_chunk(params, ms, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
float(loss)
# burn-in: the FIRST timed dozen dispatches of a fresh process absorb
# ~700ms of one-time residual setup regardless of program (see header);
# burn a full block before anything is timed
outs = []
for _ in range(12):
    params, ms, loss = _train_chunk(params, ms, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    outs.append(loss)
float(sum(outs))
t0=time.time()
outs=[]
for _ in range(12):
    params, ms, loss = _train_chunk(params, ms, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    outs.append(loss)
tot = float(sum(outs)); t_cur = (time.time()-t0)/12
print(f"current:  {t_cur*1e3:7.2f} ms/chunk -> {S*B/t_cur:,.0f} samples/s", flush=True)

# stacked variant
stk = {
  "u": jnp.asarray(np.concatenate([ue, np.zeros_like(ue)], axis=0)),
  "it": jnp.asarray(np.concatenate([np.concatenate([ie, ib[:,None]],1), np.zeros((n_items, 51), np.float32)], axis=0)),
}
def once():
    global stk
    stk, loss = chunk_stacked(stk, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    return loss
float(once())
t0=time.time()
outs=[]
for _ in range(12):
    stk, loss = chunk_stacked(stk, k0, s.user_rows, s.flat_pos, s.pos_bitmap, hyper, B, n_items, 2, S, "l2")
    outs.append(loss)
tot = float(sum(outs)); t_stk = (time.time()-t0)/12
print(f"stacked:  {t_stk*1e3:7.2f} ms/chunk -> {S*B/t_stk:,.0f} samples/s", flush=True)
