"""Decompose the suspect-fallback postprocessing cost of fused_score_topk.

Round-3 finding (drove the depth-3 kernel): at suspect capacity
n_u/16 = 4368 the XLA-side repair cost ~19 ms of the 32 ms total —
nonzero 3.4 ms, mask row-gather +3.3 ms, rescore+top_k ~11 ms — so the
kernel moved to top-3-per-group visibility (suspects ~0.05%) and the
capacity shrank 4x. Timing per CLAUDE.md: async dispatch, single sync,
burn-in block first.
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from topk_rec_tpu.ops.topk_pallas import fused_score_topk, NEG_INF

n_u, n_i, d, k = 69878, 10380, 50, 30
rng = np.random.default_rng(1)
U = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
V = jnp.asarray(rng.normal(size=(n_i, d)).astype(np.float32))
b = jnp.asarray(rng.normal(size=n_i).astype(np.float32))
mask = jax.jit(lambda key: (jax.random.uniform(key, (n_u, n_i)) < 0.02).astype(jnp.int8))(jax.random.PRNGKey(0))

def timeit(fn, *args, iters=10):
    float(fn(*args))
    outs=[fn(*args) for _ in range(iters)]; float(sum(outs))
    t0=time.time(); outs=[fn(*args) for _ in range(iters)]; acc=float(sum(outs))
    assert np.isfinite(acc)
    return (time.time()-t0)/iters*1e3

@jax.jit
def full(U, V, b, mask):
    v, i = fused_score_topk(U, V, b, mask, k, exact_matmul=False)
    return jnp.sum(v) + jnp.sum(i)

print(f"full repo v3.1          {timeit(full, U, V, b, mask):8.2f} ms", flush=True)

# postproc pieces on representative data
cap = 4368
suspect = jnp.asarray((rng.random(n_u) < 0.035))
vals = jnp.asarray(rng.normal(size=(n_u, k)).astype(np.float32))
idxs = jnp.asarray(rng.integers(0, n_i, size=(n_u, k)).astype(np.int32))

@jax.jit
def p_nonzero(suspect):
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    return jnp.sum(bad)

@jax.jit
def p_gather_u(suspect, U):
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    return jnp.sum(U[bad])

@jax.jit
def p_gather_mask(suspect, mask):
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    return jnp.sum(mask[bad])

@jax.jit
def p_rerank(suspect, U, V, b, mask):
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    s = jnp.dot(U[bad], V.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT) + b
    s = jnp.where(mask[bad] != 0, NEG_INF, s)
    fv, fi = jax.lax.top_k(s, k)
    return jnp.sum(fv) + jnp.sum(fi)

@jax.jit
def p_scatter(suspect, vals, idxs):
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    live = suspect[bad][:, None]
    fv = vals[bad] * 2.0
    fi = idxs[bad]
    v2 = vals.at[bad].set(jnp.where(live, fv, vals[bad]))
    i2 = idxs.at[bad].set(jnp.where(live, fi, idxs[bad]))
    return jnp.sum(v2) + jnp.sum(i2)

print(f"nonzero(cap)            {timeit(p_nonzero, suspect):8.2f} ms", flush=True)
print(f"nonzero+U[bad]          {timeit(p_gather_u, suspect, U):8.2f} ms", flush=True)
print(f"nonzero+mask[bad]       {timeit(p_gather_mask, suspect, mask):8.2f} ms", flush=True)
print(f"nonzero+rerank(topk)    {timeit(p_rerank, suspect, U, V, b, mask):8.2f} ms", flush=True)
print(f"nonzero+scatters        {timeit(p_scatter, suspect, vals, idxs):8.2f} ms", flush=True)
