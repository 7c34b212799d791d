"""Batched weighted-ALS solves on the MXU.

TPU-native replacement for the reference's sequential host solves — the
per-user/per-item k×k ``np.linalg.solve`` loops (reference single/wmf.py:
70-97, single/cer.py:39-63) and the GSL rank-1-update solver
(reference old/cr/cr.cpp:131-265).

Math (identical semantics, restructured for the MXU): with confidence
weights a (positive) / b (background), the normal equations for entity t
with positive set I_t over fixed embeddings V are

    A_t = b·Vᵣᵀ Vᵣ + (a-b)·Σ_{j∈I_t} v_j v_jᵀ + λ·I
    A_t x_t = a·Σ_{j∈I_t} v_j  (+ λ·prior_t for content-coupled models)

Instead of per-entity gathers and host BLAS we process entities in blocks:
build the 0/1 selection matrix S ∈ {0,1}^{B×n} from the CSR layout and get

    Σ_{j∈I_t} v_j v_jᵀ  =  (S @ VV)_t  reshaped to k×k,   VV = [v_j v_jᵀ]_j
    Σ_{j∈I_t} v_j       =  (S @ V)_t

— two big matmuls per block (MXU-bound) followed by one batched k×k solve.
This also fixes the reference WMF's latent dict/list bug (wmf.py:75-76 calls
``.keys()/.values()`` on lists — see SURVEY.md §2.1 C4) by implementing the
*intended* weighted-ALS semantics directly (all ratings are 1 after the
like==1 filter, so the RHS rating weights reduce to a·Σ v_j).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gram_matrix(emb: jax.Array, rows: Optional[jax.Array] = None) -> jax.Array:
    """Eᵣᵀ Eᵣ over the selected rows (ref wmf.py:70-71 ``vr.T @ vr``)."""
    sel = emb[rows] if rows is not None else emb
    return jnp.dot(sel.T, sel, preferred_element_type=jnp.float32)


def batched_solve(A: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve A_t x_t = rhs_t for a batch of SPD k×k systems."""
    return jnp.linalg.solve(A, rhs[..., None])[..., 0]


@partial(
    jax.jit,
    static_argnames=("block_size", "n_other", "use_prior", "keep_old_unrated"),
)
def _als_block(
    rows: jax.Array,        # int32 [cap] block-local row of each positive (B = pad)
    cols: jax.Array,        # int32 [cap] other-side index of each positive
    other_emb: jax.Array,   # [n_other, k]
    vv: jax.Array,          # [n_other, k*k] row-wise outer products of other_emb
    gram_b: jax.Array,      # [k, k] b-weighted Gram over rated other rows
    old_block: jax.Array,   # [B, k] current values (kept where not updated)
    deg_block: jax.Array,   # int32 [B]
    prior_block: jax.Array, # [B, k] (zeros when use_prior=False)
    a: float,
    b: float,
    lam: float,
    block_size: int,
    n_other: int,
    use_prior: bool,
    keep_old_unrated: bool,
) -> Tuple[jax.Array, jax.Array]:
    k = other_emb.shape[1]
    dtype = other_emb.dtype
    # Selection matrix with one sentinel row for padding (rows == block_size).
    S = (
        jnp.zeros((block_size + 1, n_other), dtype=dtype)
        .at[rows, cols]
        .add(1.0)[:block_size]
    )
    P = jnp.dot(S, vv, preferred_element_type=jnp.float32)      # [B, k*k]
    sum_v = jnp.dot(S, other_emb, preferred_element_type=jnp.float32)  # [B, k]
    A_fit = gram_b[None, :, :] + (a - b) * P.reshape(block_size, k, k)
    A = A_fit + lam * jnp.eye(k, dtype=jnp.float32)[None]
    rhs = a * sum_v
    if use_prior:
        rhs = rhs + lam * prior_block
    new = batched_solve(A, rhs)
    if keep_old_unrated:
        new = jnp.where((deg_block > 0)[:, None], new, old_block)
    # Fit-loss pieces for the reference's convergence loss (wmf.py:91-97):
    # Σ_rated [ 0.5·deg·a + 0.5·x̂ᵀA_fit x̂ − a·(Σv)·x̂ ]
    quad = 0.5 * jnp.einsum("bi,bij,bj->b", new, A_fit, new)
    lin = a * jnp.sum(sum_v * new, axis=1)
    fit = jnp.where(deg_block > 0, 0.5 * deg_block * a + quad - lin, 0.0)
    return new, jnp.sum(fit)


class ALSPlan:
    """Precomputed static block layout for one side of the alternation.

    Blocks are contiguous index ranges; per-block (row, col) positive pairs
    are padded once to the max block nnz so every block reuses a single
    compiled kernel.
    """

    def __init__(
        self,
        indptr: np.ndarray,
        flat: np.ndarray,
        n_this: int,
        block_size: int = 2048,
    ):
        self.n_this = n_this
        self.block_size = block_size
        self.blocks: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        deg = np.diff(indptr)
        cap = 1
        bounds = list(range(0, n_this, block_size))
        for r0 in bounds:
            r1 = min(r0 + block_size, n_this)
            cap = max(cap, int(indptr[r1] - indptr[r0]))
        self.cap = cap
        for r0 in bounds:
            r1 = min(r0 + block_size, n_this)
            lo, hi = int(indptr[r0]), int(indptr[r1])
            rows = np.repeat(
                np.arange(r1 - r0, dtype=np.int32), deg[r0:r1]
            )
            cols = flat[lo:hi].astype(np.int32)
            pad = cap - rows.shape[0]
            rows = np.pad(rows, (0, pad), constant_values=block_size)
            cols = np.pad(cols, (0, pad), constant_values=0)
            deg_block = np.zeros(block_size, dtype=np.int32)
            deg_block[: r1 - r0] = deg[r0:r1]
            self.blocks.append(
                (jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(deg_block))
            )


def half_sweep(
    plan: ALSPlan,
    this_emb: np.ndarray,
    other_emb: jax.Array,
    rated_other: jax.Array,
    a: float,
    b: float,
    lam: float,
    prior: Optional[np.ndarray] = None,
    keep_old_unrated: bool = True,
) -> Tuple[np.ndarray, float]:
    """One ALS half-sweep: update ``this_emb`` given fixed ``other_emb``.

    Returns (updated embeddings, fit-loss contribution over rated entities).
    ``prior`` enables the content-coupled RHS (+λ·prior, CER/DPM semantics,
    ref cer.py:49-63); with a prior, unrated entities are solved from the
    prior alone (ref cer.py:62) instead of kept (ref wmf.py:82 guard).
    """
    other_emb = jnp.asarray(other_emb)
    k = other_emb.shape[1]
    n_other = other_emb.shape[0]
    vv = jnp.einsum("nk,nl->nkl", other_emb, other_emb).reshape(n_other, k * k)
    gram_b = b * gram_matrix(other_emb, rated_other)
    use_prior = prior is not None
    zeros_prior = np.zeros((plan.block_size, k), dtype=np.float32)
    out = np.array(this_emb, dtype=np.float32, copy=True)
    fit_total = 0.0
    for bi, (rows, cols, deg_block) in enumerate(plan.blocks):
        r0 = bi * plan.block_size
        r1 = min(r0 + plan.block_size, plan.n_this)
        old_block = np.zeros((plan.block_size, k), dtype=np.float32)
        old_block[: r1 - r0] = out[r0:r1]
        if use_prior:
            prior_block = np.zeros((plan.block_size, k), dtype=np.float32)
            prior_block[: r1 - r0] = prior[r0:r1]
        else:
            prior_block = zeros_prior
        new, fit = _als_block(
            rows,
            cols,
            other_emb,
            vv,
            gram_b,
            jnp.asarray(old_block),
            deg_block,
            jnp.asarray(prior_block),
            float(a),
            float(b),
            float(lam),
            plan.block_size,
            n_other,
            use_prior,
            keep_old_unrated and not use_prior,
        )
        out[r0:r1] = np.asarray(new)[: r1 - r0]
        fit_total += float(fit)
    return out, fit_total


def weighted_als_user_update(
    user_emb: np.ndarray,
    item_emb: np.ndarray,
    inter,
    a: float,
    b: float,
    lam_u: float,
    block_size: int = 2048,
) -> np.ndarray:
    """Convenience one-shot user-side update (tests / simple callers)."""
    indptr, flat = inter.user_csr
    plan = ALSPlan(indptr, flat, inter.n_users, block_size)
    new, _ = half_sweep(
        plan,
        user_emb,
        item_emb,
        jnp.asarray(inter.rated_items),
        a,
        b,
        lam_u,
    )
    return new
