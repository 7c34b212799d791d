"""Mesh-distributed weighted-ALS sweeps.

The batched ALS block update (ops/als.py) is embarrassingly parallel over
entities: each block row solves an independent k×k system. Distribution
strategy: within each block, shard the entity axis across every mesh
device (S, the normal-equation products, and the batched solves all
partition row-wise; the fixed-side embeddings / VV / Gram are replicated —
at k=50 the replicated bytes are far smaller than the per-entity work).
XLA/GSPMD partitions the S·VV and S·V matmuls and the batched solve with
no collectives on the hot path; only the block's (rows, cols) index lists
are broadcast.

This is the TPU-pod analog of the reference's single-process GSL solver
loop (old/cr/cr.cpp:146-216): same math, entity-parallel across chips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.als import ALSPlan, batched_solve, gram_matrix


class DistributedALS:
    """Runs half-sweeps with block entities sharded over all mesh devices."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)  # shard entity rows over all axes
        self._fn_cache = {}

    def _entity_sharding(self):
        return NamedSharding(self.mesh, P(self.axes, None))

    def _build(self, block_size: int, n_other: int, use_prior: bool):
        key = (block_size, n_other, use_prior)
        if key in self._fn_cache:
            return self._fn_cache[key]
        mesh = self.mesh
        row_shard = self._entity_sharding()
        repl = NamedSharding(mesh, P())

        def block_fn(rows, cols, other_emb, vv, gram_b, old_block,
                     deg_block, prior_block, a, b, lam):
            k = other_emb.shape[1]
            S = (
                jnp.zeros((block_size + 1, n_other), jnp.float32)
                .at[rows, cols]
                .add(1.0)[:block_size]
            )
            S = jax.lax.with_sharding_constraint(S, row_shard)
            Pm = jnp.dot(S, vv, preferred_element_type=jnp.float32)
            sum_v = jnp.dot(S, other_emb, preferred_element_type=jnp.float32)
            A_fit = gram_b[None] + (a - b) * Pm.reshape(block_size, k, k)
            A = A_fit + lam * jnp.eye(k, dtype=jnp.float32)[None]
            rhs = a * sum_v
            if use_prior:
                rhs = rhs + lam * prior_block
            new = batched_solve(A, rhs)
            if not use_prior:
                new = jnp.where((deg_block > 0)[:, None], new, old_block)
            quad = 0.5 * jnp.einsum("bi,bij,bj->b", new, A_fit, new)
            lin = a * jnp.sum(sum_v * new, axis=1)
            fit = jnp.where(
                deg_block > 0, 0.5 * deg_block * a + quad - lin, 0.0
            )
            new = jax.lax.with_sharding_constraint(new, row_shard)
            return new, jnp.sum(fit)

        fn = jax.jit(
            block_fn,
            out_shardings=(row_shard, repl),
        )
        self._fn_cache[key] = fn
        return fn

    def half_sweep(
        self,
        plan: ALSPlan,
        this_emb: np.ndarray,
        other_emb,
        rated_other,
        a: float,
        b: float,
        lam: float,
        prior: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, float]:
        """Drop-in distributed equivalent of ops.als.half_sweep."""
        other_emb = jnp.asarray(other_emb)
        k = other_emb.shape[1]
        n_other = other_emb.shape[0]
        vv = jnp.einsum("nk,nl->nkl", other_emb, other_emb).reshape(
            n_other, k * k
        )
        gram_b = b * gram_matrix(other_emb, jnp.asarray(rated_other))
        use_prior = prior is not None
        fn = self._build(plan.block_size, n_other, use_prior)
        zeros_prior = np.zeros((plan.block_size, k), np.float32)
        out = np.array(this_emb, dtype=np.float32, copy=True)
        fit_total = 0.0
        for bi, (rows, cols, deg_block) in enumerate(plan.blocks):
            r0 = bi * plan.block_size
            r1 = min(r0 + plan.block_size, plan.n_this)
            old_block = np.zeros((plan.block_size, k), np.float32)
            old_block[: r1 - r0] = out[r0:r1]
            if use_prior:
                prior_block = np.zeros((plan.block_size, k), np.float32)
                prior_block[: r1 - r0] = prior[r0:r1]
            else:
                prior_block = zeros_prior
            new, fit = fn(
                rows, cols, other_emb, vv, gram_b,
                jnp.asarray(old_block), deg_block, jnp.asarray(prior_block),
                float(a), float(b), float(lam),
            )
            out[r0:r1] = np.asarray(new)[: r1 - r0]
            fit_total += float(fit)
        return out, fit_total
