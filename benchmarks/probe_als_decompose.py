"""Decompose the fused ALS half-sweep's time at MovieLens scale.

The full WMF iteration measures ~1.56 s on v5e, but its roofline is
~50 ms (S·VV matmuls ≈ 8 TFLOP bf16 ≈ 41 ms; S/VV HBM traffic ≈ 15 GB ≈
18 ms) — a ~30x gap. Candidate culprits, isolated here by ablation:

  A  full user-side half-sweep (baseline);
  B  solves ablated (batched Cholesky replaced by rhs copy) — isolates
     the 3×k-step fori_loop dynamic-slice solver;
  C  S-matmul ablated (P/sum_v replaced by zeros) — isolates the
     [block, n_other] scatter-build + two matmuls;
  D  S build ablated only (S = zeros, matmuls kept).

Usage: python benchmarks/probe_als_decompose.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from topk_rec_tpu.data.dataset import Interactions
    from topk_rec_tpu.ops.als import ALSPlan, batched_solve

    rng = np.random.default_rng(0)
    n_users, n_items, nnz, k = 69878, 10380, 4_000_000, 50
    draw = int(nnz * 1.3)
    uu = rng.integers(0, n_users, size=draw).astype(np.int64)
    ii = ((rng.zipf(1.1, size=draw) - 1) % n_items).astype(np.int64)
    key = np.unique(uu * n_items + ii)
    rng.shuffle(key)
    key = key[:nnz]
    inter = Interactions(
        n_users, n_items,
        (key // n_items).astype(np.int32), (key % n_items).astype(np.int32),
    )
    indptr, flat = inter.user_csr
    plan = ALSPlan(indptr, flat, n_users, 2048)
    U = jnp.asarray(rng.random((n_users, k), dtype=np.float32))
    V = jnp.asarray(rng.random((n_items, k), dtype=np.float32))
    rated = jnp.asarray(inter.rated_items)
    block_size, n_this = plan.block_size, plan.n_this

    def sweep(rows_stack, cols_stack, deg_stack, perm, this_emb, other_emb,
              rated_mask, a, b, lam, variant):
        n_blocks = rows_stack.shape[0]
        n_other, kk = other_emb.shape
        vv = (other_emb[:, :, None] * other_emb[:, None, :]).reshape(
            n_other, kk * kk)
        sel = other_emb * rated_mask[:, None]
        gram_b = b * jnp.dot(sel.T, sel, preferred_element_type=jnp.float32)
        old_stack = this_emb.at[perm].get(
            mode="fill", fill_value=0.0
        ).reshape(n_blocks, block_size, kk)
        eye = lam * jnp.eye(kk, dtype=jnp.float32)

        def block(_, xs):
            rows, cols, deg_block, old_block = xs
            if variant == "D":
                S = jnp.zeros((block_size, n_other), jnp.float32)
            else:
                S = (
                    jnp.zeros((block_size + 1, n_other), jnp.float32)
                    .at[rows, cols].add(1.0)[:block_size]
                )
            if variant == "C":
                P = jnp.zeros((block_size, kk * kk), jnp.float32)
                sum_v = jnp.zeros((block_size, kk), jnp.float32)
            else:
                P = jnp.dot(S, vv, preferred_element_type=jnp.float32)
                sum_v = jnp.dot(S, other_emb,
                                preferred_element_type=jnp.float32)
            A_fit = gram_b[None] + (a - b) * P.reshape(block_size, kk, kk)
            A = A_fit + eye[None]
            rhs = a * sum_v
            if variant == "B":
                new = rhs  # ablate the batched Cholesky
            else:
                new = batched_solve(A, rhs)
            new = jnp.where((deg_block > 0)[:, None], new, old_block)
            return None, new

        _, new_stack = jax.lax.scan(
            block, None, (rows_stack, cols_stack, deg_stack, old_stack)
        )
        return (
            jnp.zeros((n_this, kk), jnp.float32)
            .at[perm].set(new_stack.reshape(-1, kk), mode="drop")
        )

    rated_mask = jnp.zeros(n_items, jnp.float32).at[rated].set(1.0)

    def timeit(variant, iters=4):
        fn = jax.jit(partial(sweep, variant=variant))
        args = (plan.rows_stack, plan.cols_stack, plan.deg_stack, plan.perm,
                U, V, rated_mask, 1.0, 0.01, 0.01)
        float(jnp.sum(fn(*args)))
        outs = [fn(*args) for _ in range(iters)]
        float(sum(jnp.sum(o) for o in outs))
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        acc = float(sum(jnp.sum(o) for o in outs))
        assert np.isfinite(acc)
        return (time.time() - t0) / iters * 1e3

    for v, desc in [("A", "full"), ("B", "no-solve"),
                    ("C", "no-S-matmul"), ("D", "no-S-build")]:
        print(f"user half-sweep {v} ({desc:12s}) {timeit(v):9.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
