"""v4 kernel decomposition + extraction-strategy A/B on the real chip.

Measures, at the 69878x10380xd50 serving shape:
  1. kernel extract (k=1, 8, 30)   — stats+regroup floor and per-round cost
  2. xla extract    (k=30)         — candidate buffers -> lax.top_k offload
  3. A-B-A re-measure of the winner (timing hygiene per CLAUDE.md)

Usage: python benchmarks/probe_topk_v4.py [--iters 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from topk_rec_tpu.ops.topk_pallas import fused_score_topk

    n_u, n_items, d = 69_878, 10_380, 50
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n_items).astype(np.float32))
    mask = jax.jit(
        lambda key: (
            jax.random.uniform(key, (n_u, n_items)) < 0.02
        ).astype(jnp.int8)
    )(jax.random.PRNGKey(0))

    def timeit(fn):
        float(fn(U, V, b, mask))
        float(sum(fn(U, V, b, mask) for _ in range(args.iters)))
        t0 = time.time()
        outs = [fn(U, V, b, mask) for _ in range(args.iters)]
        acc = float(sum(outs))
        dt = (time.time() - t0) / args.iters
        assert np.isfinite(acc)
        return dt * 1e3

    def make(kk, extract, block_u=256):
        @jax.jit
        def run(U, V, b, mask):
            v, i = fused_score_topk(
                U, V, b, mask, kk, exact_matmul=False, extract=extract,
                block_u=block_u,
            )
            return jnp.sum(v) + jnp.sum(i)
        return run

    # xla-extract emits [block_u, 512] output buffers on top of the
    # candidate scratch — block_u=256 is 180KB over the 16MB scoped-VMEM
    # budget, so it runs at 192
    t_x = timeit(make(30, "xla", block_u=192))
    print(f"xla    k= 30  {t_x:7.2f} ms (block_u=192)", flush=True)
    t_k = timeit(make(30, "kernel"))
    print(f"kernel k= 30  {t_k:7.2f} ms (A-B-A)", flush=True)

    # the hardware's approximate selector, same shape/session — the
    # exact-vs-approx comparison is only meaningful within one window
    @jax.jit
    def run_approx(U, V, b, mask):
        scores = jnp.dot(
            U, V.T, preferred_element_type=jnp.float32,
        ) + b[None, :]
        scores = jnp.where(mask != 0, -jnp.inf, scores)
        v, i = jax.lax.approx_max_k(scores, 30)
        return jnp.sum(v) + jnp.sum(i)

    t_a = timeit(run_approx)
    print(f"approx_max_k  {t_a:7.2f} ms (recall~0.95, inexact)", flush=True)
    pairs = n_u * n_items
    best = min(t_x, t_k)
    print(f"best: {best:.2f} ms = {pairs / best / 1e6:,.1f}M pairs/ms "
          f"= {pairs / best * 1e3 / 1e9:.1f}G pairs/s", flush=True)


if __name__ == "__main__":
    main()
