"""Probe: exactness-repaired approx top-k vs the Pallas v2 exact kernel.

Measures, at the bench serving shape (69878x10380, d=50, k=30, ~2% seen
mask, bf16 matmul), a small grid over (k_extra, recall_target, cap) of
ops/topk_hybrid.exact_topk_hybrid, plus the existing fused Pallas kernel
and raw approx_max_k for reference. Verifies hybrid == lax.top_k once
(untimed) and reports per-variant repaired-row counts.

Timing follows CLAUDE.md: dispatch all iterations async, one host fetch
at the end; a full timed-size burn-in block absorbs the fresh-process
first-block artifact; the headline candidate is re-measured A-B-A.

Usage: python benchmarks/probe_topk_hybrid.py [--iters 12]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from topk_rec_tpu.ops.topk_hybrid import exact_topk_hybrid
    from topk_rec_tpu.ops.topk_pallas import fused_score_topk

    n_users, n_items, d, k = 69878, 10380, 50, 30
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(n_users, d)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n_items).astype(np.float32))
    mask = jax.jit(
        lambda key: (
            jax.random.uniform(key, (n_users, n_items)) < 0.02
        ).astype(jnp.int8)
    )(jax.random.PRNGKey(0))

    # NOTE: operands must be jit ARGUMENTS — closing over them bakes the
    # 725MB mask into the HLO as a literal and the axon remote-compile
    # service rejects the request (HTTP 413)
    def scored(U, V, b, mask):
        s = jnp.dot(
            U, V.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + b[None, :]
        return jnp.where(mask != 0, -jnp.inf, s)

    variants = {}

    def add_hybrid(ke, rc, cap):
        name = f"hybrid(ke={ke},rc={rc},cap={cap})"

        @jax.jit
        def fn(U, V, b, mask):
            v, i = exact_topk_hybrid(
                U, V, b, mask, k, k_extra=ke, cap=cap, recall=rc,
                exact_matmul=False,
            )
            return jnp.sum(v) + jnp.sum(i)

        variants[name] = fn

    for ke, rc in [(10, 0.95), (34, 0.95), (10, 0.90), (34, 0.90),
                   (98, 0.85)]:
        add_hybrid(ke, rc, 2048)

    @jax.jit
    def run_pallas(U, V, b, mask):
        v, i = fused_score_topk(U, V, b, mask, k, exact_matmul=False)
        return jnp.sum(v) + jnp.sum(i)

    @jax.jit
    def run_approx_raw(U, V, b, mask):
        v, i = jax.lax.approx_max_k(scored(U, V, b, mask), k)
        return jnp.sum(v) + jnp.sum(i)

    variants["pallas_v2"] = run_pallas
    variants["approx_raw(inexact)"] = run_approx_raw

    # ---- exactness verification + repair stats (untimed) ----
    if not args.skip_verify:
        ev, ei = jax.jit(
            lambda U, V, b, mask: jax.lax.top_k(scored(U, V, b, mask), k)
        )(U, V, b, mask)
        ev, ei = np.asarray(ev), np.asarray(ei)
        for ke, rc in [(10, 0.95), (34, 0.90)]:
            hv, hi, nbad = exact_topk_hybrid(
                U, V, b, mask, k, k_extra=ke, recall=rc,
                exact_matmul=False, with_stats=True,
            )
            ok_v = np.array_equal(np.asarray(hv), ev)
            ok_i = np.array_equal(np.asarray(hi), ei)
            print(
                f"verify ke={ke} rc={rc}: vals_eq={ok_v} idx_eq={ok_i} "
                f"repaired_rows={int(nbad)} "
                f"({100 * int(nbad) / n_users:.2f}%)",
                flush=True,
            )
            assert ok_v and ok_i, "hybrid NOT exact"

    # repair counts for every timed hybrid variant (affects pass C cost)
    for ke, rc in [(10, 0.95), (34, 0.95), (10, 0.90), (34, 0.90),
                   (98, 0.85)]:
        _, _, nbad = exact_topk_hybrid(
            U, V, b, mask, k, k_extra=ke, recall=rc,
            exact_matmul=False, with_stats=True,
        )
        print(f"stats ke={ke} rc={rc}: repaired={int(nbad)}", flush=True)

    def timeit(fn, iters):
        float(fn(U, V, b, mask))  # compile + warm
        # burn one full timed-size block (first-block residual setup)
        outs = [fn(U, V, b, mask) for _ in range(iters)]
        float(sum(outs))
        t0 = time.time()
        outs = [fn(U, V, b, mask) for _ in range(iters)]
        acc = float(sum(outs))
        dt = (time.time() - t0) / iters
        assert np.isfinite(acc)
        return dt

    pairs = n_users * n_items
    results = {}
    for name, fn in variants.items():
        dt = timeit(fn, args.iters)
        results[name] = dt
        print(f"{name:32s} {dt * 1e3:7.2f} ms  {pairs / dt / 1e9:7.2f} G pairs/s",
              flush=True)

    # A-B-A on the best hybrid vs pallas_v2
    best = min(
        (n for n in results if n.startswith("hybrid")), key=results.get
    )
    print(f"\nA-B-A: {best} vs pallas_v2")
    for name in (best, "pallas_v2", best):
        dt = timeit(variants[name], args.iters)
        print(f"  {name:30s} {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
