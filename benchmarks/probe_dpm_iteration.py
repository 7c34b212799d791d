"""Measure ONE framework DPM iteration at the reference scale (real TPU).

Pairs with the reference CPU divisor minted by
``reference_als_baseline.py --models dpm`` (BASELINE.md "ALS iteration"
rows): 69,878 x 10,380, nnz=4M, k=50, d=20000, MLP 2000/1000 — per
iteration the encoder re-predicts all item latents, both ALS half-sweeps
run with the prediction as the item prior, and the encoder takes one
shuffled SGD sweep toward the solved latents (reference single/dpm.py:
20-64 structure, device-resident end to end).

Timing per CLAUDE.md: synced warmup + one burned timed-size block.

Usage: python benchmarks/probe_dpm_iteration.py [--iters 2] [--d 20000]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--d", type=int, default=20000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--fit-batch", type=int, default=64,
                    help="encoder SGD minibatch (64 = reference parity, "
                    "1024 = fast mode; accuracy_parity.py --models "
                    "dpm_fast validates the fast mode)")
    ap.add_argument("--decompose", action="store_true",
                    help="also time predict / user sweep / item sweep / "
                    "fie fetch / encoder fit separately")
    args = ap.parse_args()

    import jax.numpy as jnp

    from topk_rec_tpu.data.dataset import Interactions
    from topk_rec_tpu.models import DPM, MLPEncoder

    sys.path.insert(0, "/root/repo/benchmarks")
    from reference_als_baseline import movielens_scale_interactions

    # SAME fold generator as the reference divisor run — the comparison
    # is only valid if both sides see the same degree distribution
    pos_u, pos_i, n_users, n_items = movielens_scale_interactions()
    inter = Interactions(n_users, n_items, pos_u, pos_i)
    rng = np.random.default_rng(2)  # matches the --models dpm feat seed
    feat = rng.standard_normal((n_items, args.d)).astype(np.float32)

    model = DPM(k=args.k, d=args.d, seed=0)
    model.set_interactions(inter)
    model.set_features(feat)
    enc = MLPEncoder(args.k, args.d, seed=0, batch_size=args.fit_batch)
    model.encoder = enc
    rated_items, rated_users = model._rated_dev()

    def dpm_iter():
        Fe = enc.predict(model.feat)
        model.fie = np.array(Fe, dtype=np.float32, copy=True)
        model.fue, _ = model._half_sweep(
            model._user_plan, model.fue, model.fie, rated_items,
            model.a, model.b, model.lu, as_numpy=False,
        )
        fie_dev, fit = model._half_sweep(
            model._item_plan, model.fie, model.fue, rated_users,
            model.a, model.b, model.lv, prior=jnp.asarray(Fe),
            as_numpy=False,
        )
        model.fie = np.array(fie_dev)
        loss = float(fit) + enc.fit(model.feat, model.fie)
        return loss

    dpm_iter()  # compile + warm
    dpm_iter()  # burn first timed-size block
    t0 = time.time()
    for _ in range(args.iters):
        dpm_iter()
    dt = (time.time() - t0) / args.iters
    print(
        f"framework DPM (d={args.d}, fit_batch={args.fit_batch}): "
        f"{dt:.2f} s/iteration "
        f"(encoder predict + 2 ALS half-sweeps + encoder fit sweep)",
        flush=True,
    )

    if args.decompose:
        # piece timings: each piece synced individually (the composed
        # iteration above is the honest end-to-end number; these
        # attribute it). Burn one round first.
        def time_piece(fn, n=3):
            fn()
            t0 = time.time()
            for _ in range(n):
                fn()
            return (time.time() - t0) / n

        Fe = enc.predict(model.feat)
        t_pred = time_piece(lambda: enc.predict(model.feat))
        fie0 = np.array(Fe, dtype=np.float32, copy=True)

        def user_sweep():
            out, _ = model._half_sweep(
                model._user_plan, model.fue, fie0, rated_items,
                model.a, model.b, model.lu, as_numpy=False,
            )
            jnp.sum(out).block_until_ready()

        def item_sweep():
            out, fit = model._half_sweep(
                model._item_plan, fie0, model.fue, rated_users,
                model.a, model.b, model.lv, prior=jnp.asarray(Fe),
                as_numpy=False,
            )
            float(fit)

        t_user = time_piece(user_sweep)
        t_item = time_piece(item_sweep)
        fie_dev, _ = model._half_sweep(
            model._item_plan, fie0, model.fue, rated_users,
            model.a, model.b, model.lv, prior=jnp.asarray(Fe),
            as_numpy=False,
        )
        t_fetch = time_piece(lambda: np.array(fie_dev))
        fie_host = np.array(fie_dev)
        t_fit = time_piece(lambda: enc.fit(model.feat, fie_host))
        print(
            f"decompose: predict {t_pred*1e3:.0f} ms | user sweep "
            f"{t_user*1e3:.0f} ms | item sweep {t_item*1e3:.0f} ms | "
            f"fie fetch {t_fetch*1e3:.0f} ms | encoder fit "
            f"{t_fit*1e3:.0f} ms (batch {args.fit_batch}, "
            f"{-(-feat.shape[0] // args.fit_batch)} scan steps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
