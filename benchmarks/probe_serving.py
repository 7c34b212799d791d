"""Pipelined serving latency per selection method (real TPU).

Re-measures BASELINE.md's "Serving latency" section: TopKServer over the
MovieLens-scale tables (69,878 x 10,380, d=50), batches of 256 users,
k=30, seen-exclusion on; many batches dispatched asynchronously with one
host sync per batch result fetch (recommend_async). Timing per CLAUDE.md:
compile warmup, then one burned timed-size block, then the timed block.

Usage: python benchmarks/probe_serving.py [--batches 48] [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=48)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--methods", default="approx,pallas,exact")
    ap.add_argument("--tails", action="store_true",
                    help="per-request p50/p90/p99 under 1/4/8 concurrent "
                         "closed-loop streams (threaded; each request "
                         "blocks on its own result fetch)")
    ap.add_argument("--tail-requests", type=int, default=96)
    args = ap.parse_args()

    from reference_als_baseline import movielens_scale_interactions

    from topk_rec_tpu.data.dataset import Interactions
    from topk_rec_tpu.serving import TopKServer

    pos_u, pos_i, n_users, n_items = movielens_scale_interactions()
    inter = Interactions(n_users, n_items, pos_u, pos_i)
    rng = np.random.default_rng(0)
    d = 50
    srv = TopKServer(
        rng.normal(size=(n_users, d)).astype(np.float32),
        rng.normal(size=(n_items, d)).astype(np.float32),
        rng.normal(size=n_items).astype(np.float32),
        interactions=inter,
    )
    batches = [
        rng.integers(0, n_users, size=args.batch).astype(np.int32)
        for _ in range(args.batches)
    ]

    import jax.numpy as jnp

    def run_sync_once(method):
        # device-throughput view (matches the round-2 BASELINE numbers):
        # all batches dispatched, ONE host sync at the end — measures the
        # chip's serving rate without paying a tunnel RTT per batch
        outs = [srv.recommend_async(b, 30, method=method) for b in batches]
        float(sum(jnp.sum(o[0]) for o in outs))

    def run_fetch_each(method):
        # end-to-end view: each batch's [256, 30] results fetched to host
        # (a real server returns them) — tunnel RTT per batch included
        outs = [srv.recommend_async(b, 30, method=method) for b in batches]
        for o in outs:
            np.asarray(o[0])

    def run_tails(method, concurrency, n_requests):
        """Closed-loop per-request latency under C concurrent streams.

        Each stream thread submits one batch and BLOCKS on its own
        result fetch before submitting the next — per-request wall time
        therefore includes the single-program-at-a-time TPU queueing
        delay that means/async-throughput numbers hide (VERDICT r4 weak
        #5). Returns sorted per-request latencies (seconds).
        """
        import threading

        per_stream = max(1, n_requests // concurrency)
        all_lat = []

        def worker(sid):
            lrng = np.random.default_rng(1000 + sid)
            lat = []
            for _ in range(per_stream):
                b = lrng.integers(
                    0, n_users, size=args.batch
                ).astype(np.int32)
                t0 = time.perf_counter()
                out = srv.recommend_async(b, 30, method=method)
                np.asarray(out[0])  # block for THIS request's result
                lat.append(time.perf_counter() - t0)
            all_lat.append(lat)

        threads = [
            threading.Thread(target=worker, args=(s,))
            for s in range(concurrency)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        lat = np.sort(np.concatenate([np.asarray(x) for x in all_lat]))
        return lat, wall

    for method in args.methods.split(","):
        for name, run in (
            ("sync-once", run_sync_once), ("fetch-each", run_fetch_each)
        ):
            run(method)  # compile + warm
            run(method)  # burn first timed-size block
            t0 = time.time()
            run(method)
            dt = (time.time() - t0) / len(batches)
            print(
                f"{method:7s} {name:10s} {dt * 1e3:6.2f} ms/batch "
                f"({args.batch / dt:,.0f} users/s)",
                flush=True,
            )
        if args.tails:
            for conc in (1, 4, 8):
                run_tails(method, conc, 16)  # warm this thread pattern
                lat, wall = run_tails(method, conc, args.tail_requests)
                n = len(lat)
                p = lambda q: lat[min(n - 1, int(q * n))] * 1e3
                print(
                    f"{method:7s} tails C={conc}: p50 {p(0.50):6.1f} "
                    f"p90 {p(0.90):6.1f} p99 {p(0.99):6.1f} ms/request "
                    f"({n * args.batch / wall:,.0f} users/s aggregate)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
