"""Benchmark entry point (driver-run, real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: BPR training throughput at the reference-parity configuration
(k=50, batch 256, MovieLens-scale synthetic fold: 69878 users x 10380
items, ~4M positives). The baseline divisor is the reference's loop
re-implemented on CPU (per-element Python rejection sampling + RMSProp,
benchmarks/reference_baseline.py): 18,778 samples/sec minted on this
machine (2026-08-17, see BASELINE.md). The reference's real TF1 path would
be slower (feed_dict round trips), so vs_baseline is conservative.

Extra diagnostics (stderr, not part of the contract): large-batch
throughput and the fused scoring+top-k rate.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CPU_SAMPLES_PER_SEC = 18778.0  # benchmarks/reference_baseline.py


def main() -> None:
    import jax

    # Persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compile of the training chunk (executables are serialized per
    # program shape; safe to share across processes).
    try:
        import os

        cache = os.environ.get(
            "TKR_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from topk_rec_tpu.data.dataset import Interactions
    from topk_rec_tpu.models import BPR
    from topk_rec_tpu.models.bpr import _train_chunk

    rng = np.random.default_rng(0)
    n_users, n_items, nnz = 69878, 10380, 4_000_000
    inter = Interactions(
        n_users,
        n_items,
        rng.integers(0, n_users, size=nnz).astype(np.int32),
        rng.integers(0, n_items, size=nnz).astype(np.int32),
    )
    model = BPR(k=50, seed=0)
    model.set_interactions(inter)
    model._init_params(jax.random.PRNGKey(0))
    s = model.sampler
    hyper = {
        "lu": model.lu,
        "li": model.li,
        "lj": model.lj,
        "lb": model.lb,
        "lr": model.lr,
    }

    def run_chunks(n_chunks, batch_size, scan_steps, seed):
        key = jax.random.PRNGKey(seed)
        out = 0.0
        for _ in range(n_chunks):
            key, sub = jax.random.split(key)
            model._params, model._ms, loss = _train_chunk(
                model._params, model._ms, sub,
                s.user_rows, s.flat_pos, s.pos_bitmap,
                hyper, batch_size, n_items, model.k_candidates,
                scan_steps, "l2",
            )
            out = loss
        return float(out)  # forces completion

    batch_size, scan_steps = 256, 128
    run_chunks(1, batch_size, scan_steps, 1)  # compile + warm
    n_chunks = 16
    t0 = time.time()
    run_chunks(n_chunks, batch_size, scan_steps, 2)
    dt = time.time() - t0
    sps = n_chunks * scan_steps * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "bpr_train_samples_per_sec",
                "value": round(sps, 1),
                "unit": "samples/sec (k=50, batch=256 reference parity)",
                "vs_baseline": round(sps / REFERENCE_CPU_SAMPLES_PER_SEC, 2),
            }
        )
    )

    # --- extra diagnostics to stderr ---
    try:
        run_chunks(1, 8192, 64, 3)
        t0 = time.time()
        run_chunks(8, 8192, 64, 4)
        dt = time.time() - t0
        print(
            f"extra: large-batch(8192) {8 * 64 * 8192 / dt:,.0f} samples/s",
            file=sys.stderr,
        )
    except Exception as e:  # diagnostics must never break the contract
        print(f"extra bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
