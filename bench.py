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

The JSON line also carries a "scoring" sub-object: full-catalog
scoring+top-k throughput (scored user-item pairs/sec/chip) for the fused
Pallas kernel at the MovieLens serving shape (69878x10380, d=50, k=30,
bf16 matmul) and its % of the MXU-only roofline (speed-of-light analysis
in BASELINE.md). Extra diagnostics (stderr, not part of the contract):
large-batch training throughput and the unfused-XLA scoring rate.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CPU_SAMPLES_PER_SEC = 18778.0  # benchmarks/reference_baseline.py

# TPU v5e peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM. The fused
# kernel never materializes the score matrix, so its memory/compute
# speed-of-light is tiny: 2*U*I*d matmul flops (0.37 ms) and ~1B*U*I mask
# bytes + embedding reads (~0.9 ms HBM). The measured gap above that SOL
# is the VPU-bound top-k selection (no sort unit on TPU; see BASELINE.md
# "speed-of-light" section for the full derivation and kernel history).
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9


def bench_scoring(n_users=69878, n_items=10380, d=50, k=30, iters=16):
    """Exact scoring+top-k throughput at the MovieLens serving shape.

    Returns (pairs_per_sec, roofline_pct, extras dict). Headline kernel
    is the fused Pallas score+mask+top-k kernel (ops/topk_pallas.py,
    exact incl. the in-jit suspect fallback); full XLA lax.top_k is timed
    as the unfused diagnostic. Timing dispatches all iterations
    asynchronously and synchronizes once (block_until_ready undercounts
    behind the axon tunnel and per-iter scalar fetches would add a tunnel
    RTT each — see CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    from topk_rec_tpu.ops.topk_pallas import fused_score_topk

    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(n_users, d)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n_items).astype(np.float32))
    # realistic seen-mask density (~2% of catalog browsed per user),
    # generated on device — a host-built [U, I] mask would cost a ~725MB
    # tunnel transfer before the clock even starts
    mask = jax.jit(
        lambda key: (
            jax.random.uniform(key, (n_users, n_items)) < 0.02
        ).astype(jnp.int8)
    )(jax.random.PRNGKey(0))

    def scored(U, V, b, mask):
        scores = jnp.dot(
            U, V.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + b[None, :]
        return jnp.where(mask != 0, -jnp.inf, scores)

    @jax.jit
    def run_xla(U, V, b, mask):
        vals, idx = jax.lax.top_k(scored(U, V, b, mask), k)
        return jnp.sum(vals) + jnp.sum(idx)

    @jax.jit
    def run_pallas(U, V, b, mask):
        vals, idx = fused_score_topk(U, V, b, mask, k, exact_matmul=False)
        return jnp.sum(vals) + jnp.sum(idx)

    def timeit(fn):
        float(fn(U, V, b, mask))  # compile + warm
        # burn one full timed-size block: the FIRST timed block of each
        # program absorbs ~500-700 ms of one-time residual setup even
        # after a synced warmup (measured 56 vs 25.6 ms/iter, same
        # program — CLAUDE.md measurement playbook)
        float(sum(fn(U, V, b, mask) for _ in range(iters)))
        t0 = time.time()
        # dispatch all iterations asynchronously; the single scalar fetch
        # at the end synchronizes the chain (one tunnel RTT amortized over
        # all iterations instead of one per iteration)
        outs = [fn(U, V, b, mask) for _ in range(iters)]
        acc = float(sum(outs))
        dt = (time.time() - t0) / iters
        assert np.isfinite(acc)
        return dt

    dt_pallas = timeit(run_pallas)
    dt_xla = timeit(run_xla)
    pairs = n_users * n_items
    t_mxu = 2.0 * pairs * d / V5E_BF16_FLOPS
    # fused kernel HBM bytes: int8 mask read + the (tiny) embedding reads;
    # the score matrix never leaves VMEM
    t_hbm = (
        pairs * 1.0 + 4.0 * (n_users + n_items) * d
    ) / V5E_HBM_BYTES_PER_SEC
    t_sol = max(t_mxu, t_hbm)
    return (
        pairs / dt_pallas,
        100.0 * t_sol / dt_pallas,
        {
            "xla_topk_pairs_per_sec": pairs / dt_xla,
            "sol_ms": t_sol * 1e3,
            "pallas_ms": dt_pallas * 1e3,
        },
    )


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
    # MovieLens-like degree skew: zipf item popularity, deduplicated
    # (u, i) pairs. The structured generator (synthetic_interactions)
    # computes full-catalog affinity matmuls per sampled batch and is
    # unaffordable on host at 4M; the zipf skew captures the property
    # that matters for the measured costs — duplicate-row aggregation in
    # the sparse updates follows the item-degree distribution.
    draw = int(nnz * 1.3)
    uu = rng.integers(0, n_users, size=draw).astype(np.int64)
    ii = ((rng.zipf(1.1, size=draw) - 1) % n_items).astype(np.int64)
    key = np.unique(uu * n_items + ii)
    rng.shuffle(key)
    key = key[:nnz]
    inter = Interactions(
        n_users,
        n_items,
        (key // n_items).astype(np.int32),
        (key % n_items).astype(np.int32),
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

    def run_chunks(n_chunks, batch_size, scan_steps, seed, fused=False):
        key = jax.random.PRNGKey(seed)
        out = 0.0
        for _ in range(n_chunks):
            key, sub = jax.random.split(key)
            model._params, model._ms, loss = _train_chunk(
                model._params, model._ms, sub,
                s.user_rows, s.flat_pos, s.pos_bitmap,
                hyper, batch_size, n_items, model.k_candidates,
                scan_steps, "l2", fused,
            )
            out = loss
        return float(out)  # forces completion

    batch_size, scan_steps = 256, 128
    run_chunks(1, batch_size, scan_steps, 1)  # compile + warm
    n_chunks = 16
    run_chunks(n_chunks, batch_size, scan_steps, 5)  # burn first timed-size block
    t0 = time.time()
    run_chunks(n_chunks, batch_size, scan_steps, 2)
    dt = time.time() - t0
    sps = n_chunks * scan_steps * batch_size / dt

    # full-catalog scoring+top-k (serving path); failures must not break
    # the headline contract
    scoring = None
    try:
        pps, sol_pct, extras = bench_scoring()
        scoring = {
            "pairs_per_sec_per_chip": round(pps, 1),
            "roofline_pct": round(sol_pct, 1),
            "kernel": "pallas_fused_exact(bf16,k=30)",
            "shape": "69878x10380xd50",
        }
        print(
            f"extra: scoring pallas fused {pps:,.0f} pairs/s "
            f"({sol_pct:.1f}% of HBM+MXU speed-of-light, "
            f"{extras['pallas_ms']:.2f}ms vs SOL {extras['sol_ms']:.2f}ms); "
            f"xla top_k {extras['xla_topk_pairs_per_sec']:,.0f} pairs/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"scoring bench failed: {e}", file=sys.stderr)

    line = {
        "metric": "bpr_train_samples_per_sec",
        "value": round(sps, 1),
        "unit": "samples/sec (k=50, batch=256 reference parity)",
        "vs_baseline": round(sps / REFERENCE_CPU_SAMPLES_PER_SEC, 2),
    }
    if scoring is not None:
        line["scoring"] = scoring
    print(json.dumps(line))

    # --- extra diagnostics to stderr ---
    try:
        # large batches auto-select the fused [n_users+n_items, k+1]
        # table (BPR.train table_layout='auto'); bench the same layout
        run_chunks(1, 8192, 64, 3, fused=True)
        run_chunks(8, 8192, 64, 6, fused=True)  # burn first timed-size block
        t0 = time.time()
        run_chunks(8, 8192, 64, 4, fused=True)
        dt = time.time() - t0
        print(
            f"extra: large-batch(8192,fused-layout) {8 * 64 * 8192 / dt:,.0f} samples/s",
            file=sys.stderr,
        )
    except Exception as e:  # diagnostics must never break the contract
        print(f"extra bench failed: {e}", file=sys.stderr)

    # ALS (WMF) iteration at the same MovieLens-scale fold: the reference
    # divisor is its 69,878 sequential k x k host solves per sweep
    # (reference single/wmf.py:70-97), minted on this machine's CPU by
    # benchmarks/reference_als_baseline.py — see BASELINE.md ALS rows.
    try:
        from topk_rec_tpu.models import WMF

        wmf = WMF(k=50, seed=0)
        wmf.set_interactions(inter)
        # the device-resident iteration the train loop actually runs
        # (as_numpy=False keeps embeddings on device; float() is the
        # per-iteration sync)
        float(wmf._sweeps(prior=None, as_numpy=False))  # compile + warm
        float(wmf._sweeps(prior=None, as_numpy=False))  # burn first block
        t0 = time.time()
        float(wmf._sweeps(prior=None, as_numpy=False))
        float(wmf._sweeps(prior=None, as_numpy=False))
        dt = (time.time() - t0) / 2
        print(
            f"extra: wmf als {dt:.2f} s/iteration "
            "(69878x10380 nnz=4M k=50; reference CPU divisor in "
            "BASELINE.md 'ALS iteration' rows)",
            file=sys.stderr,
        )
        # CER iteration at the reference's d=20000 (the Woodbury-CG
        # E-solve path; reference divisor 122 s/iteration, BASELINE.md)
        from topk_rec_tpu.models import CER

        rng2 = np.random.default_rng(7)
        cer = CER(k=50, d=20000, seed=0)
        cer._user_plan = wmf._user_plan  # same fold: reuse the plans
        cer._item_plan = wmf._item_plan
        cer.inter = inter
        cer.set_features(
            rng2.standard_normal((n_items, 20000)).astype(np.float32)
        )
        cer.fue = wmf.fue.copy()
        cer.fie = wmf.fie.copy()

        import jax.numpy as jnp

        cer._E_dev = jnp.asarray(
            rng2.standard_normal((20000, 50)).astype(np.float32)
        )
        rated_items = jnp.asarray(inter.rated_items)
        rated_users = jnp.asarray(inter.rated_users)

        def cer_iter():
            # device-resident CER iteration, mirroring CER.train
            Fe = jnp.dot(
                cer._feat_device(), cer._E_dev,
                preferred_element_type=jnp.float32,
            )
            cer.fue, _ = cer._half_sweep(
                cer._user_plan, cer.fue, cer.fie,
                rated_items, cer.a, cer.b, cer.lu, as_numpy=False,
            )
            cer.fie, fit = cer._half_sweep(
                cer._item_plan, cer.fie, cer.fue,
                rated_users, cer.a, cer.b, cer.lv,
                prior=Fe, as_numpy=False,
            )
            cer._E_dev = cer._solve_E(cer.fie)
            float(fit)  # per-iteration sync point (as in CER.train's loss)

        cer_iter()  # compile + warm
        cer_iter()  # burn first timed-size block
        # 3-iteration average: a single timed iteration has read up to
        # 3x high when it collided with residual async work (0.87 vs a
        # clean-window 0.285 — round-4 re-measure)
        t0 = time.time()
        cer_iter()
        cer_iter()
        cer_iter()
        dt_cer = (time.time() - t0) / 3
        print(
            f"extra: cer als {dt_cer:.2f} s/iteration "
            "(d=20000 Woodbury-CG E-solve; reference divisor 122 s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"als extra failed: {e}", file=sys.stderr)

    # DPM iteration (encoder predict + ALS sweeps + encoder fit sweep)
    # at the reference d=20000; reference divisor 155 s/iteration
    # (benchmarks/reference_als_baseline.py --models dpm, BASELINE.md)
    try:
        import jax.numpy as jnp

        from topk_rec_tpu.models import DPM, MLPEncoder

        rng3 = np.random.default_rng(2)
        dpm = DPM(k=50, d=20000, seed=0)
        dpm.set_interactions(inter)
        dpm.set_features(
            rng3.standard_normal((n_items, 20000)).astype(np.float32)
        )
        enc = MLPEncoder(50, 20000, seed=0)
        dpm.encoder = enc
        rated_items, rated_users = dpm._rated_dev()

        def dpm_iter():
            Fe = enc.predict(dpm.feat)
            dpm.fie = np.array(Fe, dtype=np.float32, copy=True)
            dpm.fue, _ = dpm._half_sweep(
                dpm._user_plan, dpm.fue, dpm.fie, rated_items,
                dpm.a, dpm.b, dpm.lu, as_numpy=False,
            )
            fie_dev, fit = dpm._half_sweep(
                dpm._item_plan, dpm.fie, dpm.fue, rated_users,
                dpm.a, dpm.b, dpm.lv, prior=jnp.asarray(Fe),
                as_numpy=False,
            )
            dpm.fie = np.array(fie_dev)
            float(fit)
            enc.fit(dpm.feat, dpm.fie)

        dpm_iter()  # compile + warm
        dpm_iter()  # burn first timed-size block
        t0 = time.time()
        dpm_iter()
        dpm_iter()
        dt_dpm = (time.time() - t0) / 2
        print(
            f"extra: dpm iter {dt_dpm:.2f} s/iteration "
            "(d=20000 encoder predict + ALS + fit; reference divisor "
            "155 s)",
            file=sys.stderr,
        )
        # fast mode: fit_batch=1024 (DPM.train(fit_batch=...); accuracy
        # parity vs the batch-64 reference alternation measured by
        # accuracy_parity.py --models dpm_fast)
        enc.batch_size = 1024
        dpm_iter()  # compile + warm (new fit program shape)
        dpm_iter()  # burn
        t0 = time.time()
        dpm_iter()
        dpm_iter()
        dt_fast = (time.time() - t0) / 2
        enc.batch_size = 64
        print(
            f"extra: dpm iter fast(fit_batch=1024) {dt_fast:.2f} "
            "s/iteration (same reference divisor 155 s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"dpm extra failed: {e}", file=sys.stderr)

    # Fusion: streamed fused eval over 8 modalities x 8,305 candidates
    # (average strategy — the O(U*C*F) shape every strategy shares).
    # Reference divisor: the materializing chunked-NumPy path measured by
    # benchmarks/bench_fusion.py --side ref (285 s on this machine's CPU,
    # float32, RAM-capped chunks — favorable to the reference, whose real
    # efusion.py holds the full ~9-18 GB tensor and walks rows in
    # Python, old/methods/efusion.py:141-155).
    try:
        from topk_rec_tpu.fusion import (
            ModalityScores, average_weights, evaluate_fused,
        )
        from topk_rec_tpu.ops.topk_pallas import pack_candidate_bitmap

        rngf = np.random.default_rng(11)
        F, n_cand = 8, 8305
        embeds = [
            (
                rngf.normal(size=(n_users, 50)).astype(np.float32),
                rngf.normal(size=(n_items, 50)).astype(np.float32),
            )
            for _ in range(F)
        ]
        modalities = ModalityScores(embeds)
        cand_ids = np.sort(
            rngf.choice(n_items, size=n_cand, replace=False)
        ).astype(np.int64)
        likes = {
            int(u): [int(c) for c in rngf.integers(0, n_cand, size=3)]
            for u in rngf.choice(n_users, size=10_000, replace=False)
        }
        packed = pack_candidate_bitmap(inter.seen_bitmap, cand_ids)
        w = average_weights(F)

        def fuse_once():
            return evaluate_fused(
                modalities, w, inter.seen_bitmap, cand_ids, likes,
                user_chunk=8192, packed_seen=packed,
            )

        fuse_once()  # compile + warm
        fuse_once()  # burn first timed-size block
        t0 = time.time()
        fuse_once()
        dt_fuse = time.time() - t0
        entries = n_users * n_cand * F
        print(
            f"extra: fuse eval {dt_fuse:.2f} s "
            f"({entries / dt_fuse / 1e9:.2f}G fused entries/s, 8 mod x "
            f"69878x8305 streamed; reference materializing divisor "
            f"285 s -> {285.0 / dt_fuse:,.0f}x)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"fuse extra failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
