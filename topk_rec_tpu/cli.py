"""Command-line interface: train / evaluate / fuse.

``evaluate`` is flag-compatible with the reference CLI
(reference evaluate.py:48-55: -d -m -f -s -t -sl) and prints the same
``scenario,acc@step,...,acc@total`` CSV lines, but scores + top-k run on
device. ``train`` replaces the reference's edit-the-script driver
(reference train.py) with a real subcommand over the typed config.

Usage:
  python -m topk_rec_tpu.cli evaluate -d data -m embed/bpr -f 0 -sl im om
  python -m topk_rec_tpu.cli train --model bpr -d data -o embed/bpr --k 50
  python -m topk_rec_tpu.cli fuse --strategy average -d data \
      -m embed/cer_meta embed/cer_tfidf -sl im
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional

# Optional platform override (e.g. TKR_PLATFORM=cpu): must precede any jax
# backend use; this environment pre-imports jax with a pinned remote-TPU
# platform, so a plain JAX_PLATFORMS env var is not enough.
if os.environ.get("TKR_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TKR_PLATFORM"])

import numpy as np

from .data import Interactions, load_id_map, read_dat  # noqa: F401
from .eval import DeviceEvaluator
from .eval.protocol import load_test_likes
from .utils import tprint


def _load_fold(data_dir: str, fold: int):
    uids = load_id_map(os.path.join(data_dir, "uid"))
    iids = load_id_map(os.path.join(data_dir, "vid"))
    inter, _, _ = Interactions.from_files(
        os.path.join(data_dir, "uid"),
        os.path.join(data_dir, "vid"),
        os.path.join(data_dir, f"f{fold}tr.txt"),
    )
    return inter, uids, iids


def _scenario_inputs(data_dir: str, fold: int, scenario: str, uids, iids):
    idl = os.path.join(data_dir, f"f{fold}te.{scenario}.idl")
    txt = os.path.join(data_dir, f"f{fold}te.{scenario}.txt")
    cand_map = load_id_map(idl)
    cand_ids = np.empty(len(cand_map), dtype=np.int64)
    for cid, pos in cand_map.items():
        cand_ids[pos] = iids[cid]
    likes = load_test_likes(txt, uids, cand_map)
    return cand_ids, likes


def cmd_evaluate(args) -> int:
    inter, uids, iids = _load_fold(args.data, args.fold)
    umat = read_dat(os.path.join(args.model, "final-U.dat"), uids)
    vmat = read_dat(os.path.join(args.model, "final-V.dat"), iids)
    bpath = os.path.join(args.model, "final-B.dat")
    bmat = read_dat(bpath, iids) if os.path.exists(bpath) else None
    ev = DeviceEvaluator(
        inter.seen_bitmap, step=args.step, total=args.total,
        user_chunk=args.user_chunk,
    )
    for scenario in args.scenarios:
        cand_ids, likes = _scenario_inputs(
            args.data, args.fold, scenario, uids, iids
        )
        res = ev.evaluate(umat, vmat, bmat, cand_ids, likes)
        line = scenario + "".join(",%.6f" % a for a in res.accuracy)
        print(line)
    return 0


def _build_model(args):
    from .models import BPR, CER, DPM, VBPR, WMF

    name = args.model_name
    if name == "bpr":
        return BPR(
            k=args.k, lambda_u=args.lambda_u, lambda_i=args.lambda_i,
            lambda_j=args.lambda_j, lambda_b=args.lambda_b, lr=args.lr,
            mode=args.mode, seed=args.seed,
        )
    if name == "vbpr":
        return VBPR(
            k=args.k, d=args.d, lambda_u=args.lambda_u,
            lambda_i=args.lambda_i, lambda_j=args.lambda_j,
            lambda_b=args.lambda_b, lambda_e=args.lambda_e, lr=args.lr,
            mode=args.mode, seed=args.seed,
        )
    if name == "wmf":
        return WMF(
            k=args.k, lu=args.als_lu, lv=args.als_lv_wmf, a=args.als_a,
            b=args.als_b, seed=args.seed,
        )
    if name == "cer":
        return CER(
            k=args.k, d=args.d, lu=args.als_lu, lv=args.als_lv,
            le=args.als_le, a=args.als_a, b=args.als_b, seed=args.seed,
        )
    if name == "dpm":
        return DPM(
            k=args.k, d=args.d, lu=args.als_lu, lv=args.als_lv,
            le=args.als_le, a=args.als_a, b=args.als_b, seed=args.seed,
        )
    raise SystemExit(f"unknown model {name!r}")


def cmd_train(args) -> int:
    model = _build_model(args)
    model.load_training_data(
        os.path.join(args.data, "uid"),
        os.path.join(args.data, "vid"),
        os.path.join(args.data, f"f{args.fold}tr.txt"),
    )
    if args.model_name in ("vbpr", "cer", "dpm"):
        if not args.content:
            raise SystemExit(f"--content is required for {args.model_name}")
        model.load_content_data(
            os.path.join(args.data, args.content),
            os.path.join(args.data, "vid"),
        )
    if args.model_name in ("bpr", "vbpr"):
        model.train(
            epochs=args.epochs,
            batch_size=args.batch_size,
            epoch_sample_limit=args.epoch_sample_limit,
            model_path=args.warm_start,
        )
    elif args.model_name == "dpm":
        from .models import MLPEncoder

        enc = MLPEncoder(
            args.k, model.d, hidden_layers=tuple(args.encoder_hidden),
            seed=args.seed,
        )
        model.train(
            enc, max_iter=args.max_iter, model_path=args.warm_start,
            log_dir=args.log_dir,
        )
    else:
        model.train(
            max_iter=args.max_iter, tol=args.tol,
            model_path=args.warm_start, log_dir=args.log_dir,
        )
    model.export_embeddings(args.out)
    tprint(f"Exported embeddings to {args.out}")
    return 0


def cmd_fuse(args) -> int:
    from .fusion import (
        ModalityScores,
        average_weights,
        bpr_fusion_weights,
        error_weights,
        evaluate_fused,
        rank_geometric_weights,
        svm_fusion_weights,
    )

    inter, uids, iids = _load_fold(args.data, args.fold)
    embeddings = []
    for mdir in args.models:
        U = read_dat(os.path.join(mdir, "final-U.dat"), uids)
        V = read_dat(os.path.join(mdir, "final-V.dat"), iids)
        embeddings.append((U, V))
    modalities = ModalityScores(embeddings)
    F = len(embeddings)

    if args.strategy == "average":
        weights = average_weights(F)
    elif args.strategy == "rank":
        weights = rank_geometric_weights(F, args.p)
    elif args.strategy == "error":
        tr_cand = np.arange(inter.n_items)
        weights = error_weights(modalities, inter, tr_cand)
    elif args.strategy == "svm":
        weights = svm_fusion_weights(
            modalities, inter, n_samples=args.n_samples, seed=args.seed
        )
    elif args.strategy == "bpr":
        weights = bpr_fusion_weights(
            modalities, inter, n_samples=args.n_samples, seed=args.seed
        )
    else:
        raise SystemExit(f"unknown strategy {args.strategy!r}")

    for scenario in args.scenarios:
        cand_ids, likes = _scenario_inputs(
            args.data, args.fold, scenario, uids, iids
        )
        res = evaluate_fused(
            modalities, weights, inter.seen_bitmap, cand_ids, likes,
            step=args.step, total=args.total,
        )
        line = f"{args.strategy}-{scenario}" + "".join(
            ",%.6f" % a for a in res.accuracy
        )
        print(line)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="topk_rec_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("evaluate", help="evaluate exported .dat embeddings")
    pe.add_argument("-d", "--data", required=True)
    pe.add_argument("-m", "--model", required=True)
    pe.add_argument("-f", "--fold", type=int, default=0)
    pe.add_argument("-s", "--step", type=int, default=5)
    pe.add_argument("-t", "--total", type=int, default=30)
    pe.add_argument("-sl", "--scenarios", nargs="+", default=["im", "om"])
    pe.add_argument("--user-chunk", type=int, default=8192)
    pe.set_defaults(func=cmd_evaluate)

    pt = sub.add_parser("train", help="train a model and export embeddings")
    pt.add_argument("--model", dest="model_name", required=True,
                    choices=["bpr", "vbpr", "wmf", "cer", "dpm"])
    pt.add_argument("-d", "--data", required=True)
    pt.add_argument("-o", "--out", required=True)
    pt.add_argument("-f", "--fold", type=int, default=0)
    pt.add_argument("--content", default=None, help="content pickle filename")
    pt.add_argument("--k", type=int, default=50)
    pt.add_argument("--d", type=int, default=20000)
    pt.add_argument("--epochs", type=int, default=5)
    pt.add_argument("--batch-size", type=int, default=256)
    pt.add_argument("--epoch-sample-limit", type=int, default=None)
    pt.add_argument("--max-iter", type=int, default=200)
    pt.add_argument("--tol", type=float, default=1e-4)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--mode", default="l2", choices=["l2", "l1"])
    pt.add_argument("--lambda-u", type=float, default=2.5e-3)
    pt.add_argument("--lambda-i", type=float, default=2.5e-3)
    pt.add_argument("--lambda-j", type=float, default=2.5e-4)
    pt.add_argument("--lambda-b", type=float, default=0.0)
    pt.add_argument("--lambda-e", type=float, default=0.0)
    pt.add_argument("--als-lu", type=float, default=0.01)
    pt.add_argument("--als-lv", type=float, default=10.0)
    pt.add_argument("--als-lv-wmf", type=float, default=0.01)
    pt.add_argument("--als-le", type=float, default=10e3)
    pt.add_argument("--als-a", type=float, default=1.0)
    pt.add_argument("--als-b", type=float, default=0.01)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--warm-start", default=None)
    pt.add_argument("--log-dir", default=None,
                    help="write state.log/settings.txt here (ALS models)")
    pt.add_argument("--encoder-hidden", type=int, nargs="+",
                    default=[2000, 1000])
    pt.set_defaults(func=cmd_train)

    pf = sub.add_parser("fuse", help="late-fuse several model dirs")
    pf.add_argument("--strategy", required=True,
                    choices=["average", "rank", "error", "svm", "bpr"])
    pf.add_argument("-d", "--data", required=True)
    pf.add_argument("-m", "--models", nargs="+", required=True)
    pf.add_argument("-f", "--fold", type=int, default=0)
    pf.add_argument("-s", "--step", type=int, default=5)
    pf.add_argument("-t", "--total", type=int, default=30)
    pf.add_argument("-sl", "--scenarios", nargs="+", default=["im", "om"])
    pf.add_argument("--p", type=float, default=0.5, help="rank-fusion p")
    pf.add_argument("--n-samples", type=int, default=100_000)
    pf.add_argument("--seed", type=int, default=0)
    pf.set_defaults(func=cmd_fuse)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
