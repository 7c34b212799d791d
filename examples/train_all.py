"""Reference-parity driver: the reference's train.py flow, on this framework.

Mirrors reference train.py:3-36 line for line — train each of the five
models (including the warm-start re-train pattern), export embeddings in
the interchange layout — against a data directory in the reference's
format. Run with real data dirs or the synthetic generator:

  python examples/train_all.py --data data --content meta.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from topk_rec_tpu.models import BPR, CER, DPM, MLPEncoder, VBPR, WMF


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data")
    ap.add_argument("--content", default="meta.pkl")
    ap.add_argument("--out", default="embed")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--d", type=int, default=20000)
    args = ap.parse_args()
    uid = os.path.join(args.data, "uid")
    vid = os.path.join(args.data, "vid")
    tr = os.path.join(args.data, "f0tr.txt")
    content = os.path.join(args.data, args.content)

    # BPR (ref train.py:3-9)
    model = BPR(k=args.k)
    model.load_training_data(uid, vid, tr)
    model.train(epochs=5, batch_size=256, epoch_sample_limit=int(10e5))
    model.export_embeddings(f"{args.out}/bpr")
    model.train(
        epochs=5, batch_size=256, epoch_sample_limit=int(10e5),
        model_path=f"{args.out}/bpr",
    )

    # VBPR (ref train.py:11-16)
    model = VBPR(k=args.k, d=args.d)
    model.load_training_data(uid, vid, tr)
    model.load_content_data(content, vid)
    model.train(epochs=5, batch_size=256, epoch_sample_limit=int(10e5))
    model.export_embeddings(f"{args.out}/vbpr")
    model.train(
        epochs=5, batch_size=256, epoch_sample_limit=int(10e5),
        model_path=f"{args.out}/vbpr",
    )

    # WMF (ref train.py:18-22)
    model = WMF(k=args.k)
    model.load_training_data(uid, vid, tr)
    model.train(max_iter=200, tol=1e-4)
    model.export_embeddings(f"{args.out}/wmf")
    model.train(max_iter=20, model_path=f"{args.out}/wmf")

    # CER (ref train.py:24-29)
    model = CER(k=args.k, d=args.d)
    model.load_training_data(uid, vid, tr)
    model.load_content_data(content, vid)
    model.train(max_iter=20)
    model.export_embeddings(f"{args.out}/cer")
    model.train(max_iter=20, model_path=f"{args.out}/cer")

    # DPM (ref train.py:31-36)
    model = DPM(k=args.k, d=args.d)
    model.load_training_data(uid, vid, tr)
    model.load_content_data(content, vid)
    model.train(MLPEncoder, max_iter=20)
    model.export_embeddings(f"{args.out}/dpm")
    model.train(MLPEncoder, max_iter=20, model_path=f"{args.out}/dpm")


if __name__ == "__main__":
    main()
