"""Recommender base class: data loading + embedding interchange.

Plays the role of the reference's ``REC`` ABC (reference single/rec.py:18):
content loading with row re-alignment, ``final-U/V/B.dat`` export/import
(the text interchange contract consumed by the reference's evaluate.py and
all fusion scripts), and warm-start support. Model math lives in
subclasses; everything here is host-side NumPy.

On top of the reference's text contract we add a native checkpoint
(``checkpoint.npz``) that round-trips full training state (optimizer
accumulators, auxiliary matrices) without text-precision loss — the
reference's analog is its TF-Saver binary graph (single/bpr.py:173-183).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Dict, Optional

import numpy as np

from ..data.dataset import Interactions
from ..data.io import load_features, read_dat, write_dat
from ..utils import tprint


class Recommender(ABC):
    """Base for all models.

    Exported embedding attributes follow the reference's naming so the
    interchange logic is uniform (reference single/rec.py:47-61):
      ``fue`` -> final-U.dat, ``fie`` -> final-V.dat, ``fib`` -> final-B.dat.
    """

    def __init__(self, k: int):
        self.k = k
        self.inter: Optional[Interactions] = None
        self.uids: Optional[Dict[str, int]] = None
        self.iids: Optional[Dict[str, int]] = None
        self.n_users: int = 0
        self.n_items: int = 0
        self.feat: Optional[np.ndarray] = None
        self.d: int = 0
        self.fue: Optional[np.ndarray] = None
        self.fie: Optional[np.ndarray] = None
        self.fib: Optional[np.ndarray] = None

    # ---- data loading ----

    def load_training_data(
        self, uid_file: str, iid_file: str, tr_file: str
    ) -> None:
        """Reference-parity entry point (reference single/bpr.py:51-69)."""
        tprint(f"Load training data from {tr_file}")
        inter, uids, iids = Interactions.from_files(uid_file, iid_file, tr_file)
        self.set_interactions(inter, uids, iids)
        tprint("Loading finished!")

    def set_interactions(
        self,
        inter: Interactions,
        uids: Optional[Dict[str, int]] = None,
        iids: Optional[Dict[str, int]] = None,
    ) -> None:
        """Direct in-memory entry point (tests, pipelines)."""
        self.inter = inter
        self.n_users = inter.n_users
        self.n_items = inter.n_items
        self.uids = uids
        self.iids = iids
        self._on_data_loaded()

    def _on_data_loaded(self) -> None:
        """Hook for subclasses to build device layouts."""

    def load_content_data(self, content_file: str, iid_file: str) -> None:
        """Load + row-align pickled item features (reference rec.py:23-33)."""
        tprint(f"Load content data from {content_file}")
        assert self.iids is not None, "load_training_data must run first"
        self.set_features(
            load_features(content_file, iid_file, self.iids, d=self.d or None)
        )
        tprint("Loading finished!")

    def set_features(self, feat: np.ndarray) -> None:
        self.feat = np.asarray(feat, dtype=np.float32)
        self.d = self.feat.shape[1]

    # ---- training ----

    @abstractmethod
    def train(self, *args, **kwargs) -> None: ...

    # ---- interchange (.dat text contract) ----

    def export_embeddings(self, model_path: str) -> None:
        """Write final-U/V/B.dat for whichever embeddings exist.

        Mirrors reference rec.py:47-61 including the create-if-missing
        behavior and attribute-presence gating.
        """
        if not os.path.exists(model_path):
            tprint(f"{model_path} does not exist, create it instead")
            os.makedirs(model_path, exist_ok=True)
        if not os.path.isdir(model_path):
            tprint(f"{model_path} is not a folder")
            return
        if self.fue is not None:
            write_dat(os.path.join(model_path, "final-U.dat"), self.fue)
        if self.fie is not None:
            write_dat(os.path.join(model_path, "final-V.dat"), self.fie)
        if self.fib is not None:
            write_dat(os.path.join(model_path, "final-B.dat"), self.fib)
        self.export_model(model_path)

    def import_embeddings(self, model_path: str) -> None:
        """Warm-start from exported text embeddings (reference rec.py:69-82)."""
        p = os.path.join(model_path, "final-U.dat")
        if os.path.exists(p):
            self.fue = read_dat(p, self.uids)
        p = os.path.join(model_path, "final-V.dat")
        if os.path.exists(p):
            self.fie = read_dat(p, self.iids)
        p = os.path.join(model_path, "final-B.dat")
        if os.path.exists(p):
            self.fib = read_dat(p, self.iids)
        self.import_model(model_path)

    # ---- native checkpoint (model-specific extras) ----

    def export_model(self, model_path: str) -> None:
        """Persist model-specific state; default saves a native npz."""
        state = self._native_state()
        if state:
            np.savez(os.path.join(model_path, "checkpoint.npz"), **state)

    def import_model(self, model_path: str) -> None:
        p = os.path.join(model_path, "checkpoint.npz")
        if os.path.exists(p):
            with np.load(p) as data:
                self._load_native_state(dict(data))

    def _native_state(self) -> Dict[str, np.ndarray]:
        return {}

    def _load_native_state(self, state: Dict[str, np.ndarray]) -> None:
        pass

    # ---- scoring ----

    def scores(self, cand_item_ids: np.ndarray) -> np.ndarray:
        """U · V_candᵀ (+ bias) over a candidate subset (ref utils.py:92-98)."""
        assert self.fue is not None and self.fie is not None
        s = self.fue @ self.fie[cand_item_ids].T
        if self.fib is not None:
            s = s + self.fib.reshape(-1)[cand_item_ids][None, :]
        return s
