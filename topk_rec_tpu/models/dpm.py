"""DPM: weighted ALS alternated with a neural content encoder.

DeepMusic-style model (reference single/dpm.py): each iteration
(1) re-predicts item latents from content with the encoder,
(2) runs the user/item ALS sweeps with the encoder output as the item
    prior (identical normal equations to CER),
(3) fits the encoder for one SGD sweep against the ALS-updated latents
    (dpm.py:31-59). After the loop, unrated items get the encoder's
    prediction (cold-start writeback, dpm.py:61-64).

The encoder is pluggable via the Encoder interface (models/encoders.py),
mirroring the reference's class-argument pattern (train.py:34 passes MLP).
The reference runs ``max_iter`` iterations without a convergence check
(dpm.py:30) — we keep that behavior.
Defaults mirror reference dpm.py:11: lu=0.01, lv=10, le=1e4, a=1, b=0.01.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Type, Union

import jax.numpy as jnp
import numpy as np

from ..utils import tprint
from .encoders import Encoder
from .wmf import WMF


class DPM(WMF):
    def __init__(
        self,
        k: int,
        d: int,
        lu: float = 0.01,
        lv: float = 10.0,
        le: float = 10e3,
        a: float = 1.0,
        b: float = 0.01,
        seed: int = 0,
        block_size: int = 2048,
        mesh=None,
    ):
        super().__init__(k, lu, lv, a, b, seed, block_size, mesh=mesh)
        self.d = d
        self.le = le
        self.encoder: Optional[Encoder] = None

    def train(
        self,
        encoder: Union[Type[Encoder], Encoder],
        max_iter: int = 200,
        model_path: Optional[str] = None,
        verbose: bool = True,
        log_dir: Optional[str] = None,
        pretrain: bool = True,
        save_lag: Optional[int] = None,
        save_dir: Optional[str] = None,
        fit_batch: Optional[int] = None,
    ) -> None:
        """Alternating ALS / encoder-SGD training (reference dpm.py:20-64).

        ``fit_batch`` overrides the encoder's SGD minibatch size for the
        per-iteration fit sweep. The reference uses 64 (mlp.py:34), which
        makes the fit ~162 sequential scan steps per iteration at
        MovieLens scale — the dominant share of the DPM iteration
        (benchmarks/probe_dpm_iteration.py --decompose). ``fit_batch=1024``
        is the measured fast mode (~10 steps/sweep); its accuracy trade
        vs the batch-64 reference alternation, measured over 3 seeds
        through the untouched reference CLI (accuracy_parity.py --models
        dpm_fast, 2026-08-21): in-matrix acc@30 0.1086±0.0009 vs ref
        0.1122±0.0013 (~3% relative BELOW), cold-start om acc@30
        0.4559±0.0015 vs 0.4392±0.0053 (~4% ABOVE — fewer encoder steps
        per iteration keep item latents closer to the content prior).
        Default None keeps the encoder's own (reference-parity batch-64)
        setting; pick the fast mode when iteration latency matters more
        than the last in-matrix percent.
        """
        from ..utils.statelog import StateLog

        assert self.inter is not None and self.feat is not None
        if isinstance(encoder, type):
            try:
                self.encoder = encoder(self.k, self.d, mesh=self.mesh)
            except TypeError:  # encoders without mesh support
                self.encoder = encoder(self.k, self.d)
        else:
            self.encoder = encoder
        if fit_batch is not None:
            self.encoder.batch_size = int(fit_batch)
        if model_path is not None and os.path.isdir(model_path):
            self.import_embeddings(model_path)
        slog = StateLog(
            log_dir,
            {
                "model": "dpm", "k": self.k, "d": self.d, "lu": self.lu,
                "lv": self.lv, "le": self.le, "a": self.a, "b": self.b,
                "max_iter": max_iter,
            },
        )
        if pretrain:
            # layer-wise unsupervised init where the encoder implements it
            # (SDAE/CDL); the reference MLP's hook is a no-op
            # (ref single/mlp.py:42-43), so MLP behavior is unchanged.
            self.encoder.pretrain(self.feat, None)
        prev_loss = None
        inter = self.inter
        for it in range(max_iter):
            t1 = time.time()
            # E-step surrogate: encoder re-predicts all item latents
            # (ref dpm.py:33)
            Fe = self.encoder.predict(self.feat)
            self.fie = np.array(Fe, dtype=np.float32, copy=True)
            # device-resident sweeps (as_numpy=False): the user table
            # never round-trips to host; only fie is fetched below for the
            # encoder's SGD fit (the reference alternation needs it on
            # host, ref dpm.py:59)
            rated_items, rated_users = self._rated_dev()
            self.fue, _ = self._half_sweep(
                self._user_plan,
                self.fue,
                self.fie,
                rated_items,
                self.a,
                self.b,
                self.lu,
                as_numpy=False,
            )
            fie_dev, fit = self._half_sweep(
                self._item_plan,
                self.fie,
                self.fue,
                rated_users,
                self.a,
                self.b,
                self.lv,
                prior=jnp.asarray(Fe),
                as_numpy=False,
            )
            loss = float(
                fit
                + 0.5 * self.lu * jnp.sum(self.fue**2)
                + 0.5 * self.lv * jnp.sum((fie_dev - Fe) ** 2)
            )
            self.fie = np.array(fie_dev)
            # M-step: one SGD sweep fitting encoder to current latents
            # (ref dpm.py:59)
            loss += self.encoder.fit(self.feat, self.fie)
            cond = (
                abs(prev_loss - loss) / abs(prev_loss)
                if prev_loss is not None
                else float("inf")
            )
            prev_loss = loss
            slog.append(it, loss, cond)
            if save_lag and save_dir and it % save_lag == 0:
                self._save_lag_dump(save_dir, it)
            if verbose:
                tprint(
                    "Iter %3d, loss %.6f, time %.2fs"
                    % (it, loss, time.time() - t1)
                )
        # back to a mutable host array (external contract)
        self.fue = np.array(self.fue)
        # cold-start writeback from the final encoder (ref dpm.py:61-64)
        Fe = self.encoder.predict(self.feat)
        unrated = np.setdiff1d(np.arange(self.n_items), inter.rated_items)
        self.fie[unrated] = Fe[unrated]
        # release the encoder's device feature cache (~800MB HBM at
        # d=20000) — training is done; eval/serving needs the headroom
        if hasattr(self.encoder, "drop_feature_cache"):
            self.encoder.drop_feature_cache()

    # ---- encoder checkpoint (TF-Saver analog, ref dpm.py:66-76) ----

    def _native_state(self):
        return self.encoder.state_dict() if self.encoder is not None else {}

    def _load_native_state(self, state) -> None:
        if self.encoder is not None:
            self.encoder.load_state_dict(state)
