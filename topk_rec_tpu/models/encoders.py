"""Content encoders: pluggable feature→latent mappings for DPM-style models.

Plays the role of the reference's ENCODER ABC + MLP (reference
single/encoder.py:13-24, single/mlp.py:8-43): an encoder maps item content
features X ∈ R^{n×d} to latent vectors ∈ R^{n×k}, supports one-pass SGD
fitting against regression targets, and an optional pretrain hook.

The MLP mirrors the reference architecture — d→2000→1000→k, sigmoid hidden
activations, linear output, 0.5·Σ(y−F)² loss, RMSProp(1e-4) with batch 64
(mlp.py:8-40) — as a pure-JAX module whose whole fit pass runs in one
compiled ``lax.scan``. (The reference's ``out`` allocates the output with
the wrong leading dimension, mlp.py:26 — see SURVEY.md C8; we implement the
intended shape.)
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Encoder(ABC):
    """Interface: ``predict``, ``fit`` (one SGD sweep), ``pretrain``."""

    @abstractmethod
    def predict(self, X: np.ndarray) -> np.ndarray: ...

    @abstractmethod
    def fit(self, X: np.ndarray, Y: np.ndarray) -> float: ...

    def pretrain(self, X: np.ndarray, Y: np.ndarray) -> None:
        """Optional; the reference MLP's is a no-op (mlp.py:42-43)."""

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {}

    def load_state_dict(self, state: Dict[str, np.ndarray]) -> None:
        pass


def _forward(params: List, x: jax.Array) -> jax.Array:
    h = x
    for W, b in params[:-1]:
        h = jax.nn.sigmoid(h @ W + b)
    W, b = params[-1]
    return h @ W + b


@partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
def _fit_epoch(
    params: List,
    ms: List,
    X: jax.Array,       # [n_pad, d] permuted + zero-padded
    Y: jax.Array,       # [n_pad, k]
    row_ok: jax.Array,  # [n_pad] 1.0 for real rows, 0.0 for padding
    lr: float,
    batch_size: int,
):
    """One shuffled minibatch-SGD sweep; returns summed pre-update loss."""
    n_batches = X.shape[0] // batch_size

    def loss_fn(p, xb, yb, wb):
        out = _forward(p, xb)
        return 0.5 * jnp.sum(wb[:, None] * (yb - out) ** 2)

    def step(carry, idx):
        params, ms = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * batch_size, batch_size)
        xb, yb, wb = sl(X), sl(Y), sl(row_ok)
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb, wb)
        new_params = []
        new_ms = []
        for (p, g), m in zip(zip(params, grads), ms):
            pW, pb = p
            gW, gb = g
            mW, mb = m
            mW = 0.9 * mW + 0.1 * gW * gW
            mb = 0.9 * mb + 0.1 * gb * gb
            new_params.append(
                (pW - lr * gW / jnp.sqrt(mW + 1e-10), pb - lr * gb / jnp.sqrt(mb + 1e-10))
            )
            new_ms.append((mW, mb))
        return (new_params, new_ms), loss

    (params, ms), losses = jax.lax.scan(
        step, (params, ms), jnp.arange(n_batches)
    )
    return params, ms, jnp.sum(losses)


@partial(jax.jit, static_argnames=())
def _predict(params: List, X: jax.Array) -> jax.Array:
    return _forward(params, X)


class MLPEncoder(Encoder):
    """Feed-forward content encoder (reference MLP parity)."""

    def __init__(
        self,
        k: int,
        d: int,
        lr: float = 1e-4,
        hidden_layers: Sequence[int] = (2000, 1000),
        seed: int = 0,
        batch_size: int = 64,
    ):
        self.k = k
        self.d = d
        self.lr = lr
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        dims = [d, *hidden_layers, k]
        self.params = []
        for i in range(len(dims) - 1):
            key, sub = jax.random.split(key)
            fan_in, fan_out = dims[i], dims[i + 1]
            # glorot-uniform kernels, zero biases (tf.layers.dense defaults)
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            W = jax.random.uniform(
                sub, (fan_in, fan_out), minval=-limit, maxval=limit
            ).astype(jnp.float32)
            self.params.append((W, jnp.zeros(fan_out, dtype=jnp.float32)))
        self.ms = [
            (jnp.zeros_like(W), jnp.zeros_like(b)) for W, b in self.params
        ]

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(_predict(self.params, jnp.asarray(X, dtype=jnp.float32)))

    def fit(self, X: np.ndarray, Y: np.ndarray) -> float:
        """One shuffled SGD sweep (ref mlp.py:32-40); returns summed loss."""
        n = X.shape[0]
        perm = self._rng.permutation(n)
        pad = (-n) % self.batch_size
        Xp = np.zeros((n + pad, X.shape[1]), dtype=np.float32)
        Yp = np.zeros((n + pad, Y.shape[1]), dtype=np.float32)
        ok = np.zeros(n + pad, dtype=np.float32)
        Xp[:n] = X[perm]
        Yp[:n] = Y[perm]
        ok[:n] = 1.0
        self.params, self.ms, loss = _fit_epoch(
            self.params,
            self.ms,
            jnp.asarray(Xp),
            jnp.asarray(Yp),
            jnp.asarray(ok),
            self.lr,
            self.batch_size,
        )
        return float(loss)

    # ---- checkpointing ----

    def state_dict(self) -> Dict[str, np.ndarray]:
        state = {}
        for i, ((W, b), (mW, mb)) in enumerate(zip(self.params, self.ms)):
            state[f"W{i}"] = np.asarray(W)
            state[f"b{i}"] = np.asarray(b)
            state[f"mW{i}"] = np.asarray(mW)
            state[f"mb{i}"] = np.asarray(mb)
        return state

    def load_state_dict(self, state: Dict[str, np.ndarray]) -> None:
        n_layers = len(self.params)
        self.params = [
            (jnp.asarray(state[f"W{i}"]), jnp.asarray(state[f"b{i}"]))
            for i in range(n_layers)
        ]
        self.ms = [
            (jnp.asarray(state[f"mW{i}"]), jnp.asarray(state[f"mb{i}"]))
            for i in range(n_layers)
        ]
