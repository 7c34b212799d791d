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
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Encoder(ABC):
    """Interface: ``predict``, ``fit`` (one SGD sweep), ``pretrain``.

    CONTRACT: implementations may cache a device-resident copy of the
    feature matrix ``X`` keyed on object identity (MLPEncoder does — the
    re-upload it avoids costs ~800MB/iteration at the reference d=20000
    scale), so callers must treat ``X`` as immutable between calls: to
    change features, pass a NEW array object, never mutate in place.
    MLPEncoder additionally spot-checks a strided sample of the cached
    array and fails loudly on detected in-place mutation.
    """

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


def _fit_epoch_impl(
    params: List,
    ms: List,
    X: jax.Array,       # [n_pad, d] permuted + zero-padded
    Y: jax.Array,       # [n_pad, k]
    row_ok: jax.Array,  # [n_pad] 1.0 for real rows, 0.0 for padding
    lr,
    batch_size: int,
    constrain_batch=None,
):
    """One shuffled minibatch-SGD sweep; returns summed pre-update loss.

    ``constrain_batch`` is the data-parallel hook: a mesh caller pins each
    minibatch's rows to the "dp" axis while the (replicated) parameters'
    gradients — sums over the batch — psum across shards via GSPMD
    (SURVEY §2.4 "data parallelism for dense content encoders").
    """
    if constrain_batch is None:
        constrain_batch = lambda x: x
    n_batches = X.shape[0] // batch_size

    def loss_fn(p, xb, yb, wb):
        out = _forward(p, xb)
        return 0.5 * jnp.sum(wb[:, None] * (yb - out) ** 2)

    def step(carry, idx):
        params, ms = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * batch_size, batch_size)
        xb, yb = constrain_batch(sl(X)), constrain_batch(sl(Y))
        wb = sl(row_ok)
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


@partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0, 1))
def _fit_epoch(params, ms, X, Y, row_ok, lr, batch_size: int):
    """Single-device compiled fit sweep (see ``_fit_epoch_impl``)."""
    return _fit_epoch_impl(params, ms, X, Y, row_ok, lr, batch_size)


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
        mesh=None,
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
        self.mesh = None
        self._fit_fn = _fit_epoch
        if mesh is not None:
            self.set_mesh(mesh)

    def set_mesh(self, mesh) -> None:
        """Data-parallel fit: minibatch rows sharded over "dp", parameters
        replicated — their batch-summed gradients psum across shards via
        GSPMD (SURVEY §2.4; the reference encoder is single-device,
        single/mlp.py:32-40)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        dp = NamedSharding(mesh, P("dp", None))
        repl = NamedSharding(mesh, P())
        cb = lambda x: jax.lax.with_sharding_constraint(x, dp)
        self._fit_fn = jax.jit(
            partial(_fit_epoch_impl, constrain_batch=cb),
            static_argnames=("batch_size",),
            donate_argnums=(0, 1),
            out_shardings=(None, None, repl),
        )

    def _feat_dev(self, X: np.ndarray) -> jax.Array:
        """Device-resident copy of the feature matrix, cached by object
        identity: DPM passes the SAME ``self.feat`` array to ``predict``
        and ``fit`` every iteration, and re-uploading it each call costs
        ~800MB of host->device traffic per iteration at the reference
        d=20000 scale. The cache treats X as immutable — the documented
        Encoder contract (pass a fresh array to change features); a
        strided 16-element spot sample is checked on every hit so
        in-place mutation fails loudly instead of silently computing
        against stale device data. jax arrays pass through untouched."""
        if isinstance(X, jax.Array):
            return X
        key = (id(X), X.shape)
        if getattr(self, "_x_cache_key", None) != key:
            self._x_cache_key = key
            # keep a reference to the SOURCE array: the id() key is only
            # unique while the object is alive — without pinning it, a
            # freshly-allocated same-shape array could reuse the freed
            # address and silently hit the stale cache
            self._x_cache_src = X
            flat_idx = np.linspace(
                0, X.size - 1, num=min(16, X.size), dtype=np.int64
            )
            # 2-D index tuples, NOT reshape(-1): reshape on a
            # non-C-contiguous X (transposed/column-sliced view) silently
            # copies the whole ~GB matrix per call (ADVICE r4)
            self._x_probe_idx = np.unravel_index(flat_idx, X.shape)
            self._x_probe = np.array(X[self._x_probe_idx])
            self._x_cache = jnp.asarray(X, dtype=jnp.float32)
        else:
            sample = X[self._x_probe_idx]
            if not np.array_equal(
                sample, self._x_probe, equal_nan=True
            ):
                raise ValueError(
                    "Encoder feature matrix was mutated in place after "
                    "being cached on device — the Encoder contract "
                    "requires passing a NEW array to change features "
                    "(see Encoder docstring)"
                )
        return self._x_cache

    def drop_feature_cache(self) -> None:
        """Release the cached device feature matrix (~800MB of HBM at the
        reference d=20000 scale). Called by DPM.train once the encoder's
        last prediction is done; safe to call anytime — the next
        predict/fit re-uploads."""
        self._x_cache_key = None
        self._x_cache_src = None
        self._x_cache = None

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(_predict(self.params, self._feat_dev(X)))

    def fit(self, X: np.ndarray, Y: np.ndarray) -> float:
        """One shuffled SGD sweep (ref mlp.py:32-40); returns summed loss.

        The shuffle permutation is drawn on host (tiny) but applied as a
        device gather against the cached feature matrix — no per-sweep
        [n, d] host permute + upload."""
        n = X.shape[0]
        perm = self._rng.permutation(n)
        pad = (-n) % self.batch_size
        perm_p = np.concatenate(
            [perm, np.zeros(pad, dtype=np.int64)]
        ).astype(np.int32)
        ok = np.zeros(n + pad, dtype=np.float32)
        ok[:n] = 1.0
        perm_dev = jnp.asarray(perm_p)
        Xp = self._feat_dev(X)[perm_dev]
        Yp = jnp.asarray(Y, dtype=jnp.float32)[perm_dev]
        self.params, self.ms, loss = self._fit_fn(
            self.params,
            self.ms,
            Xp,
            Yp,
            jnp.asarray(ok),
            self.lr,
            batch_size=self.batch_size,
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


@partial(jax.jit, static_argnames=("batch_size", "linear_out"))
def _dae_pretrain_epoch(
    W, b, Wd, bd, ms,      # encode/decode params + RMSProp accumulators
    H: jax.Array,          # [n_pad, d_in] layer input (permuted, padded)
    row_ok: jax.Array,     # [n_pad]
    noise_key: jax.Array,
    corrupt: float,
    lr,
    batch_size: int,
    linear_out: bool,
):
    """One denoising-autoencoder SGD sweep for a single layer.

    Masking-noise corruption of the input, sigmoid encode, (linear or
    sigmoid) decode, 0.5·Σ(H − dec)² reconstruction loss, RMSProp — the
    CDL/SDAE layer-wise pretraining recipe (the reference's encoder
    interface reserves the hook but never implements it,
    single/encoder.py:21-24, single/mlp.py:42-43).
    """
    n_batches = H.shape[0] // batch_size
    keys = jax.random.split(noise_key, n_batches)

    def loss_fn(p, hb, wb, key):
        W, b, Wd, bd = p
        mask = jax.random.bernoulli(key, 1.0 - corrupt, hb.shape)
        z = jax.nn.sigmoid(jnp.where(mask, hb, 0.0) @ W + b)
        dec = z @ Wd + bd
        if not linear_out:
            dec = jax.nn.sigmoid(dec)
        return 0.5 * jnp.sum(wb[:, None] * (hb - dec) ** 2)

    def step(carry, xs):
        p, ms = carry
        idx, key = xs
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * batch_size, batch_size)
        hb, wb = sl(H), sl(row_ok)
        loss, grads = jax.value_and_grad(loss_fn)(p, hb, wb, key)
        new_p, new_ms = [], []
        for pi, gi, mi in zip(p, grads, ms):
            mi = 0.9 * mi + 0.1 * gi * gi
            new_p.append(pi - lr * gi / jnp.sqrt(mi + 1e-10))
            new_ms.append(mi)
        return (tuple(new_p), tuple(new_ms)), loss

    (p, ms), losses = jax.lax.scan(
        step, ((W, b, Wd, bd), ms), (jnp.arange(n_batches), keys)
    )
    return p, ms, jnp.sum(losses)


class SDAEEncoder(MLPEncoder):
    """Stacked denoising autoencoder content encoder (CDL-style).

    Same d→hidden→…→k regression stack as :class:`MLPEncoder` (so ``fit``/
    ``predict``/checkpointing are inherited), plus a real ``pretrain``:
    each hidden layer is initialized by training a single-layer denoising
    autoencoder on the previous layer's (clean) activations — masking
    noise at ``corrupt`` rate, reconstruction by a throwaway decoder —
    greedily bottom-up, before ``fit`` fine-tunes end-to-end against the
    ALS latents (DPM/CDL alternation, models/dpm.py). Extends the
    reference's pluggable encoder interface (single/encoder.py:13-24),
    whose ``pertrain [sic]`` hook is a no-op there (single/mlp.py:42-43).
    """

    def __init__(
        self,
        k: int,
        d: int,
        lr: float = 1e-4,
        hidden_layers: Sequence[int] = (2000, 1000),
        seed: int = 0,
        batch_size: int = 64,
        mesh=None,
        corrupt: float = 0.3,
        pretrain_lr: float = 1e-3,
        pretrain_epochs: int = 3,
    ):
        super().__init__(k, d, lr, hidden_layers, seed, batch_size, mesh)
        self.corrupt = corrupt
        self.pretrain_lr = pretrain_lr
        self.pretrain_epochs = pretrain_epochs
        self._pretrain_key = jax.random.PRNGKey(seed + 1)
        self.pretrain_losses: List[List[float]] = []

    def pretrain(self, X: np.ndarray, Y: np.ndarray = None) -> None:
        """Greedy layer-wise denoising pretraining of the hidden layers.

        The output (regression) layer is left at its init — it has no
        reconstruction target; ``fit`` trains it.
        """
        # device-resident activations: uploaded once, permuted by device
        # gather per epoch, and propagated through each trained layer on
        # device (per-epoch host permutes + uploads of the layer-0
        # features cost ~800MB each at the reference d=20000 scale)
        H = self._feat_dev(np.asarray(X, dtype=np.float32))
        self.pretrain_losses = []
        for li in range(len(self.params) - 1):
            W, b = self.params[li]
            d_in = int(W.shape[0])
            key = jax.random.PRNGKey(
                int(jax.random.randint(self._pretrain_key, (), 0, 2**31 - 1))
            )
            self._pretrain_key, _ = jax.random.split(self._pretrain_key)
            Wd = jnp.asarray(np.asarray(W).T.copy())
            bd = jnp.zeros(d_in, dtype=jnp.float32)
            ms = tuple(
                jnp.zeros_like(p) for p in (W, b, Wd, bd)
            )
            losses = []
            for _ in range(self.pretrain_epochs):
                n = H.shape[0]
                perm = self._rng.permutation(n)
                pad = (-n) % self.batch_size
                perm_p = np.concatenate(
                    [perm, np.zeros(pad, dtype=np.int64)]
                ).astype(np.int32)
                ok = np.zeros(n + pad, dtype=np.float32)
                ok[:n] = 1.0
                Hp = H[jnp.asarray(perm_p)]  # device gather (pad rows
                # duplicate row 0; their loss weight is 0)
                key, sub = jax.random.split(key)
                (W, b, Wd, bd), ms, loss = _dae_pretrain_epoch(
                    W, b, Wd, bd, ms,
                    Hp, jnp.asarray(ok), sub,
                    self.corrupt, self.pretrain_lr,
                    batch_size=self.batch_size,
                    linear_out=(li == 0),  # raw features are unbounded
                )
                losses.append(float(loss))
            self.params[li] = (W, b)
            self.ms[li] = (jnp.zeros_like(W), jnp.zeros_like(b))
            self.pretrain_losses.append(losses)
            # clean (uncorrupted) activations feed the next layer
            H = jax.nn.sigmoid(H @ W + b)
