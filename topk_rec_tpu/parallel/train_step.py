"""Distributed training/scoring steps over a (dp, mp) mesh.

TPU-native scaling for the pairwise-SGD family (greenfield vs the
single-device reference — SURVEY.md §2.4): embedding tables row-sharded
over the "mp" axis (NamedSharding P('mp', None)), triplet batches sharded
over "dp", jit-compiled with explicit in/out shardings so XLA GSPMD
inserts the collectives (gathers across table shards, psum of
replicated-parameter gradients) over ICI. This is the scaling-book
recipe: pick a mesh, annotate shardings, let XLA place collectives.

The distributed trainers compile THE SAME chunk bodies as the single-chip
models (models/bpr.py / models/vbpr.py ``_chunk_impl``) with sharding
hooks — whole-chunk device sampling, vmapped duplicate planning, single
unique-row HBM gathers, planned RMSProp — so every single-chip
optimization is inherited by construction and dist == local numerics hold
(tests/test_parallel.py).

The scoring grid (full-catalog U·Vᵀ for serving/eval) shards users over
"dp" and items over "mp": each device computes a [users/dp, items/mp]
tile; per-user top-k then reduces across "mp" tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.bpr import BPR
from ..models.vbpr import VBPR
from .mesh import BPR_PARAM_SPECS, VBPR_PARAM_SPECS, replicate, shard_params


class _DistributedPairwiseTrainer:
    """Shared machinery: shard params/sampler state, run chunks, sync back."""

    PARAM_SPECS: dict = {}

    def __init__(
        self,
        model,
        mesh: Mesh,
        batch_size: int = 4096,
        scan_steps: int = 8,
    ):
        assert model.inter is not None, "load data before distributing"
        mp = int(np.prod([
            s for s, n in zip(mesh.devices.shape, mesh.axis_names)
            if n == "mp"
        ]))
        assert model.inter.n_users % mp == 0 and model.inter.n_items % mp == 0, (
            f"user/item counts ({model.inter.n_users}/{model.inter.n_items}) "
            f"must divide the model axis ({mp}) — pad the tables or pick a "
            "different mesh (jit out-shardings require even row shards)"
        )
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        self.scan_steps = scan_steps
        if model._params is None:
            model._init_params(jax.random.PRNGKey(model.seed))
        self.params = shard_params(mesh, model._params, self.PARAM_SPECS)
        self.ms = shard_params(mesh, model._ms, self.PARAM_SPECS)
        s = model.sampler
        # Sampler state: per-user CSR/bitmap rows sharded like the user
        # table; the flat positive list is replicated (indices into it are
        # data-dependent).
        self.sampler_state = {
            "user_rows": replicate(mesh, s.user_rows),
            "flat_pos": replicate(mesh, s.flat_pos),
            "pos_bitmap": jax.device_put(
                s.pos_bitmap, NamedSharding(mesh, P("mp", None))
            ),
        }
        self._step = self._build_step()

    def _shard_hooks(self):
        """(constrain_batch, constrain_table) hooks for the chunk body."""
        dp = NamedSharding(self.mesh, P(None, "dp"))
        mp = NamedSharding(self.mesh, P("mp", None))
        return (
            lambda x: jax.lax.with_sharding_constraint(x, dp),
            lambda x: jax.lax.with_sharding_constraint(x, mp),
        )

    def _param_shardings(self):
        return {
            name: NamedSharding(self.mesh, spec)
            for name, spec in self.PARAM_SPECS.items()
        }

    def _build_step(self):
        raise NotImplementedError

    def train_chunk(self, key: jax.Array) -> float:
        self.params, self.ms, loss = self._step(
            self.params, self.ms, key, self.sampler_state
        )
        return float(loss)

    def sync_to_model(self) -> None:
        """Pull sharded tables back into the host-side model state
        (multi-host shards are replicated first — see distributed.fetch)."""
        from .distributed import fetch

        self.model._params = {
            name: jnp.asarray(fetch(v)) for name, v in self.params.items()
        }
        self.model._ms = {
            name: jnp.asarray(fetch(v)) for name, v in self.ms.items()
        }
        self.model._sync_host()


class DistributedBPRTrainer(_DistributedPairwiseTrainer):
    """BPR SGD with tables row-sharded over "mp", batch over "dp"."""

    PARAM_SPECS = BPR_PARAM_SPECS

    def _build_step(self):
        from ..models.bpr import _chunk_impl

        model = self.model
        hyper = {
            "lu": model.lu,
            "li": model.li,
            "lj": model.lj,
            "lb": model.lb,
            "lr": model.lr,
        }
        cb, ct = self._shard_hooks()
        param_shardings = self._param_shardings()
        repl = NamedSharding(self.mesh, P())
        chunk = partial(
            _chunk_impl,
            hyper=hyper,
            batch_size=self.batch_size,
            n_items=model.n_items,
            k_candidates=model.k_candidates,
            n_steps=self.scan_steps,
            mode=model.mode,
            constrain_batch=cb,
            constrain_table=ct,
        )

        def step(params, ms, key, state):
            return chunk(
                params, ms, key,
                state["user_rows"], state["flat_pos"], state["pos_bitmap"],
            )

        return jax.jit(
            step,
            out_shardings=(param_shardings, param_shardings, repl),
            donate_argnums=(0, 1),
        )


class DistributedVBPRTrainer(_DistributedPairwiseTrainer):
    """VBPR SGD: embedding tables + item features row-sharded over "mp",
    the dense content projection (cem) and content bias (icb) replicated
    (their gradients psum across "dp" via GSPMD), batch over "dp"."""

    PARAM_SPECS = VBPR_PARAM_SPECS

    def __init__(
        self,
        model: VBPR,
        mesh: Mesh,
        batch_size: int = 4096,
        scan_steps: int = 8,
    ):
        assert model.feat is not None, "set features before distributing"
        self.feat = jax.device_put(
            jnp.asarray(model.feat), NamedSharding(mesh, P("mp", None))
        )
        super().__init__(model, mesh, batch_size, scan_steps)

    def _build_step(self):
        from ..models.vbpr import _chunk_impl

        model = self.model
        hyper = {
            "lu": model.lu,
            "li": model.li,
            "lj": model.lj,
            "lb": model.lb,
            "le": model.le,
            "lr": model.lr,
        }
        cb, ct = self._shard_hooks()
        param_shardings = self._param_shardings()
        repl = NamedSharding(self.mesh, P())
        feat = self.feat
        chunk = partial(
            _chunk_impl,
            hyper=hyper,
            batch_size=self.batch_size,
            n_items=model.n_items,
            k_candidates=model.k_candidates,
            n_steps=self.scan_steps,
            mode=model.mode,
            constrain_batch=cb,
            constrain_table=ct,
        )

        def step(params, ms, key, state):
            return chunk(
                params, ms, key, feat,
                state["user_rows"], state["flat_pos"], state["pos_bitmap"],
            )

        return jax.jit(
            step,
            out_shardings=(param_shardings, param_shardings, repl),
            donate_argnums=(0, 1),
        )


def distributed_scores_topk(
    mesh: Mesh,
    U: np.ndarray,
    V: np.ndarray,
    bias: Optional[np.ndarray],
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full-catalog scoring + top-k with a 2D-sharded score grid.

    U rows sharded over "dp", V rows over "mp": each device holds a
    [n_users/dp, n_items/mp] tile of U·Vᵀ; ``lax.top_k`` runs on the full
    row after XLA all-gathers tiles along "mp" (at this k the gather of
    [rows, n_items] scores is the bandwidth-optimal choice; a ring
    partial-top-k merge is the Pallas-kernel variant, ops/topk_pallas.py).
    """
    u_shard = NamedSharding(mesh, P("dp", None))
    v_shard = NamedSharding(mesh, P("mp", None))
    U_d = jax.device_put(jnp.asarray(U), u_shard)
    V_d = jax.device_put(jnp.asarray(V), v_shard)
    b_d = (
        jax.device_put(jnp.asarray(bias).reshape(-1), NamedSharding(mesh, P("mp")))
        if bias is not None
        else None
    )

    @partial(
        jax.jit,
        static_argnames=("kk",),
        out_shardings=(NamedSharding(mesh, P("dp", None)),) * 2,
    )
    def run(U_d, V_d, b_d, kk):
        scores = jnp.dot(U_d, V_d.T, preferred_element_type=jnp.float32)
        if b_d is not None:
            scores = scores + b_d[None, :]
        vals, idx = jax.lax.top_k(scores, kk)
        return vals, idx

    vals, idx = run(U_d, V_d, b_d, k)
    return np.asarray(vals), np.asarray(idx)
