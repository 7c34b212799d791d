"""Distributed training/scoring steps over a (dp, mp) mesh.

TPU-native scaling for the BPR family (greenfield vs the single-device
reference — SURVEY.md §2.4): embedding tables row-sharded over the "mp"
axis (NamedSharding P('mp', None)), triplet batches sharded over "dp",
jit-compiled with explicit in/out shardings so XLA GSPMD inserts the
collectives (gathers across table shards, psum of replicated-parameter
gradients) over ICI. This is the scaling-book recipe: pick a mesh,
annotate shardings, let XLA place collectives.

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

from ..data.dataset import Interactions
from ..models.bpr import BPR
from .mesh import BPR_PARAM_SPECS, replicate, shard_params


class DistributedBPRTrainer:
    """Runs BPR SGD with tables row-sharded over "mp", batch over "dp"."""

    def __init__(
        self,
        model: BPR,
        mesh: Mesh,
        batch_size: int = 4096,
        scan_steps: int = 8,
    ):
        assert model.inter is not None, "load data before distributing"
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        self.scan_steps = scan_steps
        if model._params is None:
            model._init_params(jax.random.PRNGKey(model.seed))
        self.params = shard_params(mesh, model._params, BPR_PARAM_SPECS)
        self.ms = shard_params(mesh, model._ms, BPR_PARAM_SPECS)
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

    def _build_step(self):
        mesh = self.mesh
        model = self.model
        hyper = {
            "lu": model.lu,
            "li": model.li,
            "lj": model.lj,
            "lb": model.lb,
            "lr": model.lr,
        }
        batch_size = self.batch_size
        n_items = model.n_items
        k_cand = model.k_candidates
        mode = model.mode
        n_steps = self.scan_steps

        from ..ops.sampling import _sample_triplets
        from ..ops.sparse_update import plan_sparse_updates, planned_rmsprop

        param_shardings = {
            name: NamedSharding(mesh, spec)
            for name, spec in BPR_PARAM_SPECS.items()
        }
        repl = NamedSharding(mesh, P())

        def chunk(params, ms, key, state):
            k = params["ue"].shape[1]

            def loss_fn(pu, pit, pjt):
                pi, bi = pit[:, :k], pit[:, k]
                pj, bj = pjt[:, :k], pjt[:, k]
                x = bi - bj + jnp.sum(pu * (pi - pj), axis=1)
                nll = jnp.sum(jnp.logaddexp(0.0, -x))
                if mode == "l2":
                    reg = 0.5 * (
                        jnp.sum(pu**2) * hyper["lu"]
                        + jnp.sum(pi**2) * hyper["li"]
                        + jnp.sum(pj**2) * hyper["lj"]
                    ) + 0.5 * hyper["lb"] * (jnp.sum(bi**2) + jnp.sum(bj**2))
                else:
                    reg = (
                        jnp.sum(jnp.abs(pu)) * hyper["lu"]
                        + jnp.sum(jnp.abs(pi)) * hyper["li"]
                        + jnp.sum(jnp.abs(pj)) * hyper["lj"]
                        + hyper["lb"]
                        * (jnp.sum(jnp.abs(bi)) + jnp.sum(jnp.abs(bj)))
                    )
                return nll + reg

            # whole-chunk sampling (matches the single-chip chunk exactly)
            u_all, i_all, j_all = _sample_triplets(
                key,
                state["user_rows"],
                state["flat_pos"],
                state["pos_bitmap"],
                n_steps * batch_size,
                n_items,
                k_cand,
            )
            dp = NamedSharding(mesh, P(None, "dp"))
            u_steps = jax.lax.with_sharding_constraint(
                u_all.reshape(n_steps, batch_size), dp
            )
            i_steps = jax.lax.with_sharding_constraint(
                i_all.reshape(n_steps, batch_size), dp
            )
            j_steps = jax.lax.with_sharding_constraint(
                j_all.reshape(n_steps, batch_size), dp
            )
            # chunk-planned duplicate aggregation (see models/bpr.py) —
            # the plan tensors follow the batch's dp sharding
            uniq_u, seg_u = plan_sparse_updates(u_steps)
            uniq_ij, seg_ij = plan_sparse_updates(
                jnp.concatenate([i_steps, j_steps], axis=1)
            )
            xs = (u_steps, i_steps, j_steps, uniq_u, seg_u, uniq_ij, seg_ij)

            iet = jnp.concatenate(
                [params["ie"], params["ib"][:, None]], axis=1
            )
            mst = jnp.concatenate([ms["ie"], ms["ib"][:, None]], axis=1)
            iet_shard = NamedSharding(mesh, P("mp", None))
            ue_shard = param_shardings["ue"]

            def step(carry, xs):
                ue, iet, ms_u, ms_it = carry
                u, i, j, uq_u, sg_u, uq_ij, sg_ij = xs
                pu = ue[u]
                pit = iet[i]
                pjt = iet[j]
                loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                    pu, pit, pjt
                )
                g_ij = jnp.concatenate([grads[1], grads[2]], axis=0)
                ue, ms_u = planned_rmsprop(
                    ue, ms_u, uq_u, sg_u, grads[0], hyper["lr"]
                )
                iet, ms_it = planned_rmsprop(
                    iet, ms_it, uq_ij, sg_ij, g_ij, hyper["lr"]
                )
                ue = jax.lax.with_sharding_constraint(ue, ue_shard)
                iet = jax.lax.with_sharding_constraint(iet, iet_shard)
                return (ue, iet, ms_u, ms_it), loss

            (ue, iet, ms_u, ms_it), losses = jax.lax.scan(
                step, (params["ue"], iet, ms["ue"], mst), xs
            )
            params = {"ue": ue, "ie": iet[:, :k], "ib": iet[:, k]}
            ms = {"ue": ms_u, "ie": ms_it[:, :k], "ib": ms_it[:, k]}
            return params, ms, jnp.sum(losses)

        return jax.jit(
            chunk,
            out_shardings=(param_shardings, param_shardings, repl),
            donate_argnums=(0, 1),
        )

    def train_chunk(self, key: jax.Array) -> float:
        self.params, self.ms, loss = self._step(
            self.params, self.ms, key, self.sampler_state
        )
        return float(loss)

    def sync_to_model(self) -> None:
        """Pull sharded tables back into the host-side model state."""
        self.model._params = {
            name: jnp.asarray(np.asarray(v)) for name, v in self.params.items()
        }
        self.model._ms = {
            name: jnp.asarray(np.asarray(v)) for name, v in self.ms.items()
        }
        self.model._sync_host()


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
    repl = NamedSharding(mesh, P())
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
