"""Pallas TPU kernel: fused U·Vᵀ scoring + seen-mask + streaming top-k.

The serving/eval hot path of the framework (the reference's analog is the
full ``np.argsort`` over a materialized score matrix, evaluate.py:78-81).
At MovieLens scale a [8192-user chunk × 8305 candidates] fp32 score matrix
is 272 MB; XLA's unfused pipeline writes it to HBM, reads it back for
top_k, and its top_k lowering alone costs ~13 ms/chunk on v5e. This kernel
keeps each score tile in VMEM, applies the seen-item mask in-register, and
maintains a running top-k buffer across item tiles — the score matrix never
touches HBM.

Selection: ``lax.top_k``/``sort`` have no Mosaic lowering, so the kernel
does k rounds of (max → first-argmax via lane-iota min → one-hot extract →
mask-out) over [run_buffer ‖ score_tile]. That is O(k·TI) VPU work per
tile — at k≈32 roughly one-third of the matmul's MXU work, i.e. still
matmul/HBM-bound overall, and ~an order of magnitude cheaper than the
unfused XLA path.

Grid: (user_tiles, item_tiles), item axis minor; the running buffers live
in VMEM scratch and persist across the item-tile sweep (TPU grids execute
sequentially), with init on the first tile and output write on the last —
the standard Pallas accumulator pattern.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)

_RUN_LANES = 128  # lane-aligned running-buffer width; k must be <= this


def _kernel(
    u_ref, v_ref, b_ref, m_ref, out_v_ref, out_i_ref, run_v, run_i,
    *, k: int, exact_matmul: bool,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_v[:] = jnp.full(run_v.shape, NEG_INF, jnp.float32)
        run_i[:] = jnp.zeros(run_i.shape, jnp.int32)

    tu, ti = u_ref.shape[0], v_ref.shape[0]
    # HIGHEST = true-fp32 matmul (multi-pass on the MXU) for eval-protocol
    # exactness; DEFAULT = bf16-input passes for the serving path.
    precision = (
        jax.lax.Precision.HIGHEST if exact_matmul else jax.lax.Precision.DEFAULT
    )
    scores = jnp.dot(
        u_ref[:], v_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    scores = scores + b_ref[:]
    # seen/padding mask: nonzero -> excluded
    scores = jnp.where(m_ref[:] != 0, NEG_INF, scores)

    item_base = j * ti
    lane = jax.lax.broadcasted_iota(jnp.int32, (tu, ti), 1)
    comb_v0 = jnp.concatenate([run_v[:], scores], axis=1)
    comb_i = jnp.concatenate([run_i[:], item_base + lane], axis=1)
    width = _RUN_LANES + ti
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (tu, width), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (tu, _RUN_LANES), 1)

    def select_one(kk, carry):
        comb_v, new_v, new_i = carry
        m = jnp.max(comb_v, axis=1, keepdims=True)
        # first position achieving the max (ties resolved to lowest index)
        pos = jnp.min(
            jnp.where(comb_v == m, lane_c, width), axis=1, keepdims=True
        )
        sel = lane_c == pos
        ci = jnp.sum(jnp.where(sel, comb_i, 0), axis=1, keepdims=True)
        put = out_lane == kk
        new_v = jnp.where(put, m, new_v)
        new_i = jnp.where(put, ci, new_i)
        comb_v = jnp.where(sel, NEG_INF, comb_v)
        return comb_v, new_v, new_i

    _, new_v, new_i = jax.lax.fori_loop(
        0,
        k,
        select_one,
        (
            comb_v0,
            jnp.full((tu, _RUN_LANES), NEG_INF, jnp.float32),
            jnp.zeros((tu, _RUN_LANES), jnp.int32),
        ),
    )
    run_v[:] = new_v
    run_i[:] = new_i

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        out_v_ref[:] = run_v[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_u", "block_i", "interpret", "exact_matmul"),
)
def _fused_call(U, V, bias, mask, k, block_u, block_i, interpret, exact_matmul):
    n_u, d = U.shape
    n_i = V.shape[0]
    grid = (n_u // block_u, n_i // block_i)
    out_v, out_i = pl.pallas_call(
        functools.partial(_kernel, k=k, exact_matmul=exact_matmul),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_u, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, block_i), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_u, _RUN_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, _RUN_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_u, _RUN_LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_u, _RUN_LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_u, _RUN_LANES), jnp.float32),
            pltpu.VMEM((block_u, _RUN_LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_u * n_i * d + 8 * k * n_u * n_i,
            bytes_accessed=4 * (n_u * d + n_i * d + n_u * n_i // 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(U, V, bias, mask)
    return out_v[:, :k], out_i[:, :k]


def fused_score_topk(
    U: jax.Array,
    V: jax.Array,
    bias: Optional[jax.Array],
    mask: jax.Array,
    k: int,
    block_u: int = 256,
    block_i: int = 2048,
    interpret: Optional[bool] = None,
    exact_matmul: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k (values, indices) of masked U·Vᵀ + bias, fused in one kernel.

    Args:
      U: [n_users, d] float32 user embeddings.
      V: [n_cand, d] float32 candidate embeddings.
      bias: optional [n_cand] float32 additive item bias.
      mask: [n_users, n_cand] int8/bool — nonzero entries are excluded
        (seen items; also used internally for padding columns).
      k: number of results per user (<= 128).
      interpret: run in the Pallas interpreter (CPU tests).

    Inputs are padded internally to tile multiples; indices returned are
    into the unpadded candidate axis. Excluded/overflow positions come back
    with value ``float32.min``.
    """
    assert 1 <= k <= _RUN_LANES
    if interpret is None:
        # no Mosaic on CPU — fall back to the interpreter (tests)
        interpret = jax.default_backend() == "cpu"
    n_u, d = U.shape
    n_i = V.shape[0]
    pu = (-n_u) % block_u
    # keep the last dim lane-aligned as well
    pi = (-n_i) % block_i
    pd = (-d) % 128
    U_p = jnp.pad(U.astype(jnp.float32), ((0, pu), (0, pd)))
    V_p = jnp.pad(V.astype(jnp.float32), ((0, pi), (0, pd)))
    b = (
        jnp.pad(bias.astype(jnp.float32).reshape(-1), (0, pi))
        if bias is not None
        else jnp.zeros(n_i + pi, jnp.float32)
    ).reshape(1, -1)
    mask_p = jnp.pad(
        mask.astype(jnp.int8), ((0, pu), (0, pi)), constant_values=1
    )
    vals, idx = _fused_call(
        U_p, V_p, b, mask_p, k, block_u, block_i, interpret, exact_matmul
    )
    return vals[:n_u], idx[:n_u]


def expand_seen_mask(
    packed: jax.Array, n_cand: int
) -> jax.Array:
    """Unpack a uint32 bitmap [rows, ceil(n_cand/32)] into int8 [rows, n_cand].

    Pure dense ops (repeat + shift) — no gathers, unlike indexing the bitmap
    per candidate, which is the slow path XLA generates for
    ``bitmap[:, cand >> 5]``-style lookups.
    """
    rows, words = packed.shape
    rep = jnp.repeat(packed, 32, axis=1)  # word w -> lanes [32w, 32w+32)
    shift = (
        jax.lax.broadcasted_iota(jnp.uint32, (1, words * 32), 1) % 32
    )
    bits = (rep >> shift) & jnp.uint32(1)
    return bits[:, :n_cand].astype(jnp.int8)


def pack_candidate_bitmap(
    seen_bitmap: np.ndarray, cand_item_ids: np.ndarray
) -> np.ndarray:
    """Re-pack the full-item-space seen bitmap into candidate space.

    Host-side, once per (fold, scenario): out bit c of user u =
    seen_bitmap bit ``cand_item_ids[c]``. This moves the random-access
    gather off the device hot path entirely.
    """
    cand = np.asarray(cand_item_ids, dtype=np.int64)
    bits = (
        seen_bitmap[:, cand >> 5] >> (cand & 31).astype(np.uint32)
    ) & 1  # [n_users, n_cand] uint32 0/1
    n_cand = cand.shape[0]
    n_words = (n_cand + 31) // 32
    pad = n_words * 32 - n_cand
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(bits.shape[0], n_words, 32).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (bits << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)
