"""Exact top-k via exactness-repaired `approx_max_k` (hybrid path).

TPU has no sort unit: exact top-k is iterative max-extraction on the VPU,
which is the measured wall for every exact variant of the serving shape
(BASELINE.md "Scoring / top-k speed-of-light"). But the hardware DOES have
a fast approximate selector: ``jax.lax.approx_max_k`` (partial per-bin
reduction, arXiv:2206.14286) measured 22 ms vs 25.4 ms for the best exact
Pallas kernel (v3) at 69878x10380. This module makes the approx path EXACT:

  pass A  ``approx_max_k(scores, k+Δ)`` — oversampled approximate top-k';
  pass B  a tiny fused Pallas kernel recomputes the scores tile-by-tile
          (never materializing them) and counts, per row,
          #{score > t} and #{score == t} where t is the k-th best returned
          value — HBM traffic is just the int8 seen-mask (~0.9 ms SOL);
  pass C  rows whose counts prove the approx answer incomplete (or tie-
          ambiguous) are re-ranked exactly by full ``lax.top_k`` in
          bounded-capacity rounds inside the same jit (a while_loop, so a
          pathological batch still returns exact results, never asserts).

Correctness invariant (value-exactness): let A = the k best returned
candidates, t = min(A), eps = 1e-4·|t| + 1e-6, gA = #{a∈A : a > t+eps}.
If the global counts satisfy  cnt_gt == gA  and  cnt_eq == k - gA
(with cnt_gt counting scores > t+eps and cnt_eq counting scores within
±eps of t), then every element above t+eps and every element within the
margin is in A, and everything outside A scores below t−eps — so A is
the true top-k multiset. The ±eps margin makes the audit robust to
matmul accumulation-order divergence between the Pallas count kernel
and the XLA rescore that produced t (reorder noise ~1e-5·|s|): a false
pass would need the two scores of one element to diverge by more than
eps, while near-threshold rows merely repair conservatively. Rows
failing either test — including every row with fewer than k unseen
items, where t collapses to the mask fill value — re-rank exactly in
pass C. Index order matches ``lax.top_k`` (value desc, index asc among
ties) via a two-key sort.

The reference analog is the full np.argsort of the materialized score
matrix (reference evaluate.py:78-81).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk_pallas import NEG_INF

_LANES = 128


def _count_kernel(
    u_ref, v_ref, b_ref, m_ref, t_ref, gt_ref, eq_ref, acc_gt, acc_eq,
    *, exact_matmul: bool,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_gt[:] = jnp.zeros(acc_gt.shape, jnp.int32)
        acc_eq[:] = jnp.zeros(acc_eq.shape, jnp.int32)

    precision = (
        jax.lax.Precision.HIGHEST if exact_matmul
        else jax.lax.Precision.DEFAULT
    )
    scores = jnp.dot(
        u_ref[:], v_ref[:].T,
        preferred_element_type=jnp.float32, precision=precision,
    )
    scores = scores + b_ref[:]
    scores = jnp.where(m_ref[:] != 0, NEG_INF, scores)
    t = t_ref[:][:, :1]  # [tu, 1] broadcast column
    # margin-tolerant classification: this kernel's per-tile matmul may
    # accumulate in a different order than the XLA rescore that produced
    # t (reorder noise ~ d·ulp·|s| ≈ 1e-5·|s|); a strict >/== audit
    # could then false-pass a missed element whose scores straddle t.
    # Elements within ±eps of t count as ties — divergence would need to
    # exceed eps (orders of magnitude above reorder noise) to escape both
    # classes, and extra near-threshold repairs are merely conservative.
    # eps scales with max(|t|, |s|) per ELEMENT (not |t| alone): reorder
    # noise follows the element's own magnitude, and a large score
    # landing near a small threshold must still be margin-classified
    # (ADVICE r3). Residual caveat: noise really scales with Σ|u_d·v_d|,
    # so a score that is small only through cancellation of large terms
    # carries more noise than eps models — bounding that exactly would
    # need a second |U|·|V|ᵀ matmul; with exact_matmul=True (the eval
    # default) the kernel and rescore agree to the last bit and the
    # margin is moot.
    eps = 1e-4 * jnp.maximum(jnp.abs(t), jnp.abs(scores)) + 1e-6
    gt = jnp.sum((scores > t + eps).astype(jnp.int32), axis=1, keepdims=True)
    eq = jnp.sum(
        (jnp.abs(scores - t) <= eps).astype(jnp.int32), axis=1, keepdims=True
    )
    acc_gt[:] += jnp.broadcast_to(gt, acc_gt.shape)
    acc_eq[:] += jnp.broadcast_to(eq, acc_eq.shape)

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        gt_ref[:] = acc_gt[:]
        eq_ref[:] = acc_eq[:]


def _count_vs_threshold(
    U, V, bias_row, mask, t, block_u, block_i, interpret, exact_matmul
):
    """Per-row (#{score > t}, #{score == t}) without materializing scores.

    U/V pre-padded to tile multiples; bias_row [1, n_i]; mask int8
    [n_u, n_i] (padding columns masked); t float32 [n_u].
    """
    n_u, d = U.shape
    n_i = V.shape[0]
    grid = (n_u // block_u, n_i // block_i)
    t_col = jnp.broadcast_to(t[:, None], (n_u, _LANES))
    gt, eq = pl.pallas_call(
        functools.partial(_count_kernel, exact_matmul=exact_matmul),
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
            pl.BlockSpec((block_u, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_u, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_u, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_u, _LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_u, _LANES), jnp.int32),
            pltpu.VMEM((block_u, _LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_u * n_i * d + 4 * n_u * n_i,
            bytes_accessed=n_u * n_i + 4 * (n_u + n_i) * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(U, V, bias_row, mask, t_col)
    return gt[:, 0], eq[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_extra", "cap", "recall", "block_u", "block_i",
        "interpret", "exact_matmul", "n_real",
    ),
)
def _hybrid_call(
    U, V, bias_row, mask, k, k_extra, cap, recall, block_u, block_i,
    interpret, exact_matmul, n_real,
):
    n_u, d = U.shape
    n_i = V.shape[0]
    precision = (
        jax.lax.Precision.HIGHEST if exact_matmul
        else jax.lax.Precision.DEFAULT
    )

    def rescore(rows_u, rows_mask):
        s = jnp.dot(
            rows_u, V.T,
            preferred_element_type=jnp.float32, precision=precision,
        ) + bias_row
        return jnp.where(rows_mask != 0, NEG_INF, s)

    # ---- pass A: oversampled approximate top-(k+Δ) ----
    kp = min(k + k_extra, n_i)
    v0, i0 = jax.lax.approx_max_k(
        rescore(U, mask), kp, recall_target=recall
    )
    # lax.top_k tie order = value desc, index asc: two-key sort
    ord_nv, ord_i = jax.lax.sort((-v0, i0), num_keys=2)
    vals = -ord_nv[:, :k]
    idx = ord_i[:, :k]
    t = vals[:, k - 1]

    # ---- pass B: exactness audit (fused count, no score materialization)
    cnt_gt, cnt_eq = _count_vs_threshold(
        U, V, bias_row, mask, t, block_u, block_i, interpret, exact_matmul
    )
    # same ±eps classification as the count kernel (see _count_kernel):
    # elementwise max(|t|, |val|) scaling keeps both sides of the audit
    # consistent
    eps = 1e-4 * jnp.maximum(jnp.abs(t)[:, None], jnp.abs(vals)) + 1e-6
    g_have = jnp.sum(
        (vals > t[:, None] + eps).astype(jnp.int32), axis=1
    )
    bad = (cnt_gt != g_have) | (cnt_eq != k - g_have)
    # user-padding rows are all-masked and would trip the tie audit;
    # they carry no real data, so never burn repair rounds on them
    bad = bad & (jnp.arange(n_u) < n_real)

    # ---- pass C: bounded exact re-rank of failing rows ----
    n_bad = jnp.sum(bad.astype(jnp.int32))
    order = jnp.nonzero(bad, size=n_u, fill_value=0)[0]
    pad_rows = (-n_u) % cap
    order = jnp.pad(order, (0, pad_rows))

    def body(state):
        r, vals, idx = state
        rows = jax.lax.dynamic_slice(order, (r * cap,), (cap,))
        # live keyed on bad[rows], NOT slot position: the nonzero padding
        # slots carry row 0, and a duplicate-index .set is
        # order-undefined — if row 0 is genuinely bad, a position-keyed
        # mask would have dead slots re-writing row 0's STALE pre-repair
        # values while the live slot writes the exact ones. Keyed on
        # bad[rows], every duplicate write for row 0 carries the
        # identical exact result (fv/fi are deterministic), so any
        # scatter order yields the repaired values. (Same pattern as
        # topk_pallas._fused_call's suspect scatter.)
        live = bad[rows][:, None]
        fv, fi = jax.lax.top_k(rescore(U[rows], mask[rows]), k)
        vals = vals.at[rows].set(jnp.where(live, fv, vals[rows]))
        idx = idx.at[rows].set(jnp.where(live, fi, idx[rows]))
        return r + 1, vals, idx

    n_rounds = (n_bad + cap - 1) // cap
    _, vals, idx = jax.lax.while_loop(
        lambda st: st[0] < n_rounds, body, (jnp.int32(0), vals, idx)
    )
    return vals, idx, n_bad


def exact_topk_hybrid(
    U: jax.Array,
    V: jax.Array,
    bias: Optional[jax.Array],
    mask: jax.Array,
    k: int,
    k_extra: int = 20,
    cap: int = 2048,
    recall: float = 0.95,
    block_u: int = 256,
    block_i: int = 4096,
    interpret: Optional[bool] = None,
    exact_matmul: bool = True,
    with_stats: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k (values, indices) of masked U·Vᵀ + bias.

    Semantics identical to ``lax.top_k`` over the masked score matrix
    (ties resolved value-desc / index-asc); excluded positions come back
    with value ``float32.min``. See module docstring for the three-pass
    construction. ``with_stats`` additionally returns the number of
    repaired rows (diagnostics / tuning).
    """
    assert 1 <= k
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_u, d = U.shape
    n_i = V.shape[0]
    pu = (-n_u) % block_u
    pi = (-n_i) % block_i
    pd = (-d) % _LANES
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
    vals, idx, n_bad = _hybrid_call(
        U_p, V_p, b, mask_p, k, k_extra, cap, recall, block_u, block_i,
        interpret, exact_matmul, n_u,
    )
    vals, idx = vals[:n_u], idx[:n_u]
    if with_stats:
        return vals, idx, n_bad
    return vals, idx
