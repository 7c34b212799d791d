"""Pallas TPU kernel: fused U·Vᵀ scoring + seen-mask + streaming top-k.

The serving/eval hot path of the framework (the reference's analog is the
full ``np.argsort`` over a materialized score matrix, evaluate.py:78-81).
At MovieLens scale a [8192-user chunk × 8305 candidates] fp32 score matrix
is 272 MB; XLA's unfused pipeline writes it to HBM, reads it back for
top_k, and its top_k sort alone costs ~70 ms over the full catalog on
v5e. This kernel keeps each score tile in VMEM, applies the seen-item
mask in-register, and maintains a running top-k buffer across item tiles —
the score matrix never touches HBM.

Selection (v3 — group-visibility, deferred extraction): ``lax.top_k``/
``sort`` have no Mosaic lowering, so selection is iterative
max-extraction; the v1 kernel's k rounds over the full tile were
VPU-bound (~95 ms measured: 30 rounds x 4 vector passes x 2176 lanes).
v2 first reduced each tile to per-group TOP-2 candidates — groups are
lane-strided across the tile's 128-wide chunks (group j = lanes
{j, j+128, j+256, …}), so every reduction step is a contiguous 128-lane
slice, which Mosaic vectorizes natively (adjacent-lane reshapes/strided
slices do NOT lower) — then ran k extraction rounds per item tile over
[run ‖ m1 ‖ m2] = 384 lanes. v3 deepens the groups to TOP-3 and APPENDS
each tile's candidates to a [tu, 3·128·n_tiles] scratch buffer, running
the k extraction rounds ONCE at the last tile: rounds dominate the
kernel (measured 0.27 ms/round vs a 14.3 ms everything-else floor,
benchmarks/probe_topk_pieces.py), so one sweep over the merged buffer
beats a sweep per tile; and depth-3 visibility shrinks the suspect rate
(below) ~70x, which shrinks the XLA-side re-rank — formerly ~15 ms of
the total — to noise. v4 attacks the two remaining cost centers:
(a) the group stats become a SINGLE-PASS running top-3+m4 cascade
(~15 VPU ops per score element vs v3's four sequential masked sweeps +
position-resolve passes at ~28) — each element is inserted once into a
sorted (m1..m3, col1..col3) register set and the final displaced value
feeds m4; (b) before the extraction rounds, a depth-4 lane cascade
REGROUPS the merged buffer from 3·128·n_tiles lanes to 512, with the
max displaced value (m5) joining the exactness trigger (see
_REGROUP_DEPTH for the collision math that picks depth 4 and caps k).

Top-3 visibility is exact unless one group contributes ≥4 of a row's
top-k (and regroup visibility unless one lane class contributes ≥5).
Both events are DETECTED exactly: the kernel tracks the row-max of every
group's 4th-best value (run_m4) and the regroup's displaced maximum
(m5); a row is suspect iff either ≥ its k-th selected value (an
invisible element could outrank the returned k-th). Suspect rows
(≈0.1% combined for random placement at k=30; ties also trigger) are
re-ranked exactly by a bounded XLA fallback inside the same jit; if
suspects overflow the fallback capacity, the whole batch falls back to
full ``lax.top_k``. Results therefore always equal lax.top_k's (ties
included, via the ≥ trigger).

Measured on v5e at 69878x10380xd50, k=30 (bf16 matmul): v1 ~95 ms
(VPU-bound full-width rounds), v2 38.5-53 ms (per-tile extraction +
depth-2 trigger), v3 25.4-25.6 ms, v4 20.2-20.4 ms steady-state =
35.5-35.9G scored pairs/s (burned-first-block timing, BASELINE.md) —
with the score matrix never touching HBM at any version. v4
decomposition: ~12.5-13 ms floor (matmul + mask + cascade + regroup) +
~0.24 ms per extraction round; the rounds are cross-lane-reduction
bound, and the measured alternative of emitting the candidate buffers
for an XLA-side lax.top_k (``extract="xla"``) loses 3x at k=30
(BASELINE.md scoring section). A single-reduction packed-word round
formulation (monotonic score bits | index bits in one int32) was also
built, proved exact, measured, and REJECTED in round 5 — the score-
field quantization it needs to carry an index collides at the k-th
boundary on up to 49.7% of rows, and recovering exact values outside
the kernel breaks bf16-mode value identity (full receipts: BASELINE.md
"Packed-word extraction rounds: NEGATIVE RESULT").

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
_CHUNK = 128      # group-stat chunk width (contiguous lane slices)


def _top_insert(m, g, v, gv):
    """One level of the running top-cascade: insert (v, gv) into slot (m, g).

    Returns (new_m, new_g, displaced_v, displaced_gv). Strict ``>`` keeps
    the incumbent on value ties, so earlier-inserted (lower item column)
    cells stay at higher levels — tie ORDER between levels is immaterial
    downstream (the extraction picks min-index among value-ties over the
    whole buffer), only membership is, and ties crossing the visibility
    boundary fire the m4/m5 suspect trigger.
    5 VPU ops: cmp + max + min + 2 selects.
    """
    gt = v > m
    new_m = jnp.maximum(v, m)
    disp_v = jnp.minimum(v, m)
    new_g = jnp.where(gt, gv, g)
    disp_g = jnp.where(gt, g, gv)
    return new_m, new_g, disp_v, disp_g


# Regroup the merged candidate buffer to this many 128-lane levels before
# the extraction rounds (see _extract). Only safe for small k: a row needs
# >= REGROUP_DEPTH+1 of its top-k in one lane class (col mod 128) to
# become invisible, which the m5 trigger detects; the quintuple-collision
# rate C(k,5)/128^4 is 0.05% at k=30 but 2.8% at k=64 (over the default
# repair capacity), so larger k skips the regroup.
_REGROUP_DEPTH = 4
_REGROUP_MAX_K = 48


def _kernel(
    u_ref, v_ref, b_ref, m_ref, out_v_ref, out_i_ref, out_trig_ref,
    cand_v, cand_i, run_m4,
    *, k: int, exact_matmul: bool, emit_buffers: bool = False,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        run_m4[:] = jnp.full(run_m4.shape, NEG_INF, jnp.float32)

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

    # ---- per-group running top-3 (+m4 trigger) over C lane-strided
    # chunks (v4) ----
    # v3 computed m1->m2->m3->m4 as four SEQUENTIAL masked sweeps plus
    # position-resolve passes (~28 VPU ops per score element); v4 inserts
    # each chunk once into a sorted (m1..m3, gcol1..gcol3) register set —
    # a compare/select cascade of ~15 ops per element, touching each
    # score exactly once. m4 (the best value invisible beyond the
    # per-group top-3) falls out of the cascade as the final displaced
    # value; it remains the exactness trigger: a row is suspect iff
    # m4 >= its k-th selected value (an invisible 4th-in-group element
    # could outrank the returned k-th). Depth 3 keeps the suspect rate at
    # ~0.05% (quadruple collisions over 384 group-cells at k=30) vs ~3.5%
    # at depth 2 — the XLA-side re-rank was ~15 ms before depth 3.
    C = ti // _CHUNK
    item_base = j * ti
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tu, _CHUNK), 1)
    neg = jnp.full((tu, _CHUNK), NEG_INF, jnp.float32)

    def cascade(c_lo, c_hi):
        # running top-3 (+displaced-max m4) over chunks [c_lo, c_hi).
        # dead slots (value NEG_INF) carry an arbitrary in-range column;
        # they can never be selected ahead of a live lane and index-keyed
        # mask-out of a NEG_INF alias is harmless.
        m1 = m2 = m3 = m4 = neg
        g1 = g2 = g3 = lane128
        for c in range(c_lo, c_hi):
            v = scores[:, c * _CHUNK : (c + 1) * _CHUNK]
            gv = item_base + c * _CHUNK + lane128
            m1, g1, v, gv = _top_insert(m1, g1, v, gv)
            m2, g2, v, gv = _top_insert(m2, g2, v, gv)
            # level 3 needs no displaced position: only the displaced
            # VALUE feeds the m4 trigger
            gt = v > m3
            m3n = jnp.maximum(v, m3)
            v = jnp.minimum(v, m3)
            g3 = jnp.where(gt, gv, g3)
            m3 = m3n
            m4 = jnp.maximum(v, m4)
        return m1, g1, m2, g2, m3, g3, m4

    def merge(A, B):
        # exact merge of two cascade states: every global-top-3 element
        # of the union is inside one side's top-3 (at most its own two
        # larger sibling values precede it), so inserting B's three
        # levels into A and folding all displaced values into m4 keeps
        # both the visibility set and the trigger exact.
        m1, g1, m2, g2, m3, g3, m4 = A
        b1, h1, b2, h2, b3, h3, b4 = B
        m4 = jnp.maximum(m4, b4)
        for v, gv in ((b1, h1), (b2, h2), (b3, h3)):
            m1, g1, v, gv = _top_insert(m1, g1, v, gv)
            m2, g2, v, gv = _top_insert(m2, g2, v, gv)
            gt = v > m3
            m3n = jnp.maximum(v, m3)
            v = jnp.minimum(v, m3)
            g3 = jnp.where(gt, gv, g3)
            m3 = m3n
            m4 = jnp.maximum(v, m4)
        return m1, g1, m2, g2, m3, g3, m4

    # v4.1 experiment (kept for narrow user tiles, NEUTRAL at the
    # default): the serial 32-chunk cascade looked dependency-chain
    # stalled (depth-1 sweep costs 0.5 ms where depth-3 costs ~6.5,
    # probe_topk_floor.py), so this splits the sweep into independent
    # sub-cascades merged exactly (a global top-3 element is always
    # inside its sub-range's top-3; displaced values fold into m4).
    # Measured: the extra live states (7 [tu,128] arrays each) blow the
    # 16 MB scoped-VMEM stack at block_u=256 (even split 2), and
    # split4 @ block_u=192 = 21.45 ms vs serial @ 256 = 20.3 ms — the
    # ILP win does not beat the wider tile, so the default stays SERIAL
    # at the default block_u; narrow tiles (<=192 rows), where the live
    # states fit the VMEM stack, use split 4.
    split = min(4 if tu <= 192 else 1, max(1, C // 2))
    bounds = [round(i * C / split) for i in range(split + 1)]
    states = [cascade(bounds[i], bounds[i + 1]) for i in range(split)]
    while len(states) > 1:
        states = [
            merge(states[i], states[i + 1])
            if i + 1 < len(states) else states[i]
            for i in range(0, len(states), 2)
        ]
    m1, g1, m2, g2, m3, g3, m4 = states[0]
    if C > 3:
        row_m4 = jnp.max(m4, axis=1, keepdims=True)
        run_m4[:] = jnp.maximum(run_m4[:], jnp.broadcast_to(row_m4, run_m4.shape))

    # APPEND this tile's per-group top-3 candidates to the scratch
    # buffer instead of merging via per-tile extraction rounds — the k
    # extraction rounds then run ONCE over the merged [tu, 3*128*n_tiles]
    # candidates at the last tile (v2 ran them per item tile; at 3 tiles
    # that tripled the round count, and rounds dominate: measured
    # 0.27 ms/round vs a 14.3 ms everything-else floor, probe_topk_pieces)
    base = j * (3 * _CHUNK)
    cand_v[:, pl.ds(base, _CHUNK)] = m1
    cand_v[:, pl.ds(base + _CHUNK, _CHUNK)] = m2
    cand_v[:, pl.ds(base + 2 * _CHUNK, _CHUNK)] = m3
    cand_i[:, pl.ds(base, _CHUNK)] = g1
    cand_i[:, pl.ds(base + _CHUNK, _CHUNK)] = g2
    cand_i[:, pl.ds(base + 2 * _CHUNK, _CHUNK)] = g3

    @pl.when(j == pl.num_programs(1) - 1)
    def _extract():
        # v4 regroup: run a depth-4 lane cascade over the merged buffer
        # first, narrowing the extraction rounds from 3*128*n_tiles lanes
        # to 512 — rounds carry a per-lane cost, so at 3 tiles this
        # roughly halves their work for a ~20-op/lane regroup. A row is
        # regroup-invisible only if >4 of its top-k share a lane class
        # (item col mod 128); the max displaced value (m5) joins the m4
        # trigger so such rows are re-ranked exactly. NOTE the cheaper
        # depth-2 narrowing (768->256) was tried in round 3 and REJECTED:
        # >= 3-in-one-lane-class collisions hit ~25-35% of rows and
        # tripped the full fallback on most batches (221 ms measured).
        # Depth 4 puts the collision rate back to ~0.05% at k=30.
        W = cand_v.shape[1]
        R = W // _CHUNK
        if k <= _REGROUP_MAX_K and R > _REGROUP_DEPTH:
            neg = jnp.full((tu, _CHUNK), NEG_INF, jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (tu, _CHUNK), 1)

            def rg_cascade(c_lo, c_hi, items):
                r1 = r2 = r3 = r4 = m5 = neg
                h1 = h2 = h3 = h4 = lane
                for v, gv in items[c_lo:c_hi]:
                    r1, h1, v, gv = _top_insert(r1, h1, v, gv)
                    r2, h2, v, gv = _top_insert(r2, h2, v, gv)
                    r3, h3, v, gv = _top_insert(r3, h3, v, gv)
                    gt = v > r4
                    r4n = jnp.maximum(v, r4)
                    v = jnp.minimum(v, r4)
                    h4 = jnp.where(gt, gv, h4)
                    r4 = r4n
                    m5 = jnp.maximum(v, m5)
                return r1, h1, r2, h2, r3, h3, r4, h4, m5

            # split into independent chains + exact merge, as for the
            # tile stats above (global top-4 of the union is within one
            # side's top-4; displaced values fold into the m5 trigger)
            items = [
                (
                    cand_v[:, c * _CHUNK : (c + 1) * _CHUNK],
                    cand_i[:, c * _CHUNK : (c + 1) * _CHUNK],
                )
                for c in range(R)
            ]
            # like the stats split: the second live state only fits the
            # scoped-VMEM stack at narrow user tiles
            sp = 2 if (R >= 6 and tu <= 192) else 1
            rb = [round(i * R / sp) for i in range(sp + 1)]
            rst = [rg_cascade(rb[i], rb[i + 1], items) for i in range(sp)]
            while len(rst) > 1:
                A, B = rst[0], rst[1]
                r1, h1, r2, h2, r3, h3, r4, h4, m5 = A
                m5 = jnp.maximum(m5, B[8])
                for v, gv in ((B[0], B[1]), (B[2], B[3]), (B[4], B[5]),
                              (B[6], B[7])):
                    r1, h1, v, gv = _top_insert(r1, h1, v, gv)
                    r2, h2, v, gv = _top_insert(r2, h2, v, gv)
                    r3, h3, v, gv = _top_insert(r3, h3, v, gv)
                    gt = v > r4
                    r4n = jnp.maximum(v, r4)
                    v = jnp.minimum(v, r4)
                    h4 = jnp.where(gt, gv, h4)
                    r4 = r4n
                    m5 = jnp.maximum(v, m5)
                rst = [(r1, h1, r2, h2, r3, h3, r4, h4, m5)] + rst[2:]
            r1, h1, r2, h2, r3, h3, r4, h4, m5 = rst[0]
            comb_v0 = jnp.concatenate([r1, r2, r3, r4], axis=1)
            comb_i = jnp.concatenate([h1, h2, h3, h4], axis=1)
            row_m5 = jnp.max(m5, axis=1, keepdims=True)
            trig = jnp.maximum(
                run_m4[:], jnp.broadcast_to(row_m5, run_m4.shape)
            )
        else:
            comb_v0 = cand_v[:]
            comb_i = cand_i[:]
            trig = run_m4[:]

        if emit_buffers:
            # extraction-offload variant: ship the (regrouped) candidate
            # buffers to HBM and let XLA's lax.top_k do the selection —
            # the in-kernel rounds are reduction-latency-bound
            # (~0.24 ms/round regardless of width), so for larger k the
            # one-shot XLA sort over the narrow buffer can win. Tie
            # semantics are repaired on the XLA side (see _fused_call).
            out_v_ref[:] = comb_v0[:, : out_v_ref.shape[1]]
            out_i_ref[:] = comb_i[:, : out_i_ref.shape[1]]
            out_trig_ref[:] = trig
            return
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (tu, _RUN_LANES), 1)
        int_max = jnp.int32(2**31 - 1)

        def select_one(kk, carry):
            comb_v, new_v, new_i = carry
            # max, masked-min argmax (lowest item index among ties —
            # matches lax.top_k), index-keyed mask-out
            m = jnp.max(comb_v, axis=1, keepdims=True)
            ci = jnp.min(
                jnp.where(comb_v == m, comb_i, int_max), axis=1,
                keepdims=True,
            )
            put = out_lane == kk
            new_v = jnp.where(put, m, new_v)
            new_i = jnp.where(put, ci, new_i)
            comb_v = jnp.where(comb_i == ci, NEG_INF, comb_v)
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
        out_v_ref[:] = new_v
        out_i_ref[:] = new_i
        out_trig_ref[:] = trig


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_u", "block_i", "interpret", "exact_matmul",
        "suspect_cap", "extract",
    ),
)
def _fused_call(
    U, V, bias, mask, k, block_u, block_i, interpret, exact_matmul,
    suspect_cap=None, extract="kernel",
):
    n_u, d = U.shape
    n_i = V.shape[0]
    grid = (n_u // block_u, n_i // block_i)
    W = 3 * _CHUNK * grid[1]
    regrouped = k <= _REGROUP_MAX_K and W // _CHUNK > _REGROUP_DEPTH
    emit = extract == "xla"
    out_w = (min(W, _REGROUP_DEPTH * _CHUNK) if regrouped else W) if emit \
        else _RUN_LANES
    out_v, out_i, out_trig = pl.pallas_call(
        functools.partial(
            _kernel, k=k, exact_matmul=exact_matmul, emit_buffers=emit
        ),
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
            pl.BlockSpec((block_u, out_w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, out_w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, _RUN_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_u, out_w), jnp.float32),
            jax.ShapeDtypeStruct((n_u, out_w), jnp.int32),
            jax.ShapeDtypeStruct((n_u, _RUN_LANES), jnp.float32),
        ),
        scratch_shapes=[
            # merged candidate buffer: per-group top-3 from every item tile
            pltpu.VMEM((block_u, W), jnp.float32),
            pltpu.VMEM((block_u, W), jnp.int32),
            pltpu.VMEM((block_u, _RUN_LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_u * n_i * d + 12 * n_u * n_i,
            bytes_accessed=4 * (n_u * d + n_i * d + n_u * n_i // 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(U, V, bias, mask)

    if emit:
        # XLA-side selection over the narrow candidate buffer. top_k ties
        # break by BUFFER position here, not by item index — any tie
        # inside the top-(k+1) window could therefore order differently
        # from lax.top_k over the full matrix, so tie-touching rows join
        # the suspect set and are re-ranked exactly (ties are rare for
        # continuous scores; tie-heavy batches hit the full fallback,
        # same as the kernel-extraction path).
        kw = min(k + 1, out_w)
        tv, pos = jax.lax.top_k(out_v, kw)
        ti = jnp.take_along_axis(out_i, pos, axis=1)
        tie_any = jnp.any(tv[:, 1:] == tv[:, :-1], axis=1)
        vals = tv[:, :k]
        idx = ti[:, :k]
        out_trig = jnp.maximum(
            out_trig,
            jnp.where(tie_any, jnp.inf, -jnp.inf)[:, None],
        )
    else:
        vals = out_v[:, :k]
        idx = out_i[:, :k]
    precision = (
        jax.lax.Precision.HIGHEST if exact_matmul else jax.lax.Precision.DEFAULT
    )

    def rescore(rows_u, rows_mask):
        s = jnp.dot(
            rows_u, V.T,
            preferred_element_type=jnp.float32, precision=precision,
        ) + bias
        return jnp.where(rows_mask != 0, NEG_INF, s)

    # exactness patch: rows where an invisible value (4th-in-group at the
    # tile stats, or 5th-in-lane-class at the regroup) could outrank the
    # returned k-th (ties included via >=) are re-ranked by full top_k.
    suspect = out_trig[:, 0] >= vals[:, k - 1]
    n_suspect = jnp.sum(suspect.astype(jnp.int32))
    # depth-3 visibility: quadruple-collision suspects ~0.05% of rows at
    # the serving shape (vs 3.5% at depth 2); the default 1/64 capacity is
    # ~30x that. NOTE the suspect set also contains every tie-touching row
    # and every row with fewer than k unseen items — batches where those
    # exceed the capacity (quantized scores, tiny candidate sets) pay the
    # whole-batch lax.top_k fallback below; callers can widen via
    # ``suspect_cap`` to keep the bounded path (correctness never
    # depends on it).
    cap = suspect_cap if suspect_cap is not None else (
        min(n_u, max(256, ((n_u // 64) + 255) // 256 * 256))
    )
    cap = min(n_u, max(1, cap))
    bad = jnp.nonzero(suspect, size=cap, fill_value=0)[0]
    fv, fi = jax.lax.top_k(rescore(U[bad], mask[bad]), k)
    live = suspect[bad][:, None]
    vals = vals.at[bad].set(jnp.where(live, fv, vals[bad]))
    idx = idx.at[bad].set(jnp.where(live, fi, idx[bad]))

    def full_fallback(_):
        fv, fi = jax.lax.top_k(rescore(U, mask), k)
        return fv, fi

    vals, idx = jax.lax.cond(
        n_suspect > cap, full_fallback, lambda _: (vals, idx), None
    )
    return vals, idx


def fused_score_topk(
    U: jax.Array,
    V: jax.Array,
    bias: Optional[jax.Array],
    mask: jax.Array,
    k: int,
    block_u: int = 256,
    block_i: int = 4096,
    interpret: Optional[bool] = None,
    exact_matmul: bool = True,
    suspect_cap: Optional[int] = None,
    extract: str = "kernel",
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
      suspect_cap: bounded-re-rank row capacity (default n_users/64);
        widen for batches with many ties or near-empty candidate rows to
        avoid the whole-batch fallback (exactness holds either way).
      extract: "kernel" (default) runs the k max-extraction rounds inside
        the kernel; "xla" emits the (regrouped) candidate buffers and
        selects with lax.top_k on the XLA side — ties then join the
        suspect set (see _fused_call). Results are identical; the rounds
        are reduction-latency-bound (~0.24 ms/round), so "xla" can win
        at larger k.

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
    # The v3 merged candidate scratch grows with the item-tile count
    # (2 × [block_u, 3·128·n_tiles] VMEM); past 3 tiles it crowds the
    # 16MB VMEM budget that also holds the score tile (a 4-tile span
    # measured 784KB OVER the scoped-vmem limit on v5e). Larger catalogs
    # are processed in column spans — each span's top-k is exact
    # (including its suspect repair), the global top-k is a subset of
    # the union, and a small XLA top_k over the concatenated
    # [n_u, spans·k] results merges them exactly. Span concat order
    # preserves lax.top_k tie semantics (value desc, index asc): spans
    # are ascending column ranges and within-span ties are index-asc.
    max_span = 3 * block_i
    if n_i > max_span:
        # pad the catalog to a whole number of spans FIRST so every span
        # is the same program shape: a ragged last span adds a second
        # distinct Pallas program to the jit, and the combined
        # 10-full-spans + remainder HLO crashed the TPU compile service
        # at a 131,072-item catalog (measured; 10 uniform spans compile
        # fine). Padded columns carry mask=1 and are never returned.
        pad_cols = (-n_i) % max_span
        if pad_cols:
            V = jnp.pad(V.astype(jnp.float32), ((0, pad_cols), (0, 0)))
            if bias is not None:
                bias = jnp.pad(
                    bias.astype(jnp.float32).reshape(-1), (0, pad_cols)
                )
            mask = jnp.pad(
                mask.astype(jnp.int8), ((0, 0), (0, pad_cols)),
                constant_values=1,
            )
        vs, is_ = [], []
        for start in range(0, n_i + pad_cols, max_span):
            stop = start + max_span
            sv, si = fused_score_topk(
                U, V[start:stop],
                None if bias is None else bias.reshape(-1)[start:stop],
                mask[:, start:stop], k, block_u, block_i, interpret,
                exact_matmul, suspect_cap, extract,
            )
            vs.append(sv)
            is_.append(si + start)
        vals, pos = jax.lax.top_k(jnp.concatenate(vs, axis=1), k)
        idx = jnp.take_along_axis(jnp.concatenate(is_, axis=1), pos, axis=1)
        return vals, idx
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
        U_p, V_p, b, mask_p, k, block_u, block_i, interpret, exact_matmul,
        suspect_cap, extract,
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

    Processed in user-row chunks with ``np.packbits``: a whole-matrix
    formulation materialized several [n_users, n_cand] uint32
    temporaries (~2.3 GB each at MovieLens scale) and took ~33 s; this
    stays in cache and takes ~2 s.
    """
    cand = np.asarray(cand_item_ids, dtype=np.int64)
    n_users = seen_bitmap.shape[0]
    n_cand = cand.shape[0]
    n_words = (n_cand + 31) // 32
    pad = n_words * 32 - n_cand
    word_idx = cand >> 5
    shift = (cand & 31).astype(np.uint32)
    out = np.empty((n_users, n_words), dtype=np.uint32)
    chunk = max(1, (1 << 26) // max(1, n_cand))  # ~256MB working set
    for start in range(0, n_users, chunk):
        stop = min(start + chunk, n_users)
        bits = (
            (seen_bitmap[start:stop, word_idx] >> shift) & 1
        ).astype(np.uint8)
        if pad:
            bits = np.pad(bits, ((0, 0), (0, pad)))
        # little-endian bit pack: bit c of the byte stream = candidate c,
        # so a uint32 little-endian view reproduces the word layout
        packed = np.ascontiguousarray(
            np.packbits(bits, axis=1, bitorder="little")
        )
        out[start:stop] = packed.view("<u4")
    return out
