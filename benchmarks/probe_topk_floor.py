"""Floor probe: what does the fused kernel's NON-selection work cost?

Three kernels at the serving shape (69878x10380xd50, int8 mask):
  A. matmul+bias+mask+row-max only     — the infrastructure floor
  B. A + depth-1 cascade (m1/g1 only)  — cheapest possible stats
  C. the shipped v4 kernel at k=1      — full stats + regroup + 1 round

C-B = depth-2..4 cascade + appends + regroup cost; B-A = minimal stats;
A = matmul + mask read/apply + scores materialization + grid overhead —
the part no selection algorithm can remove (short of an in-kernel packed
bitmap, which Mosaic's lane-reshape limits currently block).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from topk_rec_tpu.ops.topk_pallas import NEG_INF, fused_score_topk

    n_u, n_items, d = 69_878, 10_380, 50
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(n_u, d)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n_items).astype(np.float32))
    mask = jax.jit(
        lambda key: (
            jax.random.uniform(key, (n_u, n_items)) < 0.02
        ).astype(jnp.int8)
    )(jax.random.PRNGKey(0))

    BU, BI, CH = 256, 4096, 128

    def make_kernel(depth1: bool):
        def kern(u_ref, v_ref, b_ref, m_ref, out_ref, acc):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _init():
                acc[:] = jnp.full(acc.shape, NEG_INF, jnp.float32)

            tu, ti = u_ref.shape[0], v_ref.shape[0]
            scores = jnp.dot(
                u_ref[:], v_ref[:].T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            scores = scores + b_ref[:]
            scores = jnp.where(m_ref[:] != 0, NEG_INF, scores)
            C = ti // CH
            if depth1:
                lane = jax.lax.broadcasted_iota(jnp.int32, (tu, CH), 1)
                m1 = jnp.full((tu, CH), NEG_INF, jnp.float32)
                g1 = lane
                for c in range(C):
                    v = scores[:, c * CH : (c + 1) * CH]
                    gv = j * ti + c * CH + lane
                    gt = v > m1
                    m1 = jnp.maximum(v, m1)
                    g1 = jnp.where(gt, gv, g1)
                acc[:] = jnp.maximum(
                    acc[:], m1 + g1.astype(jnp.float32) * 1e-12
                )
            else:
                m1 = scores[:, :CH]
                for c in range(1, C):
                    m1 = jnp.maximum(m1, scores[:, c * CH : (c + 1) * CH])
                acc[:] = jnp.maximum(acc[:], m1)

            @pl.when(j == pl.num_programs(1) - 1)
            def _emit():
                out_ref[:] = acc[:]

        return kern

    def run_variant(depth1):
        pu = (-n_u) % BU
        pi = (-n_items) % BI
        pd = (-d) % 128
        U_p = jnp.pad(U, ((0, pu), (0, pd)))
        V_p = jnp.pad(V, ((0, pi), (0, pd)))
        b_p = jnp.pad(b, (0, pi)).reshape(1, -1)
        m_p = jnp.pad(mask, ((0, pu), (0, pi)), constant_values=1)
        grid = ((n_u + pu) // BU, (n_items + pi) // BI)

        @jax.jit
        def go(U_p, V_p, b_p, m_p):
            out = pl.pallas_call(
                make_kernel(depth1),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((BU, d + pd), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BI, d + pd), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, BI), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BU, BI), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BU, CH), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_u + pu, CH), jnp.float32),
                scratch_shapes=[pltpu.VMEM((BU, CH), jnp.float32)],
            )(U_p, V_p, b_p, m_p)
            # masked slots hold float32.min — finite, but summing 9M of
            # them overflows to -inf; drop them before the checksum
            return jnp.sum(jnp.where(out < -1e30, 0.0, out))

        return go, (U_p, V_p, b_p, m_p)

    def timeit(fn, args, iters=16):
        float(fn(*args))
        float(sum(fn(*args) for _ in range(iters)))
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        acc = float(sum(outs))
        dt = (time.time() - t0) / iters
        assert np.isfinite(acc)
        return dt * 1e3

    goA, argsA = run_variant(depth1=False)
    print(f"A matmul+mask+rowmax      {timeit(goA, argsA):7.2f} ms",
          flush=True)
    goB, argsB = run_variant(depth1=True)
    print(f"B + depth-1 cascade       {timeit(goB, argsB):7.2f} ms",
          flush=True)

    @jax.jit
    def goC(U, V, b, mask):
        v, i = fused_score_topk(U, V, b, mask, 1, exact_matmul=False)
        return jnp.sum(v) + jnp.sum(i)

    def timeitC(iters=16):
        float(goC(U, V, b, mask))
        float(sum(goC(U, V, b, mask) for _ in range(iters)))
        t0 = time.time()
        outs = [goC(U, V, b, mask) for _ in range(iters)]
        acc = float(sum(outs))
        return (time.time() - t0) / iters * 1e3

    print(f"C shipped v4 kernel k=1   {timeitC():7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
