"""Worker for the two-process CPU-mesh test (tests/test_multiprocess.py).

Each process contributes 2 virtual CPU devices; after
``jax.distributed.initialize`` the global mesh has 4 devices spanning both
processes, and the distributed trainers / fused ALS sweep run on it with
Gloo collectives over localhost — the CPU stand-in for a 2-host TPU slice
(SURVEY.md §4 multi-host test strategy).

Prints one machine-readable RESULT line; the parent test asserts both
processes agree (SPMD programs must be deterministic across hosts).
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from topk_rec_tpu.parallel.distributed import (
        fetch,
        initialize,
        is_multiprocess,
    )

    initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2 * nproc
    assert is_multiprocess()

    import jax.numpy as jnp
    import numpy as np

    from topk_rec_tpu.data.dataset import synthetic_interactions
    from topk_rec_tpu.models import BPR
    from topk_rec_tpu.ops.als import ALSPlan
    from topk_rec_tpu.parallel import (
        DistributedALS,
        DistributedBPRTrainer,
        make_mesh,
    )

    mesh = make_mesh(dp=2, mp=2)  # spans both processes
    inter = synthetic_interactions(n_users=64, n_items=48, n_pos=600, seed=5)
    model = BPR(k=8, lr=0.05, seed=1)
    model.set_interactions(inter)
    trainer = DistributedBPRTrainer(model, mesh, batch_size=32, scan_steps=4)
    loss = trainer.train_chunk(jax.random.PRNGKey(7))
    trainer.sync_to_model()
    ue_sum = float(np.abs(model.fue).sum())

    indptr, flat = inter.user_csr
    plan = ALSPlan(indptr, flat, inter.n_users, block_size=16)
    new_u, fit = DistributedALS(mesh).half_sweep(
        plan,
        model.fue,
        model.fie,
        jnp.asarray(inter.rated_items),
        1.0,
        0.01,
        0.05,
    )
    assert np.isfinite(new_u).all()

    # full mesh-routed WMF training across the two processes (the ALS
    # model family on a multi-host mesh, ref old/cr/cr.cpp:146-216)
    from topk_rec_tpu.models import WMF

    wmf = WMF(k=6, seed=2, mesh=mesh, block_size=16)
    wmf.set_interactions(inter)
    wmf.train(max_iter=2, verbose=False)
    assert np.isfinite(wmf.fue).all() and np.isfinite(wmf.fie).all()
    wmf_sum = float(np.abs(wmf.fie).sum())
    # exercise fetch() on a deliberately cross-host-sharded array
    from jax.sharding import NamedSharding, PartitionSpec as P

    garr = jax.device_put(
        jnp.arange(8.0 * 3).reshape(8, 3),
        NamedSharding(mesh, P(("dp", "mp"), None)),
    )
    assert not garr.is_fully_addressable
    back = fetch(garr)
    np.testing.assert_array_equal(back, np.arange(24.0).reshape(8, 3))

    print(
        f"RESULT {pid} {loss:.6f} {ue_sum:.6f} {fit:.6f} {wmf_sum:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
