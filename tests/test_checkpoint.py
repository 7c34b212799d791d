"""Native checkpoint manager tests (sharded + fallback paths)."""

import numpy as np
import pytest

from topk_rec_tpu.checkpoint import CheckpointManager


@pytest.fixture()
def tree():
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    return {
        "params": {
            "ue": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
            "ib": jnp.asarray(rng.normal(size=16).astype(np.float32)),
        },
        "step": jnp.asarray(7),
    }


def test_save_restore_roundtrip(tree, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(0, tree, force=True)
    assert mgr.latest_step() == 0
    back = mgr.restore(like=tree)
    np.testing.assert_allclose(
        np.asarray(back["params"]["ue"]), np.asarray(tree["params"]["ue"])
    )
    np.testing.assert_allclose(
        np.asarray(back["params"]["ib"]), np.asarray(tree["params"]["ib"])
    )
    assert int(np.asarray(back["step"])) == 7


def test_save_lag_and_gc(tree, tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, save_every=5)
    assert not mgr.save(1, tree)          # off-cadence
    assert mgr.save(5, tree)
    assert mgr.save(10, tree)
    assert mgr.save(15, tree)
    assert mgr.steps() == [10, 15]        # keep=2 retains newest two
    assert mgr.latest_step() == 15


def test_restore_sharded(tree, tmp_path):
    """Sharded arrays roundtrip with their shardings preserved."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from topk_rec_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, mp=4)
    sharded = {
        "ue": jax.device_put(
            tree["params"]["ue"], NamedSharding(mesh, P("mp", None))
        ),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, sharded, force=True)
    back = mgr.restore(like=sharded)
    np.testing.assert_allclose(
        np.asarray(back["ue"]), np.asarray(sharded["ue"])
    )
    if hasattr(back["ue"], "sharding") and hasattr(
        back["ue"].sharding, "spec"
    ):
        assert back["ue"].sharding.spec == P("mp", None)


def test_bpr_crash_resume_reproduces_uninterrupted_run(small_inter, tmp_path):
    """Train 4 epochs straight vs 2 epochs + resume-for-4: identical
    parameters (per-epoch fold_in keys + full optimizer-state restore)."""
    import jax
    import numpy as np

    from topk_rec_tpu.models import BPR

    def make():
        m = BPR(k=6, lr=0.05, seed=11)
        m.set_interactions(small_inter)
        return m

    straight = make()
    straight.train(epochs=4, batch_size=64, scan_steps=4, verbose=False)

    d = str(tmp_path / "ckpt")
    first = make()
    first.train(epochs=2, batch_size=64, scan_steps=4, verbose=False,
                ckpt_dir=d)
    resumed = make()
    resumed.train(epochs=4, batch_size=64, scan_steps=4, verbose=False,
                  ckpt_dir=d)

    np.testing.assert_allclose(resumed.fue, straight.fue, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed.fie, straight.fie, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        resumed.fib.ravel(), straight.fib.ravel(), rtol=1e-6, atol=1e-7
    )


def test_vbpr_crash_resume_reproduces_uninterrupted_run(small_inter, tmp_path):
    import numpy as np

    from topk_rec_tpu.models import VBPR

    rng = np.random.default_rng(2)
    feat = rng.normal(size=(small_inter.n_items, 10)).astype(np.float32)

    def make():
        m = VBPR(k=6, d=10, lr=0.05, seed=4)
        m.set_interactions(small_inter)
        m.set_features(feat)
        return m

    straight = make()
    straight.train(epochs=3, batch_size=64, scan_steps=4, verbose=False)

    d = str(tmp_path / "vckpt")
    first = make()
    first.train(epochs=1, batch_size=64, scan_steps=4, verbose=False,
                ckpt_dir=d)
    resumed = make()
    resumed.train(epochs=3, batch_size=64, scan_steps=4, verbose=False,
                  ckpt_dir=d)
    np.testing.assert_allclose(resumed.fue, straight.fue, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(resumed.fie, straight.fie, rtol=1e-6, atol=1e-7)
