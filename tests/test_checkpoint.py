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
