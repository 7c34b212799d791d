"""Two-process CPU-mesh test: jax.distributed over localhost.

Spawns two worker processes (tests/_mp_worker.py), each owning 2 virtual
CPU devices, joined via ``jax.distributed.initialize``; the global
4-device mesh spans both processes, and the distributed BPR trainer and
fused ALS sweep run on it end-to-end (collectives via Gloo). This is the
multi-host validation path mandated by SURVEY.md §4/§7.6 — the reference
has no distribution at all (SURVEY §2.4).
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_end_to_end():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers pin cpu via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        parts = line.split()
        results[int(parts[1])] = tuple(float(x) for x in parts[2:])
    assert set(results) == {0, 1}
    # SPMD determinism: both processes computed the identical global program
    np.testing.assert_array_equal(results[0], results[1])
    loss, ue_sum, fit, wmf_sum, loss_e, serve_sum, vloss, vbpr_sum = (
        results[0]
    )
    assert np.isfinite(results[0]).all()
    assert ue_sum > 0 and wmf_sum > 0 and serve_sum > 0 and vbpr_sum > 0
