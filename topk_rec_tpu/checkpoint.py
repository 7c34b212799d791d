"""Native sharded checkpointing (the second half of dual checkpointing).

The framework persists models two ways (SURVEY.md §5 checkpoint/resume):
  1. the reference-compatible text interchange (``final-U/V/B/E.dat``,
     ``models/base.py``) — portable, consumed by the reference CLI;
  2. this module — a native checkpoint of an arbitrary pytree of (possibly
     mesh-sharded) jax arrays, via orbax when available (per-shard async
     writes on multi-host) with a flat .npz fallback.

The reference's analogs are its TF-Saver binary graphs (single/bpr.py:
173-183) and the C++ solver's save-lag intermediate dumps
(old/cr/cr.cpp:284-295); ``save_every`` reproduces the save-lag behavior.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for key, val in tree.items():
            out.update(_flatten(val, f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for idx, val in enumerate(tree):
            out.update(_flatten(val, f"{prefix}{idx}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


class CheckpointManager:
    """Step-indexed checkpoints under a root directory.

    Uses orbax's StandardCheckpointer when importable (sharding-aware,
    multi-host safe); otherwise writes a flat ``step_{N}.npz``. ``keep``
    bounds retained steps; ``save_every`` mirrors the native solver's
    save-lag.
    """

    def __init__(self, root: str, keep: int = 3, save_every: int = 1):
        self.root = os.path.abspath(root)
        self.keep = keep
        self.save_every = save_every
        os.makedirs(self.root, exist_ok=True)
        self._orbax = None
        try:
            import orbax.checkpoint as ocp

            self._orbax = ocp.StandardCheckpointer()
        except Exception:
            self._orbax = None

    # ---- paths ----

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step:08d}")

    def steps(self):
        found = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"step_(\d+)(\.npz)?", name)
            if m:
                found.append(int(m.group(1)))
        return sorted(set(found))

    def latest_step(self) -> Optional[int]:
        steps = self.steps()
        return steps[-1] if steps else None

    # ---- save / restore ----

    def save(self, step: int, tree: Any, force: bool = False) -> bool:
        """Save if the step hits the save-lag cadence; returns whether saved."""
        if not force and step % self.save_every != 0:
            return False
        if self._orbax is not None:
            path = self._step_dir(step)
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            self._orbax.save(path, tree)
            self._orbax.wait_until_finished()
        else:
            flat = _flatten(tree)
            np.savez(self._step_dir(step) + ".npz", **flat)
        self._gc()
        return True

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        """Restore a step (default: latest). ``like`` provides the target
        structure/shardings (required for orbax sharded restore)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        dir_path = self._step_dir(step)
        if self._orbax is not None and os.path.isdir(dir_path):
            if like is not None:
                import jax

                abstract = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        np.shape(x),
                        np.asarray(x).dtype,
                        sharding=getattr(x, "sharding", None),
                    ),
                    like,
                )
                return self._orbax.restore(dir_path, abstract)
            return self._orbax.restore(dir_path)
        npz_path = dir_path + ".npz"
        with np.load(npz_path) as data:
            flat = dict(data)
        return _unflatten(flat)

    def _gc(self) -> None:
        steps = self.steps()
        for old in steps[: -self.keep] if self.keep else []:
            path = self._step_dir(old)
            if os.path.isdir(path):
                import shutil

                shutil.rmtree(path)
            elif os.path.exists(path + ".npz"):
                os.remove(path + ".npz")


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree
