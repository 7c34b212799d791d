"""Solver state logging: state.log + settings.txt.

Parity with the reference's native solver observability
(reference old/cr/cr.cpp:91-93,275-276 writes ``state.log`` rows of
``iter time likelihood converge``; old/cr/cr.h:32-44 dumps hyperparameters
to ``settings.txt``). ALS-family models write these when given a
``log_dir`` so long runs are inspectable/resumable the same way the
reference's pipelines were.
"""

from __future__ import annotations

import os
import time
from typing import Mapping, Optional


class StateLog:
    """Append-only iteration log + one-time settings dump."""

    def __init__(self, log_dir: Optional[str], settings: Mapping):
        self.path = None
        if log_dir is None:
            return
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "settings.txt"), "w") as f:
            for key, val in settings.items():
                f.write(f"{key} = {val}\n")
        self.path = os.path.join(log_dir, "state.log")
        self._t0 = time.time()
        with open(self.path, "w") as f:
            f.write("iter time likelihood converge\n")

    def append(self, it: int, likelihood: float, converge: float) -> None:
        if self.path is None:
            return
        with open(self.path, "a") as f:
            f.write(
                "%04d %.2f %.10e %.10e\n"
                % (it, time.time() - self._t0, likelihood, converge)
            )
