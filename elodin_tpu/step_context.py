"""Pre/post-step host context (libs/nox-py/src/step_context.rs:97).

Gives host callbacks read/write access to component state between tick
batches — the lockstep bridge for external controllers (SITL) using
``external_control`` components.
"""

from __future__ import annotations

import numpy as np


class StepContext:
    def __init__(self, exec_):
        self._exec = exec_

    def read_component(self, qualified: str) -> np.ndarray:
        value = self._exec.read_component(qualified)
        return np.atleast_1d(np.asarray(value))

    def write_component(self, qualified: str, value) -> None:
        self._exec.write_component(qualified, value)

    def tick(self) -> int:
        return self._exec.tick()

    def truncate(self) -> None:
        """Rewind history to tick 0 (step_context.rs:342)."""
        self._exec.flush_telemetry()
        h = self._exec._history
        if not h.times:
            return
        h.truncate(1)
