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
        """Clear stored history and reset the tick counter to 0, KEEPING
        the live device state (step_context.rs:335-349: "clears all stored
        time-series data ... simulation tick will be reset to 0",
        continuing from the current physical state at a fresh tick 0).

        Previously only history rows were dropped while ``exec._tick``
        kept counting, so post-truncate rows landed at discontinuous
        times and ``state_at(k)`` returned the wrong tick."""
        self._exec.flush_telemetry()
        h = self._exec._history
        h.truncate(0)
        self._exec._tick = 0
