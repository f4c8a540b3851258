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
        h = self._exec._history
        if not h.times:
            return
        first = {n: (c[0][:1] if c else []) for n, c in h.chunks.items()}
        h.times = h.times[:1]
        for n in h.chunks:
            h.chunks[n] = [first[n]] if len(first[n]) else []
