"""Discrete-time filters shared by the drone's sensor and control paths.

Parity target: reference examples/drone/filter.py — a first-order
exponential LPF and a Butterworth-style biquad section, both shaped so the
state threads through components (pure functions of (state, x) -> state).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


class LPF:
    """First-order low-pass: y' = y + alpha (x - y); cutoff 0 disables."""

    def __init__(self, cutoff_hz, sample_hz: float):
        dt = 1.0 / sample_hz
        rc = 1.0 / (2.0 * math.pi * jnp.asarray(cutoff_hz, dtype=jnp.float64))
        rc = jnp.nan_to_num(rc, posinf=0.0)
        self.alpha = dt / (rc + dt)

    def apply(self, y_prev, x):
        return y_prev + self.alpha * (x - y_prev)


class BiquadLPF:
    """Second-order low-pass biquad (Q = 1/sqrt(2), direct form I).

    Delay state is a (4, *shape) stack [x1, x2, y1, y2]; apply() returns the
    new delay whose row 2 is the output sample.
    """

    def __init__(self, cutoff_hz: float, sample_hz: float):
        if cutoff_hz <= 0 or sample_hz <= 0:
            raise ValueError("cutoff and sample rates must be positive")
        w = 2.0 * math.pi * cutoff_hz / sample_hz
        alpha = math.sin(w) / math.sqrt(2.0)
        a0 = 1.0 + alpha
        b1 = (1.0 - math.cos(w)) / a0
        b0 = b2 = b1 / 2.0
        self.b = (b0, b1, b2)
        self.a = ((-2.0 * math.cos(w)) / a0, (1.0 - alpha) / a0)

    def apply(self, delay, x):
        x1, x2, y1, y2 = delay
        b0, b1, b2 = self.b
        a1, a2 = self.a
        y = b0 * x + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return jnp.stack([x, x1, y, y1])
