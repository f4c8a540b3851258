"""Numeric-precision guards for emulated-f64 TPU backends.

The axon TPU stack emulates float64 as a double-float (hi/lo f32-pair-like)
representation.  Its fusion pass has a correctness bug this module guards
against, found by this framework's TPU-vs-CPU trajectory gate
(bench.py bench_verify; reference pattern:
libs/nox-py/src/cranelift_compile.rs:70-85):

    inside lax.fori_loop / lax.while_loop / lax.scan, the expression

        BIG_F64_CONSTANT + (loop_carry_scalar * OTHER_CONSTANT)

    drops the LOW LIMB of the constant addend — the result is only
    f32-accurate (observed: a 5.5e6 m ECEF pad coordinate losing 0.2 m,
    exactly its f64-minus-f32 residual).  The same expression compiled
    OUTSIDE a loop is exact, as is the operand-swapped form
    ``expr + BIG_F64_CONSTANT``.

``const_pin(x)`` wraps a constant in ``lax.optimization_barrier`` so the
fuser cannot fold it into the buggy fused-add path.  Cost: one barrier op —
it blocks constant folding across the boundary but none of the surrounding
elementwise fusion, and it is a no-op semantically on every backend.

Use it on any f64 constant whose LOW BITS matter (geodetic anchors, ECEF
origins, ephemeris constants) when the constant is ADDED to carry-dependent
values inside the tick loop:

    PAD_ECEF = ...                       # np.ndarray, magnitude ~6.4e6
    pad_cg = const_pin(PAD_ECEF) + cg * U_HAT   # safe on axon TPU
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def const_pin(x) -> jax.Array:
    """Pin an f64 constant against lossy constant-folding fusion on
    emulated-f64 TPU backends (see module docstring for the bug)."""
    return jax.lax.optimization_barrier(jnp.asarray(x))
