"""TPU-safe general linear algebra: ``solve`` / ``inv`` / ``det`` / ``lu``.

``jnp.linalg.{solve,inv,det}`` lower to an LAPACK-style LU custom call that
this TPU stack's remote compiler rejects for float64 operands
(tpu_compile_helper exits 1 → HTTP 500; f32 LU, f64 QR, and f64
triangular_solve all compile fine).  The reference runs these ops through
faer on CPU (libs/nox/src/array/mod.rs LuInverse/Cholesky noxpr nodes;
exercised by examples/linalg) and so never hits the restriction.

This module dispatches at trace time: native ``jnp.linalg`` everywhere it
works, and the unrolled partial-pivot LU from ``ops.smallalg`` —
plain arithmetic + gathers that XLA compiles on any backend and fuses into
the surrounding graph — for f64 on TPU.  The matrices these frameworks
need general solves for are small and static-shaped (3x3..18x18 covariance
and constraint blocks), where the unrolled form is also *faster* than a
LAPACK call would be.  Batched leading dims and vmap work throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import smallalg as _sa

__all__ = ["solve", "inv", "det", "lu_factor", "lu_solve"]

# Unrolled LU is quadratic in emitted ops over n; past this size fall back
# to native even on TPU (callers that big should restructure to f32/QR).
_MAX_UNROLL_N = 32


def _needs_fallback(dtype, n: int) -> bool:
    return (
        dtype == jnp.float64
        and n <= _MAX_UNROLL_N
        and jax.default_backend() == "tpu"
    )


def lu_factor(a):
    """Partial-pivot LU: returns ``(lu, perm, sign)`` (see smallalg)."""
    return _sa.lu_factor(jnp.asarray(a))


def lu_solve(lu, perm, b):
    return _sa.lu_solve(lu, perm, b)


def solve(a, b):
    """Solve ``a x = b`` for general square ``a`` (..., n, n).

    ``b`` may be (..., n) or (..., n, m), as with ``jnp.linalg.solve``.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not _needs_fallback(jnp.result_type(a, b), a.shape[-1]):
        return jnp.linalg.solve(a, b)
    vector = b.ndim == a.ndim - 1
    if vector:
        b = b[..., None]
    lu, perm, _ = _sa.lu_factor(a)
    x = _sa.lu_solve(lu, perm, b)
    return x[..., 0] if vector else x


def inv(a):
    """Inverse of a general square matrix (..., n, n)."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    if not _needs_fallback(a.dtype, n):
        return jnp.linalg.inv(a)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    lu, perm, _ = _sa.lu_factor(a)
    return _sa.lu_solve(lu, perm, eye)


def det(a):
    """Determinant of a general square matrix (..., n, n)."""
    a = jnp.asarray(a)
    if not _needs_fallback(a.dtype, a.shape[-1]):
        return jnp.linalg.det(a)
    lu, _, sign = _sa.lu_factor(a)
    return _sa.lu_det(lu, sign)
