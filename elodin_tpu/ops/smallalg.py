"""Small-matrix linear algebra in pure arithmetic ops.

``jnp.linalg.solve`` / ``inv`` / ``cholesky`` lower to LAPACK-style custom
calls that this TPU stack's remote compiler cannot handle inside loops
(compile hangs / HTTP 500 from tpu_compile_helper) — and the matrices the
estimators need them for are tiny, fixed-size, and (almost always) SPD:
3x3 soft-iron fits, 6x6 innovation covariances, 18x18 MEKF covariances.

These routines unroll a Cholesky factorization and the triangular solves
over the STATIC matrix dimension into plain adds/muls/divides, which XLA
compiles anywhere and fuses into the surrounding graph.  Batched leading
dimensions work throughout (used under vmap by the batched campaigns).

Reference counterparts do the same math through faer on CPU
(libs/nox/src/array/..., Cholesky/LuInverse noxpr nodes).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_lower(a, jitter: float = 0.0):
    """Lower-triangular Cholesky factor of an SPD matrix (..., n, n),
    unrolled over the static n."""
    n = a.shape[-1]
    if jitter:
        a = a + jitter * jnp.eye(n, dtype=a.dtype)
    l = jnp.zeros_like(a)
    for j in range(n):
        if j:
            d = a[..., j, j] - jnp.sum(l[..., j, :j] * l[..., j, :j], axis=-1)
        else:
            d = a[..., j, j]
        # Singularity floor must be representable in a.dtype: 1e-300
        # underflows to 0 in f32 (and in the TPU backend's emulated f64),
        # turning the guard into a no-op and letting num/d produce NaN.
        tiny = jnp.asarray(jnp.finfo(a.dtype).tiny, dtype=a.dtype)
        d = jnp.sqrt(jnp.maximum(d, tiny))
        l = l.at[..., j, j].set(d)
        if j + 1 < n:
            if j:
                num = a[..., j + 1 :, j] - jnp.einsum(
                    "...ik,...k->...i", l[..., j + 1 :, :j], l[..., j, :j]
                )
            else:
                num = a[..., j + 1 :, j]
            l = l.at[..., j + 1 :, j].set(num / d[..., None])
    return l


def cholesky_upper(a, jitter: float = 0.0):
    """Upper factor U with a = U^T U (the Merwe sigma-point convention)."""
    return jnp.swapaxes(cholesky_lower(a, jitter), -1, -2)


def solve_tri_lower(l, b):
    """Solve l x = b with lower-triangular l; b is (..., n, m)."""
    n = l.shape[-1]
    rows = []
    for i in range(n):
        acc = b[..., i, :]
        for j in range(i):
            acc = acc - l[..., i, j, None] * rows[j]
        rows.append(acc / l[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def solve_tri_upper(u, b):
    """Solve u x = b with upper-triangular u; b is (..., n, m)."""
    n = u.shape[-1]
    rows = [None] * n
    for i in reversed(range(n)):
        acc = b[..., i, :]
        for j in range(i + 1, n):
            acc = acc - u[..., i, j, None] * rows[j]
        rows[i] = acc / u[..., i, i, None]
    return jnp.stack(rows, axis=-2)


def psd_solve(a, b, jitter: float = 0.0):
    """Solve a x = b for SPD a (..., n, n) and b (..., n, m)."""
    l = cholesky_lower(a, jitter)
    return solve_tri_upper(
        jnp.swapaxes(l, -1, -2), solve_tri_lower(l, b)
    )


def psd_inv(a, jitter: float = 0.0):
    """Inverse of an SPD matrix via the unrolled Cholesky solve."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return psd_solve(a, eye, jitter)


def lu_factor(a):
    """Partial-pivot LU of a general (..., n, n) matrix, unrolled over the
    static n into plain arithmetic + gathers (no LAPACK custom call — the
    TPU remote compiler rejects f64 ``lax.linalg.lu``; see module docstring).

    Returns ``(lu, perm, sign)``: ``lu`` packs unit-lower L below the
    diagonal and U on/above it (LAPACK convention); ``perm`` is the row
    permutation applied to the INPUT (``a[perm] = L @ U``, batched shape
    ``(..., n)``, int32); ``sign`` is the permutation parity (+1/-1,
    a.dtype) for determinants.  Batched leading dims work throughout.
    """
    n = a.shape[-1]
    batch = a.shape[:-2]
    sign = jnp.ones(batch, dtype=a.dtype)
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), batch + (n,))
    for k in range(n):
        # pivot row = argmax |column k| over rows k..n-1
        col = jnp.abs(a[..., k:, k])
        p = (jnp.argmax(col, axis=-1) + k).astype(jnp.int32)  # (...,)
        row_k = a[..., k, :]
        row_p = jnp.take_along_axis(
            a, jnp.broadcast_to(p[..., None, None], batch + (1, n)), axis=-2
        )[..., 0, :]
        # swap rows k<->p: write the old row k into position p first (a
        # masked where), then overwrite row k; p==k degenerates correctly.
        is_p = (jnp.arange(n, dtype=jnp.int32) == p[..., None])[..., None]
        a = jnp.where(is_p, row_k[..., None, :], a)
        a = a.at[..., k, :].set(row_p)
        perm_k = perm[..., k]
        perm_p = jnp.take_along_axis(
            perm, jnp.broadcast_to(p[..., None], batch + (1,)), axis=-1
        )[..., 0]
        perm = jnp.where(is_p[..., 0], perm_k[..., None], perm)
        perm = perm.at[..., k].set(perm_p)
        sign = sign * jnp.where(p == k, 1.0, -1.0).astype(a.dtype)
        if k + 1 < n:
            # zero-pivot guard: a singular matrix must factor to a finite
            # L with a 0 on U's diagonal so det comes out 0 (matching
            # jnp.linalg.det) instead of 0/0 = NaN poisoning the product;
            # solves against a singular factorization stay undefined.
            pivot = a[..., k, k][..., None]
            safe = jnp.where(pivot == 0, jnp.ones_like(pivot), pivot)
            factors = a[..., k + 1 :, k] / safe
            a = a.at[..., k + 1 :, k].set(factors)
            a = a.at[..., k + 1 :, k + 1 :].add(
                -factors[..., None] * a[..., k, k + 1 :][..., None, :]
            )
    return a, perm, sign


def lu_solve(lu, perm, b):
    """Solve ``a x = b`` from ``lu_factor(a)`` output; b is (..., n, m)."""
    n = lu.shape[-1]
    bp = jnp.take_along_axis(
        b, jnp.broadcast_to(perm[..., None], b.shape[:-2] + (n, b.shape[-1])),
        axis=-2,
    )
    low = jnp.tril(lu, -1) + jnp.eye(n, dtype=lu.dtype)
    return solve_tri_upper(jnp.triu(lu), solve_tri_lower(low, bp))


def lu_det(lu, sign):
    """Determinant from ``lu_factor`` output."""
    diag = jnp.diagonal(lu, axis1=-2, axis2=-1)
    return sign * jnp.prod(diag, axis=-1)


def inv_3x3(a):
    """Closed-form adjugate inverse for general (..., 3, 3) matrices."""
    m = a
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = (
        m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    )
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c00,
                    m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
                    m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c01,
                    m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
                    m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c02,
                    m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
                    m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
