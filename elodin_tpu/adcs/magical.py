"""MAG.I.CAL magnetometer calibration
(parity: fsw/roci/adcs/src/magical.rs; doi:10.1109/JSEN.2019.2919179).

Iterative least-squares estimate of the soft-iron matrix T and hard-iron
offset h from raw readings.  The reference loops to convergence with an early
exit; here the loop is a fixed-length ``lax.scan`` (TPU-friendly static
control flow) with the converged-state carried through, which yields the same
fixed point."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.smallalg import inv_3x3, psd_inv


def _calibration_step(y, m):
    """One least-squares refinement (magical.rs:9-23).

    y, m: (3, N) raw readings and current unit-field estimates."""
    n = y.shape[1]
    ones = jnp.ones((1, n), dtype=y.dtype)
    g = jnp.concatenate([m, ones], axis=0)  # (4, N)
    ggt_inv = psd_inv(g @ g.T)
    l = (y @ g.T) @ ggt_inv  # (3, 4)
    t = l[:, :3]
    h = l[:, 3]
    return t, h


def magical_calibrate(y, iterations: int = 32, tol: float = 1e-5):
    """Calibrate from N raw 3-vector readings (N, 3).

    Returns (m, t, h, converged): unit field directions (N, 3), soft-iron T
    (3, 3), hard-iron offset h (3,), and a convergence flag.

    ``tol`` bounds the ABSOLUTE residual sum over all N readings
    (reference-parity with magical.rs:43, which returns None past it): with
    measurement noise the optimum residual is ~N*(2*sigma)^2, so noisy data
    never sets the flag even when the fit is good — pass a noise-scaled tol
    (e.g. ``4 * n * sigma**2 * margin``) if you want the flag to mean
    "converged to the noise floor" instead of "noise-free fixed point"."""
    y = jnp.asarray(y)
    y_mat = y.T  # (3, N)
    m0 = (y / jnp.linalg.norm(y, axis=-1, keepdims=True)).T

    def body(carry, _):
        m, best_t, best_h, done = carry
        t, h = _calibration_step(y_mat, m)
        t_inv = inv_3x3(t)
        m_tilde = (t_inv @ (y_mat - h[:, None])).T  # (N, 3)
        j = jnp.sum((jnp.sum(m_tilde * m_tilde, axis=-1) - 1.0) ** 2)
        m_new = (m_tilde / jnp.linalg.norm(m_tilde, axis=-1, keepdims=True)).T
        # keep refining until the done latch sets, then freeze everything
        best_t = jnp.where(~done, t, best_t)
        best_h = jnp.where(~done, h, best_h)
        m = jnp.where(done, m, m_new)
        return (m, best_t, best_h, done | (j < tol)), None

    init = (m0, jnp.eye(3, dtype=y.dtype), jnp.zeros(3, dtype=y.dtype),
            jnp.asarray(False))
    (m, t, h, done), _ = jax.lax.scan(body, init, None, length=iterations)
    return m.T, t, h, done
