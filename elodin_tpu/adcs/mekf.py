"""Multiplicative extended Kalman filter for attitude
(parity: fsw/roci/adcs/src/mekf.rs).

State: quaternion estimate + gyro bias + 6x6 error covariance.  All math is
written batched and branch-free (``jnp.where`` replaces the reference's
small-omega branches) so the filter vmaps across Monte Carlo samples and
jits into the simulation step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import _config
from ..ops.smallalg import psd_solve

from ..spatial import quat_identity, quat_integrate_body, quat_inverse, quat_rotate, skew

_EPS_OMEGA = 1e-5


def calculate_covariance(sigma_g, sigma_b, dt: float) -> jnp.ndarray:
    """Process noise Q (mekf.rs:5-19)."""
    sigma_g = jnp.asarray(sigma_g)
    sigma_b = jnp.asarray(sigma_b)
    vg = jnp.diag(sigma_g * sigma_g * dt)
    vb = jnp.diag(sigma_b * sigma_b * dt)
    q00 = vg + vb * (dt * dt / 3.0)
    q01 = vb * (dt / 2.0)
    q11 = vb
    top = jnp.concatenate([q00, q01], axis=1)
    bot = jnp.concatenate([q01, q11], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def propagate_quaternion(q, omega, dt):
    """Closed-form quaternion propagation under constant omega
    (mekf.rs:21-37); falls back to identity for tiny rates."""
    omega = jnp.asarray(omega)
    n = jnp.linalg.norm(omega, axis=-1)
    n_safe = jnp.where(n > _EPS_OMEGA, n, 1.0)
    c = jnp.cos(0.5 * n * dt)
    s = jnp.sin(0.5 * n * dt) / n_safe
    ox, oy, oz = (omega[..., i] * s for i in range(3))
    # big_omega rows act on [x, y, z, w]
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    nx = c * x + oz * y - oy * z + ox * w
    ny = -oz * x + c * y + ox * z + oy * w
    nz = oy * x - ox * y + c * z + oz * w
    nw = -ox * x - oy * y - oz * z + c * w
    q_new = jnp.stack([nx, ny, nz, nw], axis=-1)
    return jnp.where((n > _EPS_OMEGA)[..., None], q_new, q)


def propagate_state_covariance(p, omega, yqy, dt):
    """P' = Phi P Phi^T + Y Q Y^T with the closed-form MEKF transition
    matrix (mekf.rs:39-76)."""
    omega = jnp.asarray(omega)
    n2 = jnp.sum(omega * omega, axis=-1)
    n = jnp.sqrt(n2)
    safe = n > _EPS_OMEGA
    n_s = jnp.where(safe, n, 1.0)
    n2_s = jnp.where(safe, n2, 1.0)
    s = jnp.sin(n * dt)
    c = jnp.cos(n * dt)
    pp = s / n_s
    qq = (1.0 - c) / n2_s
    rr = (n * dt - s) / (n2_s * n_s)
    ox = skew(omega)
    ox2 = ox @ ox
    eye = jnp.eye(3, dtype=p.dtype)
    phi00 = jnp.where(
        safe[..., None, None],
        eye - ox * pp[..., None, None] + ox2 * qq[..., None, None],
        eye,
    )
    phi01 = jnp.where(
        safe[..., None, None],
        ox * qq[..., None, None] - eye * dt - ox2 * rr[..., None, None],
        -eye * dt,
    )
    zeros = jnp.zeros_like(eye)
    top = jnp.concatenate([phi00, phi01], axis=-1)
    bot = jnp.concatenate([zeros, jnp.broadcast_to(eye, phi00.shape)], axis=-1)
    phi = jnp.concatenate([top, bot], axis=-2)
    return phi @ p @ jnp.swapaxes(phi, -1, -2) + yqy


@jax.tree_util.register_pytree_node_class
@dataclass
class Mekf:
    """MEKF state (mekf.rs State)."""

    q_hat: jnp.ndarray  # (..., 4)
    b_hat: jnp.ndarray  # (..., 3)
    p: jnp.ndarray  # (..., 6, 6)
    omega: jnp.ndarray  # (..., 3) latest gyro reading
    yqy: jnp.ndarray  # (6, 6)
    dt: float

    @staticmethod
    def new(sigma_g, sigma_b, dt: float) -> "Mekf":
        # consistent dtype from the float policy: mixed f32/f64 fields make
        # the filter un-carryable through lax.scan and silently promote the
        # whole covariance update to emulated f64 on TPU
        ft = _config.default_float()
        y = jnp.diag(jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], dtype=ft))
        q = calculate_covariance(
            jnp.asarray(sigma_g, dtype=ft), jnp.asarray(sigma_b, dtype=ft), dt
        )
        return Mekf(
            q_hat=quat_identity(),
            b_hat=jnp.zeros(3, dtype=ft),
            p=jnp.eye(6, dtype=ft),
            omega=jnp.zeros(3, dtype=ft),
            yqy=y @ q @ y.T,
            dt=dt,
        )

    def estimate_attitude(self, measured_bodys, references, sigma_r) -> "Mekf":
        """Propagate + sequential vector-measurement update
        (mekf.rs:110-160)."""
        omega = self.omega - self.b_hat
        q_hat = propagate_quaternion(self.q_hat, omega, self.dt)
        p = propagate_state_covariance(self.p, omega, self.yqy, self.dt)
        delta_x = jnp.zeros(q_hat.shape[:-1] + (6,), dtype=q_hat.dtype)
        eye6 = jnp.eye(6, dtype=p.dtype)
        # strict: a length mismatch (e.g. one sigma for two vector obs)
        # must fail loudly, not silently drop a measurement
        for body, ref, sigma in zip(
            measured_bodys, references, sigma_r, strict=True
        ):
            body = jnp.asarray(body, dtype=p.dtype)
            ref = jnp.asarray(ref, dtype=p.dtype)
            # cast sigma too: a strongly-typed f64 sigma would otherwise
            # promote var_r -> s_mat -> k -> p mid-update
            sigma = jnp.asarray(sigma, dtype=p.dtype)
            var_r = jnp.eye(3, dtype=p.dtype) * (sigma**2)
            body_r = quat_rotate(quat_inverse(q_hat), ref)
            e = body - body_r
            h = jnp.concatenate(
                [skew(body_r),
                 jnp.zeros(body_r.shape[:-1] + (3, 3), dtype=p.dtype)],
                axis=-1,
            )
            ht = jnp.swapaxes(h, -1, -2)
            s_mat = h @ p @ ht + var_r
            # solve, not explicit inverse: cheaper and better conditioned
            # when the innovation covariance is near-singular (tiny sigma)
            k = jnp.swapaxes(
                psd_solve(s_mat, jnp.swapaxes(p @ ht, -1, -2)),
                -1, -2,
            )
            p = (eye6 - k @ h) @ p
            d = (h @ delta_x[..., None])[..., 0]
            delta_x = delta_x + (k @ (e - d)[..., None])[..., 0]
        q_hat = quat_integrate_body(q_hat, delta_x[..., :3])
        b_hat = self.b_hat + delta_x[..., 3:]
        # keep the RAW gyro reading in omega (its documented contract):
        # storing the bias-corrected rate made a second update without a
        # fresh gyro sample subtract the bias twice
        return Mekf(q_hat, b_hat, p, self.omega, self.yqy, self.dt)

    def reset_if_invalid(self) -> "Mekf":
        """Branch-free non-finite reset (mekf.rs:165-189)."""
        bad = ~(
            jnp.isfinite(self.q_hat).all(axis=-1)
            & jnp.isfinite(self.b_hat).all(axis=-1)
            & jnp.isfinite(self.p).all(axis=(-1, -2))
            & jnp.isfinite(self.omega).all(axis=-1)
        )
        return Mekf(
            jnp.where(
                bad[..., None],
                quat_identity().astype(self.q_hat.dtype),
                self.q_hat,
            ),
            jnp.where(bad[..., None], 0.0, self.b_hat),
            jnp.where(
                bad[..., None, None],
                jnp.eye(6, dtype=self.p.dtype),
                self.p,
            ),
            jnp.where(bad[..., None], 0.0, self.omega),
            self.yqy,
            self.dt,
        )

    # pytree
    def tree_flatten(self):
        return (self.q_hat, self.b_hat, self.p, self.omega, self.yqy), (self.dt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, dt=aux[0])
