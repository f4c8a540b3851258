"""UKF-based attitude-independent magnetometer calibration
(parity: fsw/roci/adcs/src/magkal.rs; Crassidis/Lai/Harman,
"Real-Time Attitude-Independent Three-Axis Magnetometer Calibration").

State (9): hard-iron bias b (3) + symmetric scale/nonorthogonality D (6)."""

from __future__ import annotations

import jax.numpy as jnp

from .ukf import MerweConfig, UkfState


def _d_matrix(d6):
    d0, d1, d2, d3, d4, d5 = (d6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([d0, d1, d2], axis=-1),
            jnp.stack([d1, d3, d4], axis=-1),
            jnp.stack([d2, d4, d5], axis=-1),
        ],
        axis=-2,
    )


def measure(state, z):
    """Scalar measurement model (magkal.rs:14-27)."""
    b = state[..., :3]
    d = _d_matrix(state[..., 3:])
    d_eye = jnp.eye(3, dtype=state.dtype) + d
    c = (d_eye @ b[..., None])[..., 0]
    e = 2.0 * d + d @ d
    zt_e_z = jnp.einsum("...i,...ij,...j->...", z, e, z)
    return (-zt_e_z + 2.0 * jnp.sum(z * c, axis=-1)
            - jnp.sum(b * b, axis=-1))[..., None]


class MagKal:
    """Streaming calibration estimator (magkal.rs State)."""

    def __init__(self):
        q = jnp.diag(
            jnp.asarray([50.0, 50.0, 50.0, 0.001, 0.001, 0.001, 0.001, 0.001, 0.001])
        )
        self.state = UkfState(
            x_hat=jnp.zeros(9),
            covar=q,
            prop_covar=jnp.zeros((9, 9)),
            noise_covar=jnp.asarray([[1.0e-3]]),
            config=MerweConfig(9, 0.1, 2.0, -3.0),
        )

    def update(self, z, b_ref):
        """z: raw reading; b_ref: reference field at the vehicle location."""
        z = jnp.asarray(z)
        b_ref = jnp.asarray(b_ref)
        meas = (jnp.sum(z * z, axis=-1) - jnp.sum(b_ref * b_ref, axis=-1))[..., None]
        self.state = self.state.update(
            meas, lambda x: x, lambda x, _z: measure(x, z)
        )
        return self

    @property
    def h_hat(self):
        return self.state.x_hat[..., :3]

    @property
    def d_hat(self):
        return _d_matrix(self.state.x_hat[..., 3:])
