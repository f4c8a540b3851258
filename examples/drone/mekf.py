"""Multiplicative extended Kalman filter: attitude + gyro/accel/mag biases.

Parity target: reference examples/drone/mekf.py — the 18-state MEKF
(attitude, velocity, position error states plus three sensor-bias triplets)
whose attitude estimate closes the drone's angle loop.  Observations are the
gravity direction from the (health-weighted) accelerometer and the field
direction from the magnetometer; the quaternion reference integrates the
bias-corrected gyro each control tick and the error state folds back in
multiplicatively.

All dense 18x18 algebra — one (18,18)@(18,18) chain and a 6x6 solve per
tick — maps straight onto the MXU under vmap for batched campaigns.

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

from elodin_tpu.ops.smallalg import psd_solve
from elodin_tpu.spatial import skew

CTRL_DT = 1.0 / 300.0

P0 = 0.1
# Bias states start well-known (near zero): a loose bias prior lets the
# first big innovation freeze into the statically-unobservable bias states
# and leaves a permanent attitude offset.
P0_BIAS = 1e-4
GYRO_COV = 0.1
GYRO_BIAS_COV = 0.01
ACCEL_COV = 0.1
ACCEL_BIAS_COV = 0.001
MAG_BIAS_COV = 0.001
MAG_OBS_COV = 0.1

_UP = jnp.asarray([0.0, 0.0, 1.0])
_NORTH = jnp.asarray([0.0, 1.0, 0.0])

_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))

EstCov = ty.Annotated[
    jax.Array,
    el.Component(
        "estimate_covariance",
        el.ComponentType(el.PrimitiveType.F64, (18, 18)),
        metadata={"private": "true"},
    ),
]
AttEst = ty.Annotated[el.Quaternion, el.Component("attitude_estimate")]
GyroBiasEst = ty.Annotated[jax.Array, el.Component("gyro_bias_estimate", _F3)]
AccelBiasEst = ty.Annotated[jax.Array, el.Component("accel_bias_estimate", _F3)]
MagBiasEst = ty.Annotated[jax.Array, el.Component("magnetometer_bias_estimate", _F3)]
AttEstError = ty.Annotated[jax.Array, el.Component("attitude_estimate_error", el.ComponentType.F64)]


def process_noise(dt: float) -> jnp.ndarray:
    """Van-Loan-style discretized Q for the 18-state error model."""
    i3 = jnp.eye(3)
    q = jnp.zeros((18, 18))
    q = q.at[0:3, 0:3].set((GYRO_COV * dt + GYRO_BIAS_COV * dt**3 / 3.0) * i3)
    q = q.at[0:3, 9:12].set(-GYRO_BIAS_COV * dt**2 / 2.0 * i3)
    q = q.at[9:12, 0:3].set(-GYRO_BIAS_COV * dt**2 / 2.0 * i3)
    q = q.at[9:12, 9:12].set(GYRO_BIAS_COV * dt * i3)
    q = q.at[3:6, 3:6].set((ACCEL_COV * dt + ACCEL_BIAS_COV * dt**3 / 3.0) * i3)
    q = q.at[3:6, 6:9].set((ACCEL_COV * dt**2 / 2.0 + ACCEL_BIAS_COV * dt**4 / 8.0) * i3)
    q = q.at[6:9, 3:6].set((ACCEL_COV * dt**2 / 2.0 + ACCEL_BIAS_COV * dt**4 / 8.0) * i3)
    q = q.at[6:9, 6:9].set((ACCEL_COV * dt**3 / 3.0 + ACCEL_BIAS_COV * dt**5 / 20.0) * i3)
    q = q.at[3:6, 12:15].set(-ACCEL_BIAS_COV * dt**2 / 2.0 * i3)
    q = q.at[12:15, 3:6].set(-ACCEL_BIAS_COV * dt**2 / 2.0 * i3)
    q = q.at[6:9, 12:15].set(-ACCEL_BIAS_COV * dt**3 / 6.0 * i3)
    q = q.at[12:15, 6:9].set(-ACCEL_BIAS_COV * dt**3 / 6.0 * i3)
    q = q.at[12:15, 12:15].set(ACCEL_BIAS_COV * dt * i3)
    q = q.at[15:18, 15:18].set(MAG_BIAS_COV * dt * i3)
    return q


_Q_DISCRETE = process_noise(CTRL_DT)


@el.dataclass
class MEKF(el.Archetype):
    estimate_covariance: EstCov = field(
        default_factory=lambda: jnp.diag(
            jnp.concatenate([jnp.full(9, P0), jnp.full(9, P0_BIAS)])
        )
    )
    attitude_estimate: AttEst = field(default_factory=el.Quaternion.identity)
    gyro_bias_estimate: GyroBiasEst = field(default_factory=lambda: jnp.zeros(3))
    accel_bias_estimate: AccelBiasEst = field(default_factory=lambda: jnp.zeros(3))
    magnetometer_bias_estimate: MagBiasEst = field(default_factory=lambda: jnp.zeros(3))
    attitude_estimate_error: AttEstError = field(default_factory=lambda: jnp.float64(0.0))


def make_update(sn):
    """MEKF measurement+time update, closed over the sensor module."""

    @el.map
    def update(
        gyro: sn.Gyro,
        accel: sn.Accel,
        mag: sn.Magnetometer,
        health: sn.AccelHealth,
        p_cov: EstCov,
        q_est: AttEst,
        bg: GyroBiasEst,
        ba: AccelBiasEst,
        bm: MagBiasEst,
    ) -> tuple[EstCov, AttEst, GyroBiasEst, AccelBiasEst, MagBiasEst]:
        dt = CTRL_DT
        a_norm = jnp.linalg.norm(accel)
        accel_u = jnp.where(a_norm > 1e-6, accel / jnp.maximum(a_norm, 1e-6), _UP)
        w = gyro - bg
        a_meas = accel_u - ba
        m_meas = mag - bm

        # Reference propagation: integrate the bias-corrected gyro.
        q_est = (q_est + q_est * el.Quaternion(jnp.concatenate([0.5 * w * dt, jnp.zeros(1)]))).normalize()
        rot = q_est.to_mat3()

        # Linearized error dynamics -> first-order transition matrix.
        g_mat = jnp.zeros((18, 18))
        g_mat = g_mat.at[0:3, 0:3].set(-skew(w))
        g_mat = g_mat.at[0:3, 9:12].set(-jnp.eye(3))
        g_mat = g_mat.at[3:6, 0:3].set(-rot @ skew(a_meas))
        g_mat = g_mat.at[3:6, 12:15].set(-rot)
        g_mat = g_mat.at[6:9, 3:6].set(jnp.eye(3))
        f_mat = jnp.eye(18) + g_mat * dt

        p_cov = f_mat @ p_cov @ f_mat.T + _Q_DISCRETE

        # Observation: gravity and field directions in the body frame.
        up_b = q_est.inverse() @ _UP
        north_b = q_est.inverse() @ _NORTH
        h_mat = jnp.zeros((6, 18))
        h_mat = h_mat.at[0:3, 0:3].set(skew(up_b))
        h_mat = h_mat.at[0:3, 12:15].set(jnp.eye(3))
        h_mat = h_mat.at[3:6, 0:3].set(skew(north_b))
        h_mat = h_mat.at[3:6, 15:18].set(jnp.eye(3))

        accel_obs_cov = 1.0 + (1.0 - health) * 1000.0
        r_mat = jnp.zeros((6, 6))
        r_mat = r_mat.at[0:3, 0:3].set(accel_obs_cov * jnp.eye(3))
        r_mat = r_mat.at[3:6, 3:6].set(MAG_OBS_COV * jnp.eye(3))

        ph_t = p_cov @ h_mat.T
        innov_cov = h_mat @ ph_t + r_mat
        # K = P H^T S^-1 via the unrolled SPD solve — jnp.linalg.solve's
        # LAPACK custom call does not compile on this TPU stack
        gain = psd_solve(innov_cov, ph_t.T).T
        p_cov = (jnp.eye(18) - gain @ h_mat) @ p_cov

        innov = jnp.concatenate([a_meas - up_b, m_meas - north_b])
        dx = gain @ innov
        q_est = (
            q_est * el.Quaternion(jnp.concatenate([0.5 * dx[0:3], jnp.ones(1)]))
        ).normalize()
        return p_cov, q_est, bg + dx[9:12], ba + dx[12:15], bm + dx[15:18]

    @el.map
    def score(q_est: AttEst, pos: el.WorldPos) -> AttEstError:
        return q_est.angular_distance(pos.angular())

    return update | score
