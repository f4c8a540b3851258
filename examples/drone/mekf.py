"""Multiplicative extended Kalman filter: attitude + gyro/accel/mag biases.

Parity target: reference examples/drone/mekf.py — the 18-state MEKF
(attitude, velocity, position error states plus three sensor-bias triplets)
whose attitude estimate closes the drone's angle loop.  Observations are the
gravity direction from the (health-weighted) accelerometer and the field
direction from the magnetometer; the quaternion reference integrates the
bias-corrected gyro each control tick and the error state folds back in
multiplicatively.

The 18x18 covariance algebra is written block-sparse (G's nonzero rows,
H's skew+bias structure) with sequential scalar measurement updates in
place of a 6x6 solve: the interactive 1-entity regime is bound by per-HLO
dispatch, and all the forms here stay batched matmuls under vmap for
campaigns (docs/PERFORMANCE.md).

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

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


def _ab(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a (n,3) @ b (3,m) as fused broadcasts: tiny dots lower to standalone
    thunks on the CPU backend and break fusion chains on both sides, and
    this tick is bound by per-thunk dispatch (docs/PERFORMANCE.md)."""
    return a[:, 0:1] * b[0] + a[:, 1:2] * b[1] + a[:, 2:3] * b[2]


def _ab_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a (n,3) @ b.T for b (m,3), same fused-broadcast form."""
    return a[:, 0:1] * b[:, 0] + a[:, 1:2] * b[:, 1] + a[:, 2:3] * b[:, 2]


def _mv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """a (n,3) @ v (3,) matvec, fused-broadcast form."""
    return a[:, 0] * v[0] + a[:, 1] * v[1] + a[:, 2] * v[2]


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Cofactor (adjugate/det) inverse of a 3x3 — pure elementwise scalar
    ops, so XLA fuses it into one kernel; used on the well-conditioned SPD
    innovation covariance where LU pivoting would buy nothing."""
    c00 = m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1]
    c01 = m[0, 2] * m[2, 1] - m[0, 1] * m[2, 2]
    c02 = m[0, 1] * m[1, 2] - m[0, 2] * m[1, 1]
    c10 = m[1, 2] * m[2, 0] - m[1, 0] * m[2, 2]
    c11 = m[0, 0] * m[2, 2] - m[0, 2] * m[2, 0]
    c12 = m[0, 2] * m[1, 0] - m[0, 0] * m[1, 2]
    c20 = m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]
    c21 = m[0, 1] * m[2, 0] - m[0, 0] * m[2, 1]
    c22 = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    det = m[0, 0] * c00 + m[0, 1] * c10 + m[0, 2] * c20
    adj = jnp.stack([
        jnp.stack([c00, c01, c02]),
        jnp.stack([c10, c11, c12]),
        jnp.stack([c20, c21, c22]),
    ])
    return adj / det


def make_update(sn):
    """MEKF measurement+time update, closed over the sensor module."""

    @el.map
    def update(
        gyro: sn.Gyro,
        accel: sn.Accel,
        mag: sn.Magnetometer,
        health: sn.AccelHealth,
        pos: el.WorldPos,
        p_cov: EstCov,
        q_est: AttEst,
        bg: GyroBiasEst,
        ba: AccelBiasEst,
        bm: MagBiasEst,
    ) -> tuple[EstCov, AttEst, GyroBiasEst, AccelBiasEst, MagBiasEst, AttEstError]:
        dt = CTRL_DT
        a_norm = jnp.linalg.norm(accel)
        accel_u = jnp.where(a_norm > 1e-6, accel / jnp.maximum(a_norm, 1e-6), _UP)
        w = gyro - bg
        a_meas = accel_u - ba
        m_meas = mag - bm

        # Reference propagation: integrate the bias-corrected gyro.
        q_est = (q_est + q_est * el.Quaternion(jnp.concatenate([0.5 * w * dt, jnp.zeros(1)]))).normalize()
        rot = q_est.to_mat3()

        # Covariance propagation, first-order (P += dt(GP + PG^T) + Q) with
        # G's block sparsity written out: G's only nonzero rows are 0:9
        # (attitude <- gyro bias, velocity <- attitude/accel bias, position
        # <- velocity), so GP is one (6,3)@(3,18) matmul plus row gathers
        # instead of two dense 18x18 products.  The dropped dt^2 G P G^T
        # term is O(dt) smaller than _Q_DISCRETE at 300 Hz; the interactive
        # 1-entity regime is dispatch-bound, so fewer/smaller HLO ops win
        # (docs/PERFORMANCE.md).
        ab = jnp.concatenate([-skew(w), -_ab(rot, skew(a_meas))], axis=0)
        m_top = _ab(ab, p_cov[0:3])
        m9 = jnp.concatenate(
            [m_top[0:3] - p_cov[9:12], m_top[3:6] - _ab(rot, p_cov[12:15]),
             p_cov[3:6]],
            axis=0,
        )
        p_cov = p_cov.at[0:9, :].add(dt * m9)
        p_cov = p_cov.at[:, 0:9].add(dt * m9.T)
        p_cov = p_cov + _Q_DISCRETE

        # Observation: gravity and field directions in the body frame.
        # rot maps body->world, so the world +Z/+Y axes expressed in the
        # body frame are rot's third/second ROWS — no quaternion rotates.
        up_b = rot[2]
        north_b = rot[1]
        sk_u = skew(up_b)
        sk_n = skew(north_b)

        accel_obs_cov = 1.0 + (1.0 - health) * 1000.0

        # Two 3-row BLOCK Kalman updates (accel, then mag).  With R = r*I
        # per block this is algebraically the sequential-scalar posterior
        # (standard sequential-processing equivalence), but costs ~2 matmuls
        # + one fused cofactor 3x3 inverse per block instead of 3 matvecs +
        # 3 rank-1 (18,18) downdates — the interactive 1-entity regime is
        # bound by per-HLO dispatch inside the compiled scan body, and this
        # form cut the MEKF from 6.7 to ~3.5 us/tick (profiled 2026-08-19).
        # Block i of H is [skew(dir) | 0 | I3 at its bias triplet], so
        # P H_i^T needs only P's attitude and bias-block columns.
        # jnp.linalg.solve's LAPACK custom call would not compile on this
        # TPU stack anyway (ops/smallalg.py); the cofactor inverse of the
        # well-conditioned SPD S3 (diag ~1+P) is exact-enough and fuses.
        dx = jnp.zeros(18)
        for sk_m, lo, innov3, r in (
            (sk_u, 12, a_meas - up_b, accel_obs_cov),
            (sk_n, 15, m_meas - north_b, MAG_OBS_COV),
        ):
            pht = _ab_t(p_cov[:, 0:3], sk_m) + p_cov[:, lo:lo + 3]  # (18,3)
            s3 = _ab(sk_m, pht[0:3]) + pht[lo:lo + 3] + r * jnp.eye(3)
            k = _ab(pht, _inv3(s3))  # (18,3)
            resid = innov3 - (_mv(sk_m, dx[0:3]) + dx[lo:lo + 3])
            dx = dx + _mv(k, resid)
            p_cov = p_cov - _ab_t(k, pht)
        q_est = (
            q_est * el.Quaternion(jnp.concatenate([0.5 * dx[0:3], jnp.ones(1)]))
        ).normalize()
        # Truth-vs-estimate score folded into the same map (one system pass
        # fewer in the dispatch-bound interactive regime).
        err = q_est.angular_distance(pos.angular())
        return p_cov, q_est, bg + dx[9:12], ba + dx[12:15], bm + dx[15:18], err

    return update
