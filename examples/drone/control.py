"""Cascaded flight controller flying on the ESTIMATOR, not truth.

Parity target: reference examples/drone/control.py — angle-P loop feeding a
body-rate PID feeding the quad-X mixer — with one deliberate upgrade over
the reference: the angle loop closes on the MEKF attitude estimate (the
reference's angle loop reads true attitude; its rate loop already flies on
the gyro).  Altitude hold uses true altitude — the estimator has no
baro/GNSS channel yet, same as the reference's TODO.

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

CTRL_DT = 1.0 / 300.0

RATE_P = jnp.asarray([0.40, 0.40, 2.50])
RATE_I = jnp.asarray([0.02, 0.02, 0.02])
RATE_D = jnp.asarray([0.05, 0.05, 0.01])
ANGLE_P = jnp.asarray([4.0, 4.0, 1.0])
ALT_P, ALT_D = 6.0, 4.0
I_LIMIT = 0.4
HOVER_THRUST_N = 9.81 / 4.0  # per motor, 1 kg vehicle
MAX_MOTOR_THRUST_N = 8.0

_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))

AngleDesired = ty.Annotated[
    jax.Array,
    el.Component("angle_desired", _F3, metadata={"element_names": "roll,pitch,yaw_rate"}),
]
AttTarget = ty.Annotated[el.Quaternion, el.Component("attitude_target")]
AngVelSetpoint = ty.Annotated[jax.Array, el.Component("ang_vel_setpoint", _F3)]
RatePidState = ty.Annotated[
    jax.Array, el.Component("rate_pid_state", el.ComponentType(el.PrimitiveType.F64, (6,)))
]
TorqueDemand = ty.Annotated[jax.Array, el.Component("torque_demand", _F3)]
AltSetpoint = ty.Annotated[jax.Array, el.Component("alt_setpoint", el.ComponentType.F64)]


@el.dataclass
class AttitudeController(el.Archetype):
    angle_desired: AngleDesired = field(default_factory=lambda: jnp.zeros(3))
    attitude_target: AttTarget = field(default_factory=el.Quaternion.identity)
    ang_vel_setpoint: AngVelSetpoint = field(default_factory=lambda: jnp.zeros(3))
    rate_pid_state: RatePidState = field(default_factory=lambda: jnp.zeros(6))
    torque_demand: TorqueDemand = field(default_factory=lambda: jnp.zeros(3))
    alt_setpoint: AltSetpoint = field(default_factory=lambda: jnp.float64(2.0))


def make_systems(sn, mekf_mod, motors_mod):
    """Control stack factory (runs at the 300 Hz control rate)."""
    arm2 = 2.0 * motors_mod.ARM_M**2  # sum of y_i^2 (= sum of x_i^2), quad-X
    kq_over_kt = motors_mod.KQ_TORQUE / motors_mod.KT_THRUST

    @el.map
    def update_target(angle: AngleDesired, tgt: AttTarget) -> AttTarget:
        """Desired (roll, pitch, yaw-rate) -> target quaternion; the yaw
        channel integrates the commanded rate."""
        v = tgt.vector()
        yaw_old = jnp.arctan2(
            2.0 * (v[3] * v[2] + v[0] * v[1]), 1.0 - 2.0 * (v[1] ** 2 + v[2] ** 2)
        )
        q_rp = el.Quaternion.from_euler(jnp.asarray([angle[0], angle[1], 0.0]))
        q_yaw = el.Quaternion.from_axis_angle(
            jnp.asarray([0.0, 0.0, 1.0]), yaw_old + angle[2] * CTRL_DT
        )
        return q_yaw * q_rp

    @el.map
    def angle_loop(q_est: mekf_mod.AttEst, tgt: AttTarget) -> AngVelSetpoint:
        """P on the quaternion error — measured attitude is the MEKF output."""
        q_err = q_est.inverse() * tgt
        v = q_err.vector()
        return 2.0 * ANGLE_P * v[:3] * jnp.sign(v[3])

    @el.map
    def rate_loop(
        sp: AngVelSetpoint, gyro: sn.Gyro, s: RatePidState
    ) -> tuple[RatePidState, TorqueDemand]:
        """Body-rate PID on the (filtered, biased) gyro measurement."""
        e = sp - gyro
        i = jnp.clip(s[:3] + e * CTRL_DT, -I_LIMIT, I_LIMIT)
        d = jnp.clip((e - s[3:]) / CTRL_DT, -50.0, 50.0)
        return jnp.concatenate([i, e]), RATE_P * e + RATE_I * i + RATE_D * d

    @el.map
    def mixer(
        pos: el.WorldPos,
        vel: el.WorldVel,
        alt_sp: AltSetpoint,
        demand: TorqueDemand,
    ) -> motors_mod.MotorPwm:
        """Quad-X mixing (exact geometry inverse) + altitude-hold collective."""
        collective = (
            HOVER_THRUST_N
            + (ALT_P * (alt_sp - pos.linear()[2]) - ALT_D * vel.linear()[2]) / 4.0
        )
        per_motor = (
            collective
            + demand[0] * motors_mod.MOTOR_POS[:, 1] / arm2  # roll
            - demand[1] * motors_mod.MOTOR_POS[:, 0] / arm2  # pitch
            + demand[2] * motors_mod.SPIN / (4.0 * kq_over_kt)  # yaw (reaction)
        )
        thrust_cmd = jnp.clip(per_motor, 0.0, MAX_MOTOR_THRUST_N)
        rpm_cmd = jnp.sqrt(thrust_cmd / motors_mod.KT_THRUST)
        return (
            motors_mod.PWM_MIN
            + jnp.clip(rpm_cmd / motors_mod.RPM_MAX, 0.0, 1.0)
            * (motors_mod.PWM_MAX - motors_mod.PWM_MIN)
        )

    return update_target | angle_loop | rate_loop | mixer
