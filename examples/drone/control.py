"""Cascaded flight controller flying on the ESTIMATOR, not truth.

Parity target: reference examples/drone/control.py — the full ArduPilot-style
stack: sqrt-controller input shaping of the pilot command into an
acceleration-limited attitude/euler-rate target (reference :53-101,
:219-260), tilt-priority attitude error with rate feedforward blended out as
the thrust-vector error grows (reference :128-162, :263-317), and a
body-rate PID with per-axis target/error/derivative low-pass filters from
the ATC_RAT_*_FLT* parameter set (reference :174-206) — with one deliberate
upgrade over the reference: the angle loop closes on the MEKF attitude
estimate (the reference's angle loop reads true attitude; its rate loop
already flies on the gyro).  Altitude hold uses true altitude — the
estimator has no baro/GNSS channel yet, same as the reference's TODO.

All shaping/error math lives in shaping.py and is branchless, so the whole
FSW tick fuses into straight-line XLA and vmaps over batched campaigns.

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

# Above this thrust-vector error the rate feedforward starts blending out;
# at twice it the controller is tilt-only (reference
# AC_ATTITUDE_THRUST_ERROR_ANGLE = 30 deg).
THRUST_ERROR_ANGLE = jnp.radians(30.0)

_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))

AngleDesired = ty.Annotated[
    jax.Array,
    el.Component("angle_desired", _F3, metadata={"element_names": "roll,pitch,yaw_rate"}),
]
AttTarget = ty.Annotated[el.Quaternion, el.Component("attitude_target")]
EulerRateTarget = ty.Annotated[
    jax.Array,
    el.Component("euler_rate_target", _F3, metadata={"element_names": "r,p,y"}),
]
AngVelSetpoint = ty.Annotated[jax.Array, el.Component("ang_vel_setpoint", _F3)]
RatePidState = ty.Annotated[
    jax.Array,
    el.Component(
        "rate_pid_state",
        el.ComponentType(el.PrimitiveType.F64, (3, 3)),
        metadata={"element_names": "e.r,e.p,e.y,i.r,i.p,i.y,d.r,d.p,d.y"},
    ),
]
TorqueDemand = ty.Annotated[jax.Array, el.Component("torque_demand", _F3)]
AltSetpoint = ty.Annotated[jax.Array, el.Component("alt_setpoint", el.ComponentType.F64)]


@el.dataclass
class AttitudeController(el.Archetype):
    angle_desired: AngleDesired = field(default_factory=lambda: jnp.zeros(3))
    attitude_target: AttTarget = field(default_factory=el.Quaternion.identity)
    euler_rate_target: EulerRateTarget = field(default_factory=lambda: jnp.zeros(3))
    ang_vel_setpoint: AngVelSetpoint = field(default_factory=lambda: jnp.zeros(3))
    rate_pid_state: RatePidState = field(default_factory=lambda: jnp.zeros((3, 3)))
    torque_demand: TorqueDemand = field(default_factory=lambda: jnp.zeros(3))
    alt_setpoint: AltSetpoint = field(default_factory=lambda: jnp.float64(2.0))


def make_systems(sn, mekf_mod, motors_mod, filt_mod=None, shp=None, prm=None):
    """Control stack factory (runs at the 300 Hz control rate)."""
    if shp is None or prm is None or filt_mod is None:
        raise TypeError("make_systems needs the filter, shaping and params modules")
    arm2 = 2.0 * motors_mod.ARM_M**2  # sum of y_i^2 (= sum of x_i^2), quad-X
    kq_over_kt = motors_mod.KQ_TORQUE / motors_mod.KT_THRUST
    accel_body = prm.accel_limits_rad_s2()
    t_filter = filt_mod.LPF(prm.FLTT, 1.0 / CTRL_DT)
    e_filter = filt_mod.LPF(prm.FLTE, 1.0 / CTRL_DT)
    d_filter = filt_mod.LPF(prm.FLTD, 1.0 / CTRL_DT)

    @el.map
    def update_target(
        angle: AngleDesired, tgt: AttTarget, rate_tgt: EulerRateTarget
    ) -> tuple[AttTarget, EulerRateTarget]:
        """Shape the pilot command into an accel-limited moving target.

        Roll/pitch angle errors go through the sqrt controller; the yaw
        channel slews toward the commanded rate.  The target quaternion then
        integrates the shaped euler rates, so the attitude loop always
        chases a trajectory the airframe can actually follow.
        """
        euler_tgt = shp.quat_to_euler(tgt)
        lim = shp.angular_to_euler_accel_limit(tgt, accel_body)
        # roll/pitch shaped as ONE (2,) chain: shaping is elementwise, and
        # two separate scalar chains cost ~2x the fusion thunks in this
        # dispatch-bound 1-entity tick (docs/PERFORMANCE.md)
        rp_rate = shp.shape_angle(
            shp.normalize_angle(angle[:2] - euler_tgt[:2]),
            rate_tgt[:2], lim[:2], CTRL_DT, prm.ATC_INPUT_TC,
        )
        yaw_rate = shp.shape_rate(
            rate_tgt[2], angle[2], lim[2], CTRL_DT, prm.PILOT_Y_RATE_TC
        )
        new_rate_tgt = jnp.concatenate([rp_rate, yaw_rate[None]])
        omega = jnp.nan_to_num(shp.euler_to_angular_rate(tgt, new_rate_tgt))
        return tgt.integrate_body(omega * CTRL_DT), new_rate_tgt

    @el.map
    def attitude_loop(
        q_est: mekf_mod.AttEst,
        tgt: AttTarget,
        rate_tgt: EulerRateTarget,
        gyro: sn.Gyro,
        prev_sp: AngVelSetpoint,
    ) -> AngVelSetpoint:
        """Tilt-priority P on the estimated attitude + blended feedforward.

        The error splits into thrust-vector tilt (corrected first) and
        heading twist; the shaped target rates feed forward while the tilt
        error is small and wash out linearly to zero by twice
        THRUST_ERROR_ANGLE, where yaw holds the current gyro rate instead of
        fighting for authority the tilt correction needs.
        """
        att_err, tilt_angle = shp.tilt_heading_error(tgt, q_est)
        p_term = ANGLE_P * att_err
        ff_world = jnp.nan_to_num(shp.euler_to_angular_rate(tgt, rate_tgt))
        ff_body = (q_est.inverse() * tgt) @ ff_world
        s = jnp.clip(1.0 - (tilt_angle - THRUST_ERROR_ANGLE) / THRUST_ERROR_ANGLE, 0.0, 1.0)
        sp_xy = p_term[:2] + ff_body[:2] * s
        sp_z = gyro[2] * (1.0 - s) + (p_term[2] + ff_body[2]) * s
        raw = jnp.concatenate([sp_xy, sp_z[None]])
        return t_filter.apply(prev_sp, raw)

    @el.map
    def rate_loop(
        sp: AngVelSetpoint, gyro: sn.Gyro, s: RatePidState
    ) -> tuple[RatePidState, TorqueDemand]:
        """Body-rate PID on the (biquad-filtered, biased) gyro measurement,
        with the ATC_RAT per-axis error/derivative low-pass filters."""
        e_prev, i_prev, d_prev = s
        e = e_filter.apply(e_prev, sp - gyro)
        i = jnp.clip(i_prev + e * CTRL_DT, -I_LIMIT, I_LIMIT)
        d = d_filter.apply(d_prev, jnp.clip((e - e_prev) / CTRL_DT, -50.0, 50.0))
        return jnp.stack([e, i, d]), RATE_P * e + RATE_I * i + RATE_D * d

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

    return update_target | attitude_loop | rate_loop | mixer
