"""Quad-X drone: motor mixing + cascaded angle/rate PID + altitude hold.

Parity target: reference examples/drone (multi-file EDU-450 sim with rate
PID cascade, motor thrust curves, and mixing).  This single-file build keeps
the same control architecture — angle P loop -> body-rate PID -> quad-X
mixer -> per-motor thrust with first-order lag — plus altitude PID, running
at 300 Hz under RK4."""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
from jax.numpy import linalg as la

SIMULATION_RATE = 300.0
SIM_TIME_STEP = 1.0 / SIMULATION_RATE

MASS = 1.0
INERTIA_DIAG = jnp.array([0.1, 0.1, 0.2])
ARM = 0.24
K_YAW = 0.02  # yaw torque per thrust
MAX_MOTOR_THRUST = 6.0  # N each
MOTOR_TC = 0.05  # first-order motor lag, s

# quad-X geometry: (front-right CCW, rear-left CCW, front-left CW, rear-right CW)
_ang = jnp.pi * jnp.array([0.25, -0.75, 0.75, -0.25])
MOTOR_POS = jnp.stack(
    [ARM * jnp.cos(_ang), ARM * jnp.sin(_ang), jnp.zeros(4)], axis=-1
)
MOTOR_SPIN = jnp.array([1.0, 1.0, -1.0, -1.0])  # CCW +, CW -

RATE_P = jnp.array([0.40, 0.40, 2.50])
RATE_I = jnp.array([0.02, 0.02, 0.02])
RATE_D = jnp.array([0.05, 0.05, 0.01])
ANGLE_P = jnp.array([4.0, 4.0, 1.0])
ALT_P, ALT_D = 6.0, 4.0

MotorCmd = ty.Annotated[
    jax.Array, el.Component("motor_cmd", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
MotorThrust = ty.Annotated[
    jax.Array, el.Component("motor_thrust", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
RateSetpoint = ty.Annotated[
    jax.Array, el.Component("rate_setpoint", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
RatePidState = ty.Annotated[
    jax.Array, el.Component("rate_pid_state", el.ComponentType(el.PrimitiveType.F64, (6,)))
]
AttSetpoint = ty.Annotated[el.Quaternion, el.Component("att_setpoint")]
AltSetpoint = ty.Annotated[jax.Array, el.Component("alt_setpoint", el.ComponentType.F64)]


@el.dataclass
class Drone(el.Archetype):
    motor_cmd: MotorCmd = field(default_factory=lambda: jnp.zeros(4))
    motor_thrust: MotorThrust = field(default_factory=lambda: jnp.zeros(4))
    rate_setpoint: RateSetpoint = field(default_factory=lambda: jnp.zeros(3))
    rate_pid_state: RatePidState = field(default_factory=lambda: jnp.zeros(6))
    att_setpoint: AttSetpoint = field(default_factory=el.Quaternion.identity)
    alt_setpoint: AltSetpoint = field(default_factory=lambda: jnp.float64(2.0))


@el.map
def angle_loop(pos: el.WorldPos, goal: AttSetpoint) -> RateSetpoint:
    """P on the quaternion attitude error -> body rate setpoint."""
    q_err = pos.angular().inverse() * goal
    v = q_err.vector()
    sign = jnp.sign(v[3])
    return ANGLE_P * v[:3] * sign * 2.0


@el.map
def rate_loop(
    pos: el.WorldPos, vel: el.WorldVel, sp: RateSetpoint, s: RatePidState
) -> tuple[RatePidState, MotorCmd]:
    omega_body = pos.angular().inverse() @ vel.angular()
    e = sp - omega_body
    i = jnp.clip(s[:3] + e * SIM_TIME_STEP, -0.4, 0.4)
    d = (e - s[3:]) / SIM_TIME_STEP
    torque_demand = RATE_P * e + RATE_I * i + RATE_D * jnp.clip(d, -50.0, 50.0)

    # altitude hold baseline collective (computed in altitude_loop via cmd add)
    # quad-X mixing: roll (y moment), pitch (x moment), yaw (z moment)
    mix = (
        torque_demand[0] * MOTOR_POS[:, 1] / ARM
        - torque_demand[1] * MOTOR_POS[:, 0] / ARM
        + torque_demand[2] * MOTOR_SPIN * K_YAW / 0.02
    )
    return jnp.concatenate([i, e]), mix


@el.map
def altitude_loop(
    pos: el.WorldPos, vel: el.WorldVel, alt_sp: AltSetpoint, cmd: MotorCmd
) -> MotorCmd:
    e = alt_sp - pos.linear()[2]
    collective = MASS * 9.81 / 4.0 + (ALT_P * e - ALT_D * vel.linear()[2]) / 4.0
    return jnp.clip(cmd + collective, 0.0, MAX_MOTOR_THRUST)


@el.map
def motor_dynamics(cmd: MotorCmd, thrust: MotorThrust) -> MotorThrust:
    alpha = SIM_TIME_STEP / (MOTOR_TC + SIM_TIME_STEP)
    return thrust + alpha * (cmd - thrust)


@el.map
def motor_forces(pos: el.WorldPos, thrust: MotorThrust, f: el.Force) -> el.Force:
    total = jnp.sum(thrust)
    thrust_body = jnp.array([0.0, 0.0, total])
    # moments: r x F per motor + spin yaw torque
    torque_body = jnp.sum(
        jnp.cross(MOTOR_POS, jnp.stack([jnp.zeros(4), jnp.zeros(4), thrust], axis=-1)),
        axis=0,
    ) + jnp.array([0.0, 0.0, jnp.sum(MOTOR_SPIN * thrust) * K_YAW])
    q = pos.angular()
    return f + el.SpatialForce(linear=q @ thrust_body, torque=q @ torque_body)


@el.map
def gravity_drag(vel: el.WorldVel, f: el.Force) -> el.Force:
    drag = -0.1 * la.norm(vel.linear()) * vel.linear()
    return f + el.SpatialForce(linear=jnp.array([0.0, 0.0, -9.81 * MASS]) + drag)


def build_world(tilt_deg: float = 20.0) -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(
                    angular=el.Quaternion.from_axis_angle(
                        jnp.array([1.0, 0.0, 0.0]), jnp.radians(tilt_deg)
                    ),
                    linear=jnp.array([0.0, 0.0, 2.0]),
                ),
                inertia=el.SpatialInertia(MASS, INERTIA_DIAG),
            ),
            Drone(),
        ],
        name="drone",
    )
    return w


def build_system() -> el.System:
    control = angle_loop | rate_loop | altitude_loop | motor_dynamics
    effectors = motor_forces | gravity_drag
    return control | el.six_dof(sys=effectors, integrator=el.Integrator.Rk4)


if __name__ == "__main__":
    w = build_world()
    w.run(build_system(), simulation_rate=SIMULATION_RATE, max_ticks=int(30 * SIMULATION_RATE))
