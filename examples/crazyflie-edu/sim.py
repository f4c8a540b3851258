"""Crazyflie 2.1 plant + firmware-style cascade
(parity: examples/crazyflie-edu/{sim.py,firmware,user_code.c} — a 500 Hz
quad-X plant with first-order motor dynamics and the student-lab control
cascade: position P -> velocity PI -> attitude P -> rate PID -> mixer.

The reference runs student C code (user_code.c) against the plant over SITL;
here the same cascade is the in-graph "firmware" so the whole closed loop is
one jitted program, and the lab's setpoint schedule (takeoff, square, land)
is a pure function of time.)
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
import numpy as np
from jax.numpy import linalg as la

from config import (
    G0,
    HOVER_THRUST_PER_MOTOR_N,
    INERTIA,
    MASS_KG,
    MAX_OMEGA_RADPS,
    MOTOR_POS,
    MOTOR_TAU_S,
    MOTOR_YAW_SIGN,
    SIM_RATE_HZ,
    SIM_TIME_STEP,
    THRUST_CONSTANT,
    TORQUE_CONSTANT,
    mixing_matrix,
)

MotorOmega = ty.Annotated[
    jax.Array,
    el.Component("motor_omega", el.ComponentType(el.PrimitiveType.F64, (4,))),
]
MotorCmd = ty.Annotated[
    jax.Array,
    el.Component("motor_cmd", el.ComponentType(el.PrimitiveType.F64, (4,))),
]
VelInt = ty.Annotated[
    jax.Array, el.Component("vel_integral", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
Setpoint = ty.Annotated[
    jax.Array, el.Component("setpoint", el.ComponentType(el.PrimitiveType.F64, (3,)))
]

_MIX = mixing_matrix()

# lab flight plan: (t_start, x, y, z) waypoints — takeoff, square, land
WAYPOINTS = np.array(
    [
        [0.0, 0.0, 0.0, 0.6],
        [3.0, 0.6, 0.0, 0.6],
        [6.0, 0.6, 0.6, 0.6],
        [9.0, 0.0, 0.6, 0.6],
        [12.0, 0.0, 0.0, 0.6],
        [15.0, 0.0, 0.0, 0.05],
    ]
)


@el.dataclass
class Crazyflie(el.Archetype):
    motor_omega: MotorOmega = field(default_factory=lambda: jnp.zeros(4))
    motor_cmd: MotorCmd = field(default_factory=lambda: jnp.zeros(4))
    vel_integral: VelInt = field(default_factory=lambda: jnp.zeros(3))
    setpoint: Setpoint = field(default_factory=lambda: jnp.zeros(3))


@el.system
def lab_schedule(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[Setpoint],
) -> el.Query[Setpoint]:
    """Waypoint lookup as a pure function of time (keyboard_controller.py's
    scripted-lab mode)."""
    t = tick[0] * ts[0]
    wp = jnp.asarray(WAYPOINTS)
    idx = jnp.clip(jnp.searchsorted(wp[:, 0], t, side="right") - 1, 0, len(WAYPOINTS) - 1)
    return q.map(Setpoint, lambda _s: wp[idx, 1:])


@el.system
def firmware(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[el.WorldPos, el.WorldVel, Setpoint, VelInt, MotorCmd],
) -> el.Query[MotorCmd, VelInt]:
    """The student cascade (user_code.c labs 1-4): position P, velocity PI,
    attitude P, rate P, mixed to motor thrust commands."""
    dt = ts[0]

    def one(pos, vel, sp, integ, _cmd):
        r = pos.linear()
        v = vel.linear()
        q_att = pos.angular()
        omega_b = vel.angular()

        # position -> velocity setpoint
        v_sp = jnp.clip(1.4 * (sp - r), -0.8, 0.8)
        err_v = v_sp - v
        integ_new = jnp.clip(integ + err_v * dt, -0.5, 0.5)
        a_cmd = 4.0 * err_v + 1.2 * integ_new + jnp.array([0.0, 0.0, G0])

        # acceleration -> attitude setpoint (tilt) + collective thrust
        thrust = MASS_KG * la.norm(a_cmd)
        z_des = a_cmd / (la.norm(a_cmd) + 1e-9)
        z_cur = q_att @ jnp.array([0.0, 0.0, 1.0])
        tilt_axis = jnp.cross(z_cur, z_des)
        s = la.norm(tilt_axis)
        tilt_err = jnp.arctan2(s, jnp.clip(z_cur @ z_des, -1.0, 1.0))
        axis = jnp.where(s > 1e-7, tilt_axis / (s + 1e-12), jnp.zeros(3))
        # attitude P -> body rate setpoint (world-frame axis to body frame)
        rate_sp_w = 9.0 * tilt_err * axis
        rate_sp = q_att.inverse() @ rate_sp_w
        # rate P + yaw damping -> body torques
        omega_body = q_att.inverse() @ omega_b
        torque = jnp.asarray(INERTIA) * (22.0 * (rate_sp - omega_body))
        torque = torque.at[2].add(-2e-4 * omega_body[2])

        # mix [roll, pitch, yaw, throttle] to per-motor thrusts
        arm = abs(float(MOTOR_POS[0, 0]))
        u = jnp.array(
            [
                torque[0] / (4.0 * arm),
                torque[1] / (4.0 * arm),
                torque[2] / (4.0 * TORQUE_CONSTANT / THRUST_CONSTANT),
                thrust / 4.0,
            ]
        )
        f_motor = jnp.clip(jnp.asarray(_MIX) @ u, 0.0, 4.0 * HOVER_THRUST_PER_MOTOR_N)
        omega_cmd = jnp.sqrt(f_motor / THRUST_CONSTANT)
        return jnp.clip(omega_cmd, 0.0, MAX_OMEGA_RADPS), integ_new

    return q.map((MotorCmd, VelInt), one)


@el.system
def motor_dynamics(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[MotorOmega, MotorCmd],
) -> el.Query[MotorOmega]:
    """First-order rotor spin-up (sim.py motor_dynamics)."""
    dt = ts[0]

    def one(omega, cmd):
        return omega + (cmd - omega) * (dt / MOTOR_TAU_S)

    return q.map(MotorOmega, one)


@el.map
def plant_forces(
    pos: el.WorldPos, vel: el.WorldVel, omega: MotorOmega, f: el.Force
) -> el.Force:
    """Thrust = kf*w^2 per motor along body z; reaction yaw torque km*w^2;
    linear air drag; gravity."""
    thrusts = THRUST_CONSTANT * omega * omega  # (4,)
    q_att = pos.angular()
    body_z = q_att @ jnp.array([0.0, 0.0, 1.0])
    f_total = jnp.sum(thrusts) * body_z
    # body torques: r x F + yaw reaction
    tau_body = jnp.sum(
        jnp.cross(jnp.asarray(MOTOR_POS), thrusts[:, None] * jnp.array([0.0, 0.0, 1.0])),
        axis=0,
    )
    tau_body = tau_body.at[2].add(
        jnp.sum(jnp.asarray(MOTOR_YAW_SIGN) * TORQUE_CONSTANT * omega * omega)
    )
    tau_world = q_att @ tau_body
    drag = -9e-7 * vel.linear() * la.norm(vel.linear()) - 2e-5 * vel.linear()
    gravity = MASS_KG * jnp.array([0.0, 0.0, -G0])
    return el.SpatialForce(
        linear=f.force() + f_total + drag + gravity,
        torque=f.torque() + tau_world,
    )


@el.map
def ground(pos: el.WorldPos, vel: el.WorldVel) -> tuple[el.WorldPos, el.WorldVel]:
    p = pos.linear()
    below = p[2] < 0.0
    p_new = jnp.where(below, p * jnp.array([1.0, 1.0, 0.0]), p)
    v_new = jnp.where(below, jnp.zeros(3), vel.linear())
    w_new = jnp.where(below, jnp.zeros(3), vel.angular())
    return (
        el.SpatialTransform(angular=pos.angular(), linear=p_new),
        el.SpatialMotion(angular=w_new, linear=v_new),
    )


def world() -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(linear=jnp.array([0.0, 0.0, 0.0])),
                inertia=el.SpatialInertia(mass=MASS_KG, inertia=jnp.asarray(INERTIA)),
            ),
            Crazyflie(),
        ],
        name="Crazyflie",
    )
    return w


def system() -> el.System:
    return (
        lab_schedule
        | firmware
        | motor_dynamics
        | el.six_dof(sys=plant_forces, integrator=el.Integrator.SemiImplicit)
        | ground
    )
