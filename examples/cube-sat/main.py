"""CubeSat attitude dynamics: EGM08 gravity, sun sensors, magnetometer,
MEKF attitude estimation, LQR pointing, reaction wheels.

Parity target: reference examples/cube-sat/main.py (OreSat-like vehicle in
LEO, 690 LoC).  This build reuses the framework's adcs + gravity libraries
where the reference re-derives the filters inline, and exercises: edge folds
in both directions (CSS sensors -> sat, sat -> reaction wheels via RevEdge),
EGM08 spherical-harmonic gravity, quaternion LQR, wheel saturation and
friction, and the semi-implicit integrator.
"""

from dataclasses import dataclass, field
from typing import Annotated

import elodin as el
import jax
import jax.numpy as np
from elodin import egm08
from jax.numpy import linalg as la

SIM_TIME_STEP = 1.0 / 120.0
G = 6.6743e-11
M = 5.972e24
earth_radius = 6378.1 * 1000
altitude = 400 * 1000
radius = earth_radius + altitude
velocity = np.sqrt(G * M / radius)
rw_force_clamp = 0.002

angular_vel_axis = np.array([1.0, 1.0, 1.0]) / la.norm(np.array([1.0, 1.0, 1.0]))
initial_angular_vel = angular_vel_axis * np.radians(80)

gravity_model = egm08.EGM08(16, cache_directory=el._get_cache_dir())

# -- sensors -----------------------------------------------------------------

GyroOmega = Annotated[
    jax.Array, el.Component("gyro_omega", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
MagReadingBody = Annotated[
    jax.Array, el.Component("mag_value", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
MagReadingRef = Annotated[
    jax.Array, el.Component("mag_ref", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
CssReading = Annotated[
    jax.Array, el.Component("css_reading", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
SunPos = Annotated[
    jax.Array, el.Component("sun_pos", el.ComponentType(el.PrimitiveType.F64, (3,)))
]


@dataclass
class Sensors(el.Archetype):
    gyro_omega: GyroOmega
    mag_value: MagReadingBody
    mag_ref: MagReadingRef
    css_reading: CssReading
    sun_pos: SunPos


CssValue = Annotated[
    jax.Array, el.Component("css_value", el.ComponentType(el.PrimitiveType.F64, ()))
]
CssFov = Annotated[
    jax.Array, el.Component("css_fov", el.ComponentType(el.PrimitiveType.F64, (1,)))
]
CssNormal = Annotated[
    jax.Array, el.Component("css_normal", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
CSSEdge = Annotated[el.Edge, el.Component("css_edge")]


@dataclass
class CSSRel(el.Archetype):
    edge: CSSEdge


@dataclass
class SunSensor(el.Archetype):
    value: CssValue
    fov: CssFov
    normal: CssNormal


@el.map
def sun_pos(pos: el.WorldPos) -> SunPos:
    # sun fixed along +x at 1 AU for this scenario
    return np.array([1.0, 0.0, 0.0]) * 1.496e11 - pos.linear()


@el.system
def sun_sensor(
    sensor: el.GraphQuery[CSSEdge],
    css_normal: el.Query[CssNormal, CssFov],
    sun: el.Query[SunPos, el.WorldPos],
) -> el.Query[CssValue]:
    def inner(acc, css_normal, fov, sun_pos, world_pos):
        sun_dir = sun_pos / la.norm(sun_pos)
        sun_b = world_pos.angular().inverse() @ sun_dir
        cos = np.dot(css_normal, sun_b)
        return acc + jax.lax.select((np.abs(np.acos(cos)) < fov).all(), cos, 0.0)

    return sensor.edge_fold(css_normal, sun, CssValue, np.array(0.0), inner)


@el.system
def sun_sensor_value(
    graph: el.GraphQuery[Annotated[CSSEdge, el.RevEdge]],
    sat: el.Query[el.WorldPos],
    css: el.Query[CssValue, CssNormal],
) -> el.Query[CssReading]:
    value = graph.edge_fold(
        sat,
        css,
        CssReading,
        np.array([0.0, 0.0, 0.0]),
        lambda acc, _, value, norm: acc + value * norm,
    )
    return value.map(CssReading, lambda x: x / la.norm(x))


sun_sensor_sys = sun_pos.pipe(sun_sensor).pipe(sun_sensor_value)

k_0 = np.array([-30926.00e-9, 5817.00e-9, -2318.00e-9])


@el.map
def fake_magnetometer_ref(pos: el.WorldPos) -> MagReadingRef:
    return k_0 / la.norm(k_0)


@el.map
def fake_magnetometer_body(pos: el.WorldPos, mag_ref: MagReadingRef) -> MagReadingBody:
    return pos.angular().inverse() @ mag_ref


@el.map
def gyro_omega(pos: el.WorldPos, vel: el.WorldVel) -> GyroOmega:
    return pos.angular().inverse() @ vel.angular()


sensors = sun_sensor_sys | fake_magnetometer_ref | fake_magnetometer_body | gyro_omega

# -- MEKF (via the framework adcs library) -----------------------------------

P = Annotated[jax.Array, el.Component("P", el.ComponentType(el.PrimitiveType.F64, (6, 6)))]
AttEst = Annotated[el.Quaternion, el.Component("att_est")]
AngVelEst = Annotated[
    jax.Array, el.Component("ang_vel_est", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
BiasEst = Annotated[
    jax.Array, el.Component("bias_est", el.ComponentType(el.PrimitiveType.F64, (3,)))
]

from elodin_tpu.adcs.mekf import Mekf, calculate_covariance  # noqa: E402

_sigma_g = np.array([0.01, 0.01, 0.01])
_sigma_b = np.array([0.01, 0.01, 0.01])
_Y = np.diag(np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]))
_Q = calculate_covariance(_sigma_g, _sigma_b, SIM_TIME_STEP)
_YQY = _Y @ _Q @ _Y.T


@el.map
def kalman_filter(
    p: P,
    att_est: AttEst,
    bias_est: BiasEst,
    omega: GyroOmega,
    css: CssReading,
    sun: SunPos,
    mag_body: MagReadingBody,
    mag_ref: MagReadingRef,
) -> tuple[P, AttEst, AngVelEst, BiasEst]:
    state = Mekf(
        q_hat=att_est.vector(),
        b_hat=bias_est,
        p=p,
        omega=omega,
        yqy=_YQY,
        dt=SIM_TIME_STEP,
    )
    sun_ref = sun / la.norm(sun)
    state = state.estimate_attitude(
        [css, mag_body], [sun_ref, mag_ref], [0.02, 0.03]
    )
    return (
        state.p,
        el.Quaternion(state.q_hat),
        state.omega,
        state.b_hat,
    )


@dataclass
class KalmanFilter(el.Archetype):
    p: P
    att_est: AttEst
    ang_vel_est: AngVelEst
    bias_est: BiasEst


# -- control -----------------------------------------------------------------

Goal = Annotated[el.Quaternion, el.Component("goal")]
UserGoal = Annotated[
    jax.Array, el.Component("euler_input", el.ComponentType(el.PrimitiveType.F64, (3,)))
]
ControlForce = Annotated[el.SpatialForce, el.Component("control_force")]


@dataclass
class ControlInput(el.Archetype):
    goal: Goal
    control_force: ControlForce


@dataclass
class UserInput(el.Archetype):
    deg: UserGoal


from elodin_tpu.adcs.lqr import lqr_control_mats, yang_lqr_control  # noqa: E402

j = np.array([0.13, 0.10, 0.05])
_d, _k = lqr_control_mats(j, np.array([5.0, 5.0, 5.0]), np.array([5.0, 5.0, 5.0]), np.array([8.0, 8.0, 8.0]))


@el.map
def earth_point(pos: el.WorldPos, deg: UserGoal) -> Goal:
    # nadir pointing plus a user euler offset
    lin = pos.linear()
    body_axis = np.array([0.0, 0.0, -1.0])
    r = -lin / la.norm(lin)
    rot_axis = np.cross(body_axis, r)
    s = la.norm(rot_axis)
    nadir = el.Quaternion(
        np.where(
            s > 1e-9,
            el.Quaternion.from_axis_angle(
                rot_axis / np.where(s > 1e-9, s, 1.0), np.arctan2(s, np.dot(body_axis, r))
            ).vector(),
            el.Quaternion.identity().vector(),
        )
    )
    offset = el.Quaternion.from_euler(np.radians(deg))
    return nadir * offset


@el.map
def control(att_est: AttEst, omega: AngVelEst, goal: Goal) -> ControlForce:
    torque = yang_lqr_control(att_est.vector(), omega, goal.vector(), _d, _k)
    return el.SpatialForce(torque=torque)


# -- reaction wheels ---------------------------------------------------------

RWEdge = Annotated[el.Edge, el.Component("rw_edge")]
RWAxis = Annotated[jax.Array, el.Component("rw_axis", el.ComponentType(el.PrimitiveType.F64, (3,)))]
RWForce = Annotated[el.SpatialForce, el.Component("rw_force")]
RWAngMomentum = Annotated[
    jax.Array, el.Component("rw_ang_momentum", el.ComponentType(el.PrimitiveType.F64, (3,)))
]


@el.system
def actuator_allocator(
    q: el.GraphQuery[Annotated[RWEdge, el.RevEdge]],
    rw_query: el.Query[RWAxis],
    control_query: el.Query[ControlForce],
) -> el.Query[RWForce]:
    return q.edge_fold(
        rw_query,
        control_query,
        RWForce,
        el.SpatialForce(),
        lambda xs, axis, control_force: (
            xs + el.SpatialForce(torque=np.dot(control_force.torque(), axis) * axis)
        ),
    )


@el.map
def saturate_force(force: RWForce, ang_momentum: RWAngMomentum) -> tuple[RWForce, RWAngMomentum]:
    new_h = ang_momentum + force.torque() * SIM_TIME_STEP
    torque = jax.lax.select(np.abs(new_h) < 0.04, force.torque(), np.zeros(3))
    torque = np.clip(torque, -rw_force_clamp, rw_force_clamp)
    return (el.SpatialForce(torque=torque), ang_momentum + torque * SIM_TIME_STEP)


@dataclass
class RWRel(el.Archetype):
    edge: RWEdge


@dataclass
class ReactionWheel(el.Archetype):
    axis: RWAxis
    rw_force: RWForce = field(default_factory=lambda: el.SpatialForce())
    ang_momentum: RWAngMomentum = field(default_factory=lambda: np.zeros(3))


@el.system
def rw_effector(
    rw_force: el.GraphQuery[RWEdge],
    force_query: el.Query[el.WorldPos],
    rw_query: el.Query[RWForce],
) -> el.Query[el.Force]:
    return rw_force.edge_fold(
        force_query,
        rw_query,
        el.Force,
        el.SpatialForce(),
        lambda f, pos, force: f + el.SpatialForce(torque=pos.angular() @ force.torque()),
    )


# -- gravity -----------------------------------------------------------------

Radius = Annotated[
    jax.Array, el.Component("radius", el.ComponentType(el.PrimitiveType.F64, ()))
]


@el.map
def gravity_effector(
    _: Goal,
    force: el.Force,
    a_pos: el.WorldPos,
    a_inertia: el.Inertia,
) -> tuple[el.Force, Radius]:
    pos = a_pos.linear()
    f = gravity_model.compute_field(pos[0], pos[1], pos[2], a_inertia.mass())
    return (force + el.SpatialForce(linear=f), la.norm(pos))


@dataclass
class Debug(el.Archetype):
    radius: Radius


# -- world -------------------------------------------------------------------


def build_world() -> el.World:
    w = el.World()
    sat = w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(linear=np.array([1.0, 0.0, 0.0]) * radius),
                world_vel=el.SpatialMotion(
                    initial_angular_vel, np.array([0.0, 1.0, 0.0]) * velocity
                ),
                inertia=el.SpatialInertia(2825.2 / 1000.0, j),
            ),
            ControlInput(
                el.Quaternion.from_axis_angle(np.array([1.0, 0.0, 0.0]), np.radians(0)),
                el.SpatialForce(),
            ),
            UserInput(np.array([0.0, 0.0, 0.0])),
            Sensors(np.zeros(3), np.zeros(3), np.zeros(3), np.zeros(3), np.zeros(3)),
            KalmanFilter(np.identity(6), el.Quaternion.identity(), np.zeros(3), np.zeros(3)),
            Debug(np.float64(0.0)),
        ],
        name="OreSat",
        id="ore_sat",
    )
    rws = [
        w.spawn(ReactionWheel(axis=np.array(a)), name=f"Reaction Wheel {i + 1}", id=f"rw_{i + 1}")
        for i, a in enumerate(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
    ]
    csss = [
        w.spawn(
            SunSensor(value=0.0, fov=np.radians(90), normal=np.array(n)),
            name=f"Course Sun Sensor {i}",
            id=f"css_{i}",
        )
        for i, n in enumerate(
            [
                [0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0],
                [0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [-1.0, 0.0, 0.0],
            ]
        )
    ]
    for i, rw in enumerate(rws):
        w.spawn(RWRel(el.Edge(sat, rw)), name=f"Sat -> RW {i + 1}")
    for i, css in enumerate(csss):
        w.spawn(CSSRel(el.Edge(css, sat)), name=f"CSS {i} -> Sat")
    return w


def build_system() -> el.System:
    return el.six_dof(
        sys=sensors
        | kalman_filter
        | control
        | actuator_allocator
        | saturate_force
        | rw_effector
        | gravity_effector
        | earth_point,
        integrator=el.Integrator.SemiImplicit,
    )


if __name__ == "__main__":
    w = build_world()
    w.run(
        build_system(),
        simulation_rate=1.0 / SIM_TIME_STEP,
        max_ticks=60 * 20 * 60,
    )
