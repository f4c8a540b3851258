"""Finned sounding rocket with table-driven aerodynamics and a pitch
acceleration PID driving fin deflection.

Parity target: reference examples/rocket/main.py — ISA atmosphere lookup,
trilinear aero-coefficient interpolation via map_coordinates over a
(coef, Mach, Delta, Alphac) grid, thrust curve, butterworth-filtered
acceleration feedback, rolling buffer component, external fin trim.  The
aero table here is generated from analytic fin/body coefficient formulas on
the same grid axes (the reference embeds a wind-tunnel-style table inline).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
import jax.numpy.linalg as la
import numpy as onp
from jax.scipy.ndimage import map_coordinates  # noqa: F401 — kept for parity

from elodin_tpu.ops.interp import interp as el_interp
from elodin_tpu.ops.interp import lerp_nd

SIM_TIME_STEP = 1.0 / 120.0
lp_sample_freq = round(1.0 / SIM_TIME_STEP)
lp_buffer_size = lp_sample_freq * 4
lp_cutoff_freq = 1

thrust_vector_body_frame = jnp.array([-1.0, 0.0, 0.0])
a_ref = 24.89130 / 100**2
l_ref = 5.43400 / 100
xmc = 0.40387
pitch_pid = [1.1, 0.8, 3.8]

# -- components --------------------------------------------------------------

Wind = ty.Annotated[
    jax.Array,
    el.Component("wind", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "x,y,z"}),
]
AeroCoefs = ty.Annotated[
    jax.Array,
    el.Component("aero_coefs", el.ComponentType(el.PrimitiveType.F64, (6,)),
                 metadata={"element_names": "Cl,CnR,CmR,CA,CZR,CYR"}),
]
AeroForce = ty.Annotated[
    el.SpatialForce,
    el.Component("aero_force", el.ComponentType.SpatialMotionF64,
                 metadata={"element_names": "τx,τy,τz,x,y,z"}),
]
CenterOfGravity = ty.Annotated[
    jax.Array, el.Component("center_of_gravity", el.ComponentType.F64)
]
DynamicPressure = ty.Annotated[
    jax.Array, el.Component("dynamic_pressure", el.ComponentType.F64)
]
AngleOfAttack = ty.Annotated[jax.Array, el.Component("angle_of_attack", el.ComponentType.F64)]
Mach = ty.Annotated[jax.Array, el.Component("mach", el.ComponentType.F64)]
Motor = ty.Annotated[jax.Array, el.Component("rocket_motor", el.ComponentType.F64)]
FinControl = ty.Annotated[jax.Array, el.Component("fin_control", el.ComponentType.F64)]
FinDeflect = ty.Annotated[jax.Array, el.Component("fin_deflect", el.ComponentType.F64)]
FinControlTrim = ty.Annotated[
    jax.Array,
    el.Component("fin_control_trim", el.ComponentType.F64,
                 metadata={"external_control": "true", "wait_for_write": "false"}),
]
VBody = ty.Annotated[
    jax.Array,
    el.Component("v_body", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "u,v,w"}),
]
VRelAccel = ty.Annotated[
    jax.Array,
    el.Component("v_rel_accel", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "x,y,z", "priority": 20}),
]
VRelAccelBuffer = ty.Annotated[
    jax.Array,
    el.Component("v_rel_accel_buffer",
                 el.ComponentType(el.PrimitiveType.F64, (lp_buffer_size, 3)),
                 metadata={"priority": -1}),
]
VRelAccelFiltered = ty.Annotated[
    jax.Array,
    el.Component("v_rel_accel_filtered", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "x,y,z", "priority": 19}),
]
PitchPID = ty.Annotated[
    jax.Array,
    el.Component("pitch_pid", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "Kp,Ki,Kd"}),
]
PitchPIDState = ty.Annotated[
    jax.Array,
    el.Component("pitch_pid_state", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "e,i,d"}),
]
AccelSetpoint = ty.Annotated[
    jax.Array,
    el.Component("accel_setpoint", el.ComponentType(el.PrimitiveType.F64, (2,)),
                 metadata={"element_names": "p,y"}),
]
AccelSetpointSmooth = ty.Annotated[
    jax.Array,
    el.Component("accel_setpoint_smooth", el.ComponentType(el.PrimitiveType.F64, (2,)),
                 metadata={"element_names": "p,y"}),
]
Thrust = ty.Annotated[jax.Array, el.Component("thrust", el.ComponentType.F64)]

# -- aero table (analytic surrogate on the reference's grid axes) -----------

MACH_GRID = onp.array([0.1, 0.5, 0.9])
DELTA_GRID = onp.array([-40.0, -20.0, 0.0, 20.0, 40.0])
ALPHA_GRID = onp.array([0.0, 5.0, 10.0, 15.0])


def _build_aero_table() -> onp.ndarray:
    """(coef, mach, delta, alpha) grid for [CmR, CA, CZR]: slender-body +
    fin-lift analytic model with compressibility scaling."""
    m, d, a = onp.meshgrid(MACH_GRID, DELTA_GRID, ALPHA_GRID, indexing="ij")
    beta = 1.0 / onp.sqrt(onp.clip(1.0 - onp.minimum(m, 0.95) ** 2, 0.2, 1.0))
    # normal-force coefficient: body (2*alpha) + fins (lift slope * (alpha+delta))
    cn_body = 2.0 * onp.deg2rad(a) * 1.8
    cn_fins = 2.4 * beta * onp.deg2rad(a + 0.35 * d)
    czr = (cn_body + cn_fins) * 10.0
    # pitching moment about the moment center: fins act behind the CG
    cmr = (-0.9 * cn_fins + 0.45 * cn_body) * 14.0
    # axial force: base drag + induced
    ca = (0.28 + 0.004 * onp.abs(d) + 0.0025 * a + 0.12 * m**2) * (
        1.0 + 0.5 * (onp.abs(d) / 40.0) ** 2
    )
    return onp.stack([cmr, ca, czr])


AERO_TABLE = jnp.asarray(_build_aero_table())

THRUST_TIME = jnp.asarray([0.01, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 24.0, 32.0, 32.15])
THRUST_N = jnp.asarray([322.0, 180.0, 120.0, 95.0, 88.4, 88.4, 88.4, 88.4, 88.4, 0.0])


def to_coord(grid: onp.ndarray, val: jax.Array) -> jax.Array:
    return (val - grid.min()) * (len(grid) - 1) / jnp.clip(grid.max() - grid.min(), 1e-6)


def second_order_butterworth(signal, f_sampling, f_cutoff):
    """Forward 2nd-order Butterworth low-pass as a lax.scan
    (reference main.py:178-210)."""
    ff = f_cutoff / f_sampling
    ita = 1.0 / jnp.tan(jnp.pi * ff)
    q = jnp.sqrt(2.0)
    b0 = 1.0 / (1.0 + q * ita + ita**2)
    b1, b2 = 2 * b0, b0
    a1 = 2.0 * (ita**2 - 1.0) * b0
    a2 = -(1.0 - q * ita + ita**2) * b0

    def f(carry, x_i):
        x_im1, x_im2, y_im1, y_im2 = carry
        y_i = b0 * x_i + b1 * x_im1 + b2 * x_im2 + a1 * y_im1 + a2 * y_im2
        return (x_i, x_im1, y_i, y_im1), y_i

    init = (signal[1], signal[0]) * 2
    out = jax.lax.scan(f, init, signal[2:])[1]
    return jnp.concatenate((out[0:1],) * 2 + (out,))


def _butterworth_last_weights(n: int, f_sampling: float,
                              f_cutoff: float) -> onp.ndarray:
    """The filter above is linear, and the control loop only consumes its
    LAST sample — so the final output is a fixed linear functional of the
    buffer.  Running the identical recurrence over an identity matrix in
    numpy at import time yields the weight vector; per tick the filter then
    costs one (n,)·(n,3) contraction instead of an (n-2)-step sequential
    lax.scan, which is the TPU-friendly formulation (the scan serializes
    ~478 tiny steps per tick and dominated the batched-rocket profile)."""
    ff = f_cutoff / f_sampling
    ita = 1.0 / onp.tan(onp.pi * ff)
    q = onp.sqrt(2.0)
    b0 = 1.0 / (1.0 + q * ita + ita**2)
    b1, b2 = 2 * b0, b0
    a1 = 2.0 * (ita**2 - 1.0) * b0
    a2 = -(1.0 - q * ita + ita**2) * b0
    x = onp.eye(n)  # column j tracks sample j's contribution
    x_im1, x_im2 = x[1], x[0]
    y_im1, y_im2 = x[1], x[0]
    for i in range(2, n):
        y = b0 * x[i] + b1 * x_im1 + b2 * x_im2 + a1 * y_im1 + a2 * y_im2
        x_im1, x_im2 = x[i], x_im1
        y_im1, y_im2 = y, y_im1
    return y_im1


_BUTTER_LAST_W = _butterworth_last_weights(
    lp_buffer_size, lp_sample_freq, lp_cutoff_freq
)


def euler_to_quat(angles_deg: jax.Array) -> el.Quaternion:
    return el.Quaternion.from_euler(jnp.deg2rad(angles_deg))


def quat_from_vecs(v1, v2) -> el.Quaternion:
    v1 = v1 / la.norm(v1)
    v2 = v2 / la.norm(v2)
    n = jnp.cross(v1, v2)
    w = jnp.dot(v2, v2) * jnp.dot(v1, v1) + jnp.dot(v1, v2)
    # anti-parallel inputs give n = 0, w = 0 — a zero quaternion whose
    # normalize() is NaN and would poison the accel buffer + PID for the
    # rest of the run; fall back to a 180-degree flip about an axis
    # orthogonal to v1
    degenerate = (w * w + jnp.dot(n, n)) < 1e-12
    ortho = jnp.cross(v1, jnp.array([1.0, 0.0, 0.0]))
    ortho = jnp.where(
        jnp.dot(ortho, ortho) < 1e-12,
        jnp.cross(v1, jnp.array([0.0, 1.0, 0.0])),
        ortho,
    )
    q = jnp.where(
        degenerate, jnp.concatenate([ortho, jnp.zeros(1)]), jnp.array([*n, w])
    )
    return el.Quaternion.from_array(q).normalize()


@el.dataclass
class Rocket(el.Archetype):
    angle_of_attack: AngleOfAttack = field(default_factory=lambda: jnp.float64(0.0))
    aero_coefs: AeroCoefs = field(default_factory=lambda: jnp.zeros(6))
    center_of_gravity: CenterOfGravity = field(default_factory=lambda: jnp.float64(0.2))
    mach: Mach = field(default_factory=lambda: jnp.float64(0.0))
    dynamic_pressure: DynamicPressure = field(default_factory=lambda: jnp.float64(0.0))
    aero_force: AeroForce = field(default_factory=lambda: el.SpatialForce())
    wind: Wind = field(default_factory=lambda: jnp.zeros(3))
    motor: Motor = field(default_factory=lambda: jnp.float64(0.0))
    fin_deflect: FinDeflect = field(default_factory=lambda: jnp.float64(0.0))
    fin_control: FinControl = field(default_factory=lambda: jnp.float64(0.0))
    fin_control_trim: FinControlTrim = field(default_factory=lambda: jnp.float64(0.0))
    v_body: VBody = field(default_factory=lambda: jnp.zeros(3))
    v_rel_accel_buffer: VRelAccelBuffer = field(
        default_factory=lambda: jnp.zeros((lp_buffer_size, 3))
    )
    v_rel_accel: VRelAccel = field(default_factory=lambda: jnp.zeros(3))
    v_rel_accel_filtered: VRelAccelFiltered = field(default_factory=lambda: jnp.zeros(3))
    pitch_pid: PitchPID = field(default_factory=lambda: jnp.array(pitch_pid))
    pitch_pid_state: PitchPIDState = field(default_factory=lambda: jnp.zeros(3))
    accel_setpoint: AccelSetpoint = field(default_factory=lambda: jnp.zeros(2))
    accel_setpoint_smooth: AccelSetpointSmooth = field(default_factory=lambda: jnp.zeros(2))
    thrust: Thrust = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def gravity(f: el.Force, inertia: el.Inertia) -> el.Force:
    return f + el.SpatialForce(linear=jnp.array([0.0, 0.0, -9.81]) * inertia.mass())


# International Standard Atmosphere layers (public data)
_ISA = {
    "h": jnp.array([0.0, 11e3, 20e3, 32e3, 47e3, 51e3, 71e3, 84_852.0]),
    "T": jnp.array([15.0, -56.5, -56.5, -44.5, -2.5, -2.5, -58.5, -86.2]),
    "d": jnp.array([1.225, 0.3639, 0.0880, 0.0132, 0.0014, 0.0009, 0.0001, 0.0]),
}


@el.map
def mach(p: el.WorldPos, v: el.WorldVel, w: Wind) -> tuple[Mach, DynamicPressure]:
    altitude = p.linear()[2]
    temperature = el_interp(altitude, _ISA["h"], _ISA["T"]) + 273.15
    density = el_interp(altitude, _ISA["h"], _ISA["d"])
    speed_of_sound = jnp.sqrt(1.4 * 287.05 * temperature)
    v_flow = la.norm(v.linear() - w)
    return v_flow / speed_of_sound, jnp.clip(0.5 * density * v_flow**2, 1e-6)


@el.map
def compute_v_body(p: el.WorldPos, v: el.WorldVel, w: Wind) -> VBody:
    return p.angular().inverse() @ (v.linear() - w)


@el.map
def angle_of_attack(p: el.WorldPos, v: el.WorldVel, w: Wind) -> AngleOfAttack:
    u = p.angular().inverse() @ (v.linear() - w)
    cos = jnp.dot(u, thrust_vector_body_frame) / jnp.clip(la.norm(u), 1e-6)
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0))) * -jnp.sign(u[2])


@el.map
def aero_coefs(
    mach: Mach,
    angle_of_attack: AngleOfAttack,
    fin_deflect: FinDeflect,
    fin_trim: FinControlTrim,
) -> AeroCoefs:
    effective = jnp.clip(fin_deflect + fin_trim, -40.0, 40.0)
    aoa_sign = jax.lax.cond(
        jnp.abs(angle_of_attack) < 1e-6,
        lambda _: 1.0,
        lambda _: jnp.sign(angle_of_attack),
        operand=None,
    )
    effective = effective * aoa_sign
    coords = [
        to_coord(MACH_GRID, mach),
        to_coord(DELTA_GRID, effective),
        to_coord(ALPHA_GRID, jnp.abs(angle_of_attack)),
    ]
    # gather-free multilinear lookup — identical to
    # map_coordinates(c, coords, 1, mode="nearest") on this clamped grid,
    # but dense (no dynamic gathers; see elodin_tpu/ops/interp.py)
    coefs = jnp.array([lerp_nd(c, coords) for c in AERO_TABLE])
    cl = fin_trim * 0.1
    return jnp.array([cl, 0.0, coefs[0] * aoa_sign, coefs[1], coefs[2] * aoa_sign, 0.0])


@el.map
def aero_forces(aero_coefs: AeroCoefs, xcg: CenterOfGravity, q: DynamicPressure) -> AeroForce:
    Cl, CnR, CmR, CA, CZR, CYR = aero_coefs
    CmR = CmR - CZR * (xcg - xmc) / l_ref
    CnR = CnR - CYR * (xcg - xmc) / l_ref
    lin = jnp.array([CA, CYR, CZR]) * q * a_ref
    torque = jnp.array([Cl, -CmR, CnR]) * q * a_ref * l_ref
    return el.SpatialForce(linear=lin, torque=torque)


@el.map
def apply_aero_forces(p: el.WorldPos, f_aero: AeroForce, f: el.Force) -> el.Force:
    return f + p.angular() @ f_aero


@el.system
def thrust(
    tick: el.Query[el.SimulationTick],
    dt: el.Query[el.SimulationTimeStep],
    q: el.Query[Motor],
) -> el.Query[Thrust]:
    t = tick[0] * dt[0]
    f_t = el_interp(t, THRUST_TIME, THRUST_N)
    return q.map(Thrust, lambda _: f_t)


@el.map
def apply_thrust(thrust: Thrust, f: el.Force, p: el.WorldPos) -> el.Force:
    return f + el.SpatialForce(linear=p.angular() @ thrust_vector_body_frame * thrust)


@el.map
def v_rel_accel(v: el.WorldVel, a: el.WorldAccel) -> VRelAccel:
    vv = jax.lax.cond(
        la.norm(v.linear()) < 1e-6,
        lambda _: thrust_vector_body_frame,
        lambda _: v.linear(),
        operand=None,
    )
    v_rot = quat_from_vecs(thrust_vector_body_frame, vv)
    return v_rot.inverse() @ a.linear()


@el.map
def v_rel_accel_buffer(a_rel: VRelAccel, buffer: VRelAccelBuffer) -> VRelAccelBuffer:
    return jnp.concatenate((buffer[1:], a_rel.reshape(1, 3)))


@el.map
def v_rel_accel_filtered(s: VRelAccelBuffer) -> VRelAccelFiltered:
    # identical math to second_order_butterworth(s, ...)[-1] — see
    # _butterworth_last_weights for why the last sample is a fixed linear
    # functional of the buffer.  Written as multiply+reduce rather than
    # `w @ s`: the dot form lowers onto the MXU, whose f64-emulation
    # accumulates differently enough from CPU to break the 1e-6
    # TPU-vs-CPU trajectory gate; the elementwise form stays on the VPU's
    # double-double path and matches to ~1e-13
    return jnp.sum(_BUTTER_LAST_W[:, None] * s, axis=0)


@el.map
def accel_setpoint_smooth(a: AccelSetpoint, a_s: AccelSetpointSmooth) -> AccelSetpointSmooth:
    # first-order lag toward the setpoint, tau = 2 s: the step fraction is
    # 1 - exp(-dt/tau) (using exp(-dt/tau) itself would jump 99.6% per
    # tick — a pass-through that defeats the smoother and kicks the PID's
    # derivative term on every setpoint step)
    return a_s + (a - a_s) * (1.0 - jnp.exp(-0.5 * SIM_TIME_STEP))


@el.map
def pitch_pid_state(
    a_setpoint: AccelSetpointSmooth, a_rel: VRelAccelFiltered, s: PitchPIDState
) -> PitchPIDState:
    e = a_rel[2] - a_setpoint[0]
    i = jnp.clip(s[1] + e * SIM_TIME_STEP * 2, -2.0, 2.0)
    d = e - s[0]
    return jnp.array([e, i, d])


@el.map
def pitch_pid_control(pid: PitchPID, s: PitchPIDState) -> FinControl:
    Kp, Ki, Kd = pid
    e, i, d = s
    return (Kp * e + Ki * i + Kd * d) * SIM_TIME_STEP


@el.map
def fin_control(fd: FinDeflect, fc: FinControl, mach: Mach) -> FinDeflect:
    fc = jnp.clip(fc / (0.1 + mach), -0.2, 0.2)
    return jnp.clip(fd + fc, -40.0, 40.0)


def build_world() -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(
                    angular=euler_to_quat(jnp.array([0.0, 70.0, 0.0])),
                    linear=jnp.array([0.0, 0.0, 1.0]),
                ),
                inertia=el.SpatialInertia(3.0, jnp.array([0.1, 1.0, 1.0])),
            ),
            Rocket(),
        ],
        name="Rocket",
        id="rocket",
    )
    return w


def build_system() -> el.System:
    effectors = (
        gravity
        | mach
        | compute_v_body
        | angle_of_attack
        | aero_coefs
        | aero_forces
        | apply_aero_forces
        | thrust
        | apply_thrust
    )
    control = (
        v_rel_accel
        | v_rel_accel_buffer
        | v_rel_accel_filtered
        | accel_setpoint_smooth
        | pitch_pid_state
        | pitch_pid_control
        | fin_control
    )
    return control | el.six_dof(sys=effectors, integrator=el.Integrator.Rk4)


if __name__ == "__main__":
    w = build_world()
    w.run(build_system(), simulation_rate=1.0 / SIM_TIME_STEP, max_ticks=120 * 40)
