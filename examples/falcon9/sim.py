"""Falcon 9 RTLS booster mission, fully in-graph
(parity target: examples/falcon9 — liftoff, gravity-turn ascent, MECO and
staging, flip, boostback burn, entry burn, aerodynamic descent, and landing
burn to a propulsive touchdown near LZ-1, simulated in the rotating ECEF
frame; reference sim.py/constants.py/propulsion.py/aero.py).

The reference runs a 1000 Hz plant closed-loop against an external Rust
flight-software process over UDP and calibrates against recorded CRS-12
telemetry.  The TPU rebuild puts the entire mission — plant, phase ladder,
and guidance — inside one jitted program so a 10k-sample dispersion campaign
is a single vmapped XLA computation instead of 10k processes:

* plant: 6-DOF ``six_dof`` integration in ECEF with gravity, Coriolis and
  centrifugal pseudo-forces, ISA-exponential drag, and a Merlin cluster
  model T(u, h) = n * (u * T_vac - p_a * A_e) with mass depletion;
* attitude: commanded thrust direction with a rate-limited kinematic slew
  (the reference closes TVC/RCS loops; dispersion studies only need the
  pointing history, not actuator states);
* guidance: the real RTLS structure — boostback burns toward the
  instantaneous-impact-point error until the ballistic arc crosses the
  landing zone, the entry burn slows retrograde until a cutoff speed, the
  landing burn is a feasibility-limited suicide burn with lateral ZEM
  correction;
* phases: integer ladder advanced by ``lax.switch``-friendly conditions —
  no Python control flow anywhere in the step.

Vehicle figures are public Falcon 9 Block 3/4 estimates (see reference
constants.py for the same numbers with provenance).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
import numpy as np
from jax.numpy import linalg as la

from elodin_tpu import frames

# --- rates -------------------------------------------------------------------
SIM_RATE_HZ = 100.0
SIM_TIME_STEP = 1.0 / SIM_RATE_HZ
DEFAULT_MAX_TICKS = 58_000  # 580 s, liftoff -> touchdown (with dispersion margin)

# --- Earth / WGS84 -----------------------------------------------------------
MU_EARTH = 3.986004418e14
OMEGA_EARTH = 7.292115e-5  # rad/s about +Z ECEF
G0 = 9.80665
R_EARTH = 6_378_137.0

# --- pads (CRS-12: LC-39A -> LZ-1) ------------------------------------------
PAD_LAT_DEG, PAD_LON_DEG, PAD_ALT_M = 28.60839, -80.60433, 3.0
LZ1_LAT_DEG, LZ1_LON_DEG, LZ1_ALT_M = 28.48580, -80.54440, 5.0

# --- stage 1 / Merlin 1D (Block 3/4 public estimates) ------------------------
STAGE1_DRY_KG = 25_600.0
STAGE1_PROP_KG = 398_000.0
STAGE2_AND_PAYLOAD_KG = 118_600.0  # stage-2 wet + Dragon + cargo
LIFTOFF_MASS_KG = STAGE1_DRY_KG + STAGE1_PROP_KG + STAGE2_AND_PAYLOAD_KG
DIAMETER_M = 3.66
S_REF_M2 = np.pi * DIAMETER_M**2 / 4.0
N_ENGINES = 9
T_VAC_N = 825e3  # per engine
A_E_M2 = 0.68
ISP_VAC_S = 311.0
THROTTLE_MIN = 0.57

# --- atmosphere (ISA exponential) -------------------------------------------
RHO0 = 1.225
H_SCALE = 8_500.0
P0 = 101_325.0
H_P_SCALE = 8_000.0

# --- mission schedule (CRS-12-like) -----------------------------------------
T_PITCH_START_S = 8.0
T_MECO_S = 130.0  # early MECO leaves the ~80 t RTLS reserve
T_SEP_S = T_MECO_S + 4.0
T_BOOSTBACK_START_S = T_SEP_S + 12.0  # flip complete
ENTRY_BURN_ALT_M = 45_000.0
ENTRY_BURN_EXIT_SPEED_MPS = 650.0  # entry burn cuts off below this speed
PITCH_KICK_DEG = 1.0  # initial pitch-over magnitude
ASCENT_AZIMUTH_DEG = 45.0  # NE launch azimuth
SLEW_RATE_RADPS = 0.35  # kinematic attitude slew limit

# phase ids
ASCENT, FLIP, BOOSTBACK, COAST, ENTRY, DESCENT, LANDING, DOWN = range(8)

# --- dispersions -------------------------------------------------------------
PARAMS = dict(
    thrust_eff=el.monte_carlo.Param(float, default=1.0, min=0.96, max=1.04),
    dry_mass=el.monte_carlo.Param(
        float, default=STAGE1_DRY_KG, min=24_000.0, max=27_000.0
    ),
    wind_e=el.monte_carlo.Param(float, default=0.0, min=-12.0, max=12.0),
    wind_n=el.monte_carlo.Param(float, default=0.0, min=-12.0, max=12.0),
    cd_descent=el.monte_carlo.Param(float, default=1.30, min=1.1, max=1.5),
)

# --- components --------------------------------------------------------------
Prop = ty.Annotated[jax.Array, el.Component("prop_kg", el.ComponentType.F64)]
Phase = ty.Annotated[jax.Array, el.Component("phase", el.ComponentType.F64)]
Throttle = ty.Annotated[jax.Array, el.Component("throttle", el.ComponentType.F64)]
EnginesLit = ty.Annotated[jax.Array, el.Component("engines_lit", el.ComponentType.F64)]
ThrustDir = ty.Annotated[
    jax.Array,
    el.Component("thrust_dir", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "x,y,z"}),
]
ThrustEff = ty.Annotated[jax.Array, el.Component("thrust_eff", el.ComponentType.F64)]
DryMass = ty.Annotated[jax.Array, el.Component("dry_mass", el.ComponentType.F64)]
Wind = ty.Annotated[
    jax.Array,
    el.Component("wind", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "e,n,u"}),
]
CdDescent = ty.Annotated[jax.Array, el.Component("cd_descent", el.ComponentType.F64)]
TouchdownVz = ty.Annotated[jax.Array, el.Component("touchdown_vz", el.ComponentType.F64)]
MissDistance = ty.Annotated[jax.Array, el.Component("miss_distance", el.ComponentType.F64)]

# --- pad geometry (static, computed at import) -------------------------------
_PAD_ECEF = np.asarray(
    frames.geodetic_to_ecef(np.radians(PAD_LAT_DEG), np.radians(PAD_LON_DEG), PAD_ALT_M)
)
_LZ1_ECEF = np.asarray(
    frames.geodetic_to_ecef(np.radians(LZ1_LAT_DEG), np.radians(LZ1_LON_DEG), LZ1_ALT_M)
)
_R_NED = np.asarray(frames.ecef_to_ned(np.radians(PAD_LAT_DEG), np.radians(PAD_LON_DEG)))
# rows of _R_NED: north, east, down (ECEF -> NED); ENU basis vectors in ECEF:
_E_HAT = _R_NED[1]
_N_HAT = _R_NED[0]
_U_HAT = -_R_NED[2]
_LZ1_ENU = np.array(
    [
        float(_E_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
        float(_N_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
        float(_U_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
    ]
)


def to_enu(r_ecef):
    d = r_ecef - jnp.asarray(_PAD_ECEF)
    return jnp.stack([jnp.asarray(_E_HAT) @ d, jnp.asarray(_N_HAT) @ d,
                      jnp.asarray(_U_HAT) @ d])


def vec_enu(v_ecef):
    return jnp.stack([jnp.asarray(_E_HAT) @ v_ecef, jnp.asarray(_N_HAT) @ v_ecef,
                      jnp.asarray(_U_HAT) @ v_ecef])


def from_enu_dir(d_enu):
    return (
        d_enu[0] * jnp.asarray(_E_HAT)
        + d_enu[1] * jnp.asarray(_N_HAT)
        + d_enu[2] * jnp.asarray(_U_HAT)
    )


def altitude_m(r_ecef):
    return to_enu(r_ecef)[2]  # local vertical above pad (flat-ish near site)


def air_density(h):
    return RHO0 * jnp.exp(-jnp.maximum(h, 0.0) / H_SCALE)


def air_pressure(h):
    return P0 * jnp.exp(-jnp.maximum(h, 0.0) / H_P_SCALE)


def cluster_thrust(n_lit, throttle, h, eff):
    per = jnp.maximum(throttle * T_VAC_N - air_pressure(h) * A_E_M2, 0.0)
    return n_lit * per * eff


def cluster_mdot(n_lit, throttle):
    return n_lit * throttle * T_VAC_N / (ISP_VAC_S * G0)


@el.dataclass
class Booster(el.Archetype):
    prop_kg: Prop = field(default_factory=lambda: jnp.float64(STAGE1_PROP_KG))
    phase: Phase = field(default_factory=lambda: jnp.float64(ASCENT))
    throttle: Throttle = field(default_factory=lambda: jnp.float64(1.0))
    engines_lit: EnginesLit = field(default_factory=lambda: jnp.float64(N_ENGINES))
    thrust_dir: ThrustDir = field(default_factory=lambda: jnp.asarray(_U_HAT))
    thrust_eff: ThrustEff = field(default_factory=lambda: jnp.float64(1.0))
    dry_mass: DryMass = field(default_factory=lambda: jnp.float64(STAGE1_DRY_KG))
    wind: Wind = field(default_factory=lambda: jnp.zeros(3))
    cd_descent: CdDescent = field(default_factory=lambda: jnp.float64(1.3))
    touchdown_vz: TouchdownVz = field(default_factory=lambda: jnp.float64(0.0))
    miss_distance: MissDistance = field(default_factory=lambda: jnp.float64(-1.0))


# --- guidance ---------------------------------------------------------------


def _iip_error(r_enu, v_enu):
    """Ballistic instantaneous-impact-point error vs LZ-1 (flat-earth arc,
    the standard boostback cutoff criterion)."""
    h = jnp.maximum(r_enu[2], 1.0)
    vz = v_enu[2]
    g = G0
    t_fall = (vz + jnp.sqrt(vz * vz + 2.0 * g * h)) / g
    impact = r_enu[:2] + v_enu[:2] * t_fall
    return jnp.asarray(_LZ1_ENU)[:2] - impact


@el.system
def guidance(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[el.WorldPos, el.WorldVel, Prop, Phase, DryMass],
) -> el.Query[Phase, Throttle, EnginesLit, ThrustDir]:
    t = tick[0] * ts[0]

    def one(pos, vel, prop, phase, dry):
        r = pos.linear()
        v = vel.linear()
        r_enu = to_enu(r)
        v_enu = vec_enu(v)
        h = r_enu[2]
        speed = la.norm(v) + 1e-9
        phase = phase.astype(jnp.int32)

        # -- phase transitions (monotone ladder) --------------------------
        iip_err = _iip_error(r_enu, v_enu)
        bb_done = la.norm(iip_err) < 150.0
        # landing-burn ignition: three-engine feasibility with margin
        a_net = (
            0.90 * cluster_thrust(3.0, 1.0, h, 1.0) / (dry + prop) - G0
        )
        vz = v_enu[2]
        stop_dist = vz * vz / (2.0 * jnp.maximum(a_net, 1.0))
        want_landing = (vz < -5.0) & (h < 12_000.0) & (h - 25.0 < stop_dist)

        phase = jnp.where((phase == ASCENT) & (t >= T_MECO_S), FLIP, phase)
        phase = jnp.where(
            (phase == FLIP) & (t >= T_BOOSTBACK_START_S), BOOSTBACK, phase
        )
        phase = jnp.where((phase == BOOSTBACK) & bb_done, COAST, phase)
        phase = jnp.where(
            (phase == COAST) & (h < ENTRY_BURN_ALT_M) & (vz < 0), ENTRY, phase
        )
        phase = jnp.where(
            (phase == ENTRY) & (speed < ENTRY_BURN_EXIT_SPEED_MPS),
            DESCENT, phase,
        )
        phase = jnp.where((phase == DESCENT) & want_landing, LANDING, phase)
        phase = jnp.where((phase >= ENTRY) & (h <= 0.5), DOWN, phase)

        # -- per-phase commands ------------------------------------------
        az = jnp.radians(ASCENT_AZIMUTH_DEG)
        downrange = jnp.array([jnp.sin(az), jnp.cos(az), 0.0])
        # gravity turn: follow velocity once moving, seeded by a pitch kick
        pitch = jnp.radians(PITCH_KICK_DEG) * jnp.clip(
            (t - T_PITCH_START_S) / 8.0, 0.0, 1.0
        )
        kick = jnp.array([0.0, 0.0, 1.0]) * jnp.cos(pitch) + downrange * jnp.sin(pitch)
        v_unit_enu = v_enu / speed
        ascent_dir = jnp.where(speed > 120.0, v_unit_enu, kick)

        bb_dir_xy = iip_err / (la.norm(iip_err) + 1e-6)
        boostback_dir = jnp.array([bb_dir_xy[0], bb_dir_xy[1], 0.15])
        boostback_dir = boostback_dir / la.norm(boostback_dir)

        retro = -v_unit_enu

        # landing burn: vertical deceleration + lateral ZEM correction
        tgt = jnp.asarray(_LZ1_ENU)
        t_go = jnp.maximum(-(h - tgt[2]) / jnp.minimum(vz, -1.0), 0.3)
        zem_xy = tgt[:2] - (r_enu[:2] + v_enu[:2] * t_go)
        a_req_z = vz * vz / (2.0 * jnp.maximum(h - 2.0, 1.0)) + G0
        a_cmd = jnp.array(
            [
                jnp.clip(6.0 * zem_xy[0] / (t_go * t_go), -8.0, 8.0),
                jnp.clip(6.0 * zem_xy[1] / (t_go * t_go), -8.0, 8.0),
                a_req_z,
            ]
        )
        landing_dir = a_cmd / la.norm(a_cmd)
        # high-energy start on 3 engines, taper to the center engine for the
        # final hoverslam (the real 3-1 landing-burn profile)
        n_land = jnp.where(vz < -60.0, 3.0, 1.0)
        t_max_land = cluster_thrust(n_land, 1.0, h, 1.0)
        landing_throttle = jnp.clip(
            la.norm(a_cmd) * (dry + prop) / t_max_land, THROTTLE_MIN, 1.0
        )

        dir_enu = jnp.select(
            [
                phase == ASCENT,
                phase == FLIP,
                phase == BOOSTBACK,
                phase == COAST,
                phase == ENTRY,
                phase == DESCENT,
                phase == LANDING,
            ],
            [ascent_dir, retro, boostback_dir, retro, retro, retro, landing_dir],
            jnp.array([0.0, 0.0, 1.0]),
        )
        throttle = jnp.select(
            [phase == ASCENT, phase == BOOSTBACK, phase == ENTRY, phase == LANDING],
            [1.0, 1.0, 1.0, landing_throttle],
            0.0,
        )
        n_lit = jnp.select(
            [phase == ASCENT, phase == BOOSTBACK, phase == ENTRY, phase == LANDING],
            [jnp.float64(N_ENGINES), 3.0, 3.0, n_land],
            0.0,
        )
        out_of_prop = prop <= 0.0
        throttle = jnp.where(out_of_prop, 0.0, throttle)
        n_lit = jnp.where(out_of_prop, 0.0, n_lit)
        return (
            phase.astype(jnp.float64),
            throttle,
            n_lit,
            from_enu_dir(dir_enu),
        )

    return q.map((Phase, Throttle, EnginesLit, ThrustDir), one)


@el.map
def effectors(
    pos: el.WorldPos,
    vel: el.WorldVel,
    inertia: el.Inertia,
    prop: Prop,
    phase: Phase,
    throttle: Throttle,
    n_lit: EnginesLit,
    tdir: ThrustDir,
    eff: ThrustEff,
    wind: Wind,
    cd_desc: CdDescent,
    f: el.Force,
) -> el.Force:
    """Rotating-ECEF forces: gravity, pseudo-forces, thrust, drag."""
    r = pos.linear()
    v = vel.linear()
    m = inertia.mass()
    h = altitude_m(r)
    # central gravity
    g = -MU_EARTH * r / la.norm(r) ** 3
    # rotating-frame pseudo accelerations
    w = jnp.array([0.0, 0.0, OMEGA_EARTH])
    centrifugal = -jnp.cross(w, jnp.cross(w, r))
    coriolis = -2.0 * jnp.cross(w, v)
    # drag (wind in ENU)
    v_air = v - from_enu_dir(wind)
    vmag = la.norm(v_air) + 1e-9
    cd = jnp.where(phase >= ENTRY, cd_desc, 0.35)
    drag = -0.5 * air_density(h) * cd * S_REF_M2 * vmag * v_air
    # grid-fin steering during aero descent: lateral authority proportional
    # to dynamic pressure, commanding the ballistic impact point onto LZ-1
    # (reference aero.py grid-fin model; WHITEPAPER 11)
    iip = _iip_error(to_enu(r), vec_enu(v))
    iip_n = la.norm(iip) + 1e-6
    q_dyn = 0.5 * air_density(h) * vmag * vmag
    f_fin_mag = jnp.minimum(0.30 * q_dyn * S_REF_M2, 0.25 * la.norm(drag))
    f_fin = jnp.where(
        (phase == DESCENT) | (phase == ENTRY),
        f_fin_mag * from_enu_dir(jnp.array([iip[0] / iip_n, iip[1] / iip_n, 0.0]))
        * jnp.clip(iip_n / 500.0, 0.0, 1.0),
        jnp.zeros(3),
    )
    drag = drag + f_fin
    # thrust
    thrust = cluster_thrust(n_lit, throttle, h, eff) * tdir
    total = jnp.where(
        phase == DOWN,
        jnp.zeros(3),
        m * (g + centrifugal + coriolis) + thrust + drag,
    )
    return el.SpatialForce(linear=f.force() + total)


@el.system
def mass_flow(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[Prop, Throttle, EnginesLit, DryMass, Phase, el.Inertia],
) -> el.Query[Prop, el.Inertia]:
    dt = ts[0]
    t = tick[0] * dt

    def one(prop, throttle, n_lit, dry, phase, inertia):
        new_prop = jnp.maximum(prop - cluster_mdot(n_lit, throttle) * dt, 0.0)
        t_mass = dry + new_prop
        # stage 2 + payload stay attached until SEPARATION (T_SEP_S), four
        # seconds after MECO — phase leaves ASCENT already at MECO, so a
        # phase-based test would drop 118.6 t during the pre-sep coast and
        # double the drag deceleration through the flip
        stacked = jnp.where(t < T_SEP_S, STAGE2_AND_PAYLOAD_KG, 0.0)
        return new_prop, el.SpatialInertia(mass=t_mass + stacked)

    return q.map((Prop, el.Inertia), one)


@el.system
def attitude_track(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[el.WorldPos, ThrustDir],
) -> el.Query[el.WorldPos]:
    """Kinematic attitude: body +Z tracks the commanded thrust direction with
    a slew-rate limit (stands in for the reference's TVC/RCS loops)."""
    dt = ts[0]

    def one(pos, tdir):
        cur = pos.angular() @ jnp.array([0.0, 0.0, 1.0])
        tgt = tdir / (la.norm(tdir) + 1e-9)
        axis = jnp.cross(cur, tgt)
        s = la.norm(axis)
        ang = jnp.arctan2(s, jnp.clip(cur @ tgt, -1.0, 1.0))
        step = jnp.minimum(ang, SLEW_RATE_RADPS * dt)
        axis = jnp.where(s > 1e-8, axis / (s + 1e-12), jnp.array([1.0, 0.0, 0.0]))
        dq = el.Quaternion.from_axis_angle(axis, step)
        return el.SpatialTransform(angular=dq * pos.angular(), linear=pos.linear())

    return q.map(el.WorldPos, one)


@el.system
def touchdown_latch(
    q: el.Query[el.WorldPos, el.WorldVel, Phase, TouchdownVz, MissDistance],
) -> el.Query[el.WorldPos, el.WorldVel, TouchdownVz, MissDistance]:
    """On reaching the ground, latch the touchdown metrics and freeze."""

    def one(pos, vel, phase, tdvz, miss):
        r_enu = to_enu(pos.linear())
        v_enu = vec_enu(vel.linear())
        down = phase == DOWN
        first = down & (miss < 0.0)
        new_tdvz = jnp.where(first, v_enu[2], tdvz)
        new_miss = jnp.where(
            first, la.norm(r_enu[:2] - jnp.asarray(_LZ1_ENU)[:2]), miss
        )
        # position freezes via the zeroed velocity below (the integrator
        # advances pos by vel) plus the zeroed force in effectors — pos
        # itself passes through unchanged on the touchdown tick
        frozen_pos = el.SpatialTransform(
            angular=pos.angular(), linear=pos.linear()
        )
        stop_vel = el.SpatialMotion(
            angular=jnp.where(down, jnp.zeros(3), vel.angular()),
            linear=jnp.where(down, jnp.zeros(3), vel.linear()),
        )
        return frozen_pos, stop_vel, new_tdvz, new_miss

    return q.map((el.WorldPos, el.WorldVel, TouchdownVz, MissDistance), one)


def build(params=None) -> tuple[el.World, el.System]:
    p = {
        k: (params.get(k, v.default) if params else v.default)
        for k, v in PARAMS.items()
    }
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(linear=jnp.asarray(_PAD_ECEF)),
                world_vel=el.SpatialMotion(),
                inertia=el.SpatialInertia(
                    mass=p["dry_mass"] + STAGE1_PROP_KG + STAGE2_AND_PAYLOAD_KG
                ),
            ),
            Booster(
                thrust_eff=jnp.float64(p["thrust_eff"]),
                dry_mass=jnp.float64(p["dry_mass"]),
                wind=jnp.array([p["wind_e"], p["wind_n"], 0.0]),
                cd_descent=jnp.float64(p["cd_descent"]),
            ),
        ],
        name="Booster",
    )
    sys = (
        guidance | mass_flow | attitude_track
        | el.six_dof(sys=effectors, integrator=el.Integrator.SemiImplicit)
        | touchdown_latch
    )
    return w, sys


def world() -> el.World:
    return build()[0]


def system() -> el.System:
    return build()[1]
