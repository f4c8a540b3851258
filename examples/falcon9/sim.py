"""Falcon 9 RTLS booster mission with the full-fidelity plant, entirely
in-graph.

Parity target: reference examples/falcon9 (sim.py/constants.py/aero.py/
propulsion.py/rcs.py/sensors.py + the UDP FSW in controller/) — liftoff,
gravity-turn ascent, MECO/staging, RCS flip, boostback, entry burn,
aero descent on grid fins, and a ZEM/ZEV landing burn to a propulsive
touchdown at LZ-1, simulated in the rotating ECEF frame.

The reference runs a 1000 Hz plant against an external Rust flight-software
process over UDP, one OS process per Monte-Carlo sample.  The TPU rebuild
puts plant AND flight software in one jitted program so a 10k-sample
dispersion campaign is a single vmapped XLA computation.  Fidelity carried
over from the reference model set:

* propulsion: per-engine spool dynamics (slow turbopump spin-up, fast
  throttle response), TEA-TEB relight budget (center trio only), thrust
  T(u,h) = u T_vac - p_a A_e, mass depletion split LOX/RP-1, isothermal
  ullage pressure + helium infill, inlet head pressure;
* mass properties: cylinder-stack CG/inertia walking with the draining
  propellant columns, attached stage-2 until separation;
* aerodynamics: US76 atmosphere, Mach-indexed CA/CN tables blended
  nose-first/engines-first, CP-station static moment, Cmq damping, plume
  dominance erasing aero during retro burns, X-config grid fins;
* attitude: full rotational dynamics driven by TVC gimbal, cold-gas RCS
  (8 thrusters, pure-pair allocation), and grid fins, under an
  inertia-scaled quaternion PD with phase-scheduled bandwidth;
* guidance: gravity-turn ascent, IIP-targeted boostback, retro entry burn,
  body-lift steered descent, ZEM/ZEV terminal landing (zemzev.py);
* sensors: IMU / GPS (retropropulsion blackout) / radar altimeter /
  pressure transducers / webcast display model (sensors.py).

Body frame: +X nose; engines at station 0 thrust along +X.
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
import numpy as np
from jax.numpy import linalg as la

from elodin_tpu import frames

import aero
import atmosphere
import propulsion as prop_mod
import rcs as rcs_mod
import sensors as sn
import zemzev
from constants import (
    ENGINE_A_E_M2,
    ENGINE_T_VAC_N,
    G0,
    LOX_LOAD_KG,
    MU_EARTH_M3S2,
    N_ENGINES,
    OMEGA_EARTH_RADPS,
    RP1_LOAD_KG,
    STAGE1_DRY_MASS_KG,
    STAGE1_PROP_KG,
    STAGE2_AND_PAYLOAD_KG,
    THROTTLE_MIN,
    ENGINE_SPINUP_TAU_S,
    ENGINE_THROTTLE_TAU_S,
    ENGINE_SHUTDOWN_TAU_S,
    FIN_MAX_RAD,
    FIN_RATE_RADPS,
    FIN_TAU_S,
    RCS_VALVE_TAU_S,
    TANK_P_NOM_PA,
    TVC_MAX_RAD,
    TVC_RATE_RADPS,
    TVC_TAU_S,
    PAD_LAT_DEG,
    PAD_LON_DEG,
    PAD_ALT_M,
    LZ1_LAT_DEG,
    LZ1_LON_DEG,
    LZ1_ALT_M,
)

# --- rates -------------------------------------------------------------------
SIM_RATE_HZ = 100.0
GUIDANCE_EVERY_TICKS = 5  # GNC at 20 Hz against the 100 Hz plant (build())
SIM_TIME_STEP = 1.0 / SIM_RATE_HZ
DEFAULT_MAX_TICKS = 58_000  # 580 s with dispersion margin

# --- mission schedule (CRS-12-like) -----------------------------------------
T_PITCH_START_S = 7.0
# MECO on the RTLS propellant reserve (budget-guaranteed), bounded in time.
MECO_RESERVE_KG = 70_000.0
T_MECO_MIN_S, T_MECO_MAX_S = 60.0, 160.0
SEP_DELAY_S = 4.0  # MECO -> stage separation
FLIP_MIN_S = 14.0  # separation -> earliest boostback light
FLIP_TIMEOUT_S = 34.0
BOOSTBACK_ATT_GATE_RAD = 0.5  # don't light engines >30 deg off the burn attitude
ENTRY_BURN_ALT_M = 45_000.0
ENTRY_BURN_EXIT_SPEED_MPS = 650.0
ENTRY_STEER_MAX_RAD = 0.30  # powered divert tilt during the entry burn
PITCH_KICK_DEG = 2.4
ASCENT_AZIMUTH_DEG = 45.0
BOOSTBACK_AIM_BIAS_M = 3_000.0  # overshoot aim past LZ-1 (entry burn pulls short)
BOOSTBACK_THROTTLE = 0.70  # the recorded burn decelerates ~27 m/s^2 (throttled)
ENTRY_THROTTLE = 0.65
LANDING_ARM_ALT_M = 6_000.0
LANDING_IGNITION_MARGIN = 1.05
LANDING_SPOOL_CHARGE_S = 2.5  # spool-up distance charged against altitude
BUCKET_Q_ON_PA = 30_000.0  # Max-Q throttle-bucket threshold
BUCKET_THROTTLE = 0.80
ASCENT_G_LIMIT = 34.0  # m/s^2 (~3.5 g; the reference FSW caps at the same 34.0, main.rs:516)
LANDING_KV_HIGH = 3.2  # hoverslam rate gain onto the suicide curve (1/s)
LANDING_KV_LOW = 4.0  # tightened under 200 m for the <=2 m/s impact
COMMIT_MISS_MAX_M = 25.0
LANDING_KLAT_POST = 1.2  # 1/s, post-commit lateral-velocity damping

# Attitude-loop bandwidth schedule (reference sim.py:677-681).
ATT_WN_TVC = 0.9
ATT_WN_TVC_LANDING = 1.7
ATT_ZETA_TVC = 0.9
ATT_WN_RCS = 0.35
ATT_ZETA_RCS = 0.8
RCS_DEADBAND_ATT_RAD = 0.009
RCS_DEADBAND_RATE_RADPS = 0.01
FIN_Q_MIN_PA = 2_000.0
TVC_THRUST_MIN_N = 2.0e5
STEER_TILT_MAX_RAD = 0.25  # body-lift descent steering cap

# Per-engine TEA-TEB charges: the center trio (indices 0-2) can relight.
INITIAL_CHARGES = np.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
MASK_ALL = np.ones(N_ENGINES)
MASK_TRIO = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
MASK_CENTER = np.array([1.0] + [0.0] * (N_ENGINES - 1))

# phase ids (monotone ladder)
ASCENT, FLIP, BOOSTBACK, COAST, ENTRY, DESCENT, LANDING, DOWN = range(8)

# --- dispersions -------------------------------------------------------------
PARAMS = dict(
    thrust_eff=el.monte_carlo.Param(float, default=1.0, min=0.96, max=1.04),
    dry_mass=el.monte_carlo.Param(
        float, default=STAGE1_DRY_MASS_KG, min=24_000.0, max=27_000.0
    ),
    wind_e=el.monte_carlo.Param(float, default=0.0, min=-12.0, max=12.0),
    wind_n=el.monte_carlo.Param(float, default=0.0, min=-12.0, max=12.0),
    cd_descent=el.monte_carlo.Param(float, default=1.30, min=1.1, max=1.5),
)
CD_DESCENT_NOMINAL = 1.30  # scales the CA_DESCENT table

# --- components --------------------------------------------------------------
_F = el.ComponentType.F64
_F2 = el.ComponentType(el.PrimitiveType.F64, (2,))
_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))
_F4 = el.ComponentType(el.PrimitiveType.F64, (4,))
_F8 = el.ComponentType(el.PrimitiveType.F64, (8,))
_F9 = el.ComponentType(el.PrimitiveType.F64, (9,))

Prop = ty.Annotated[jax.Array, el.Component("prop_kg", _F)]
Phase = ty.Annotated[jax.Array, el.Component("phase", _F)]
Throttle = ty.Annotated[jax.Array, el.Component("throttle", _F)]
EnginesLit = ty.Annotated[jax.Array, el.Component("engines_lit", _F)]
EngineCmd = ty.Annotated[jax.Array, el.Component("engine_cmd", _F9)]
EngineSpool = ty.Annotated[jax.Array, el.Component("engine_spool", _F9)]
EngineLitState = ty.Annotated[jax.Array, el.Component("engine_lit_state", _F9)]
TeatebCharges = ty.Annotated[jax.Array, el.Component("teateb_charges", _F9)]
ThrustTotal = ty.Annotated[jax.Array, el.Component("thrust_total", _F)]
ThrustDir = ty.Annotated[
    jax.Array,
    el.Component("thrust_dir", _F3, metadata={"element_names": "x,y,z"}),
]
ThrustEff = ty.Annotated[jax.Array, el.Component("thrust_eff", _F)]
DryMass = ty.Annotated[jax.Array, el.Component("dry_mass", _F)]
Wind = ty.Annotated[
    jax.Array, el.Component("wind", _F3, metadata={"element_names": "e,n,u"})
]
CdDescent = ty.Annotated[jax.Array, el.Component("cd_descent", _F)]
CgStation = ty.Annotated[jax.Array, el.Component("cg_station", _F)]
Qbar = ty.Annotated[jax.Array, el.Component("qbar", _F)]
MachNum = ty.Annotated[jax.Array, el.Component("mach", _F)]
TvcCmd = ty.Annotated[jax.Array, el.Component("tvc_cmd", _F2)]
TvcState = ty.Annotated[jax.Array, el.Component("tvc_state", _F2)]
FinCmd = ty.Annotated[jax.Array, el.Component("fin_cmd", _F4)]
FinState = ty.Annotated[jax.Array, el.Component("fin_state", _F4)]
RcsCmd = ty.Annotated[jax.Array, el.Component("rcs_cmd", _F8)]
RcsState = ty.Annotated[jax.Array, el.Component("rcs_state", _F8)]
TankPressure = ty.Annotated[jax.Array, el.Component("tank_pressure", _F2)]
InletPressure = ty.Annotated[jax.Array, el.Component("inlet_pressure", _F2)]
SpecForceBody = ty.Annotated[jax.Array, el.Component("spec_force_body", _F3)]
Lifted = ty.Annotated[jax.Array, el.Component("lifted", _F)]
MecoT = ty.Annotated[jax.Array, el.Component("meco_t", _F)]
LandSingle = ty.Annotated[jax.Array, el.Component("land_single", _F)]
LandCommit = ty.Annotated[jax.Array, el.Component("land_commit", _F)]
TouchdownVz = ty.Annotated[jax.Array, el.Component("touchdown_vz", _F)]
TouchdownVlat = ty.Annotated[jax.Array, el.Component("touchdown_vlat", _F)]
TouchdownTilt = ty.Annotated[jax.Array, el.Component("touchdown_tilt", _F)]
MissDistance = ty.Annotated[jax.Array, el.Component("miss_distance", _F)]

# --- pad geometry (static, computed at import) -------------------------------
_PAD_ECEF = np.asarray(
    frames.geodetic_to_ecef(np.radians(PAD_LAT_DEG), np.radians(PAD_LON_DEG), PAD_ALT_M)
)
_LZ1_ECEF = np.asarray(
    frames.geodetic_to_ecef(np.radians(LZ1_LAT_DEG), np.radians(LZ1_LON_DEG), LZ1_ALT_M)
)
_R_NED = np.asarray(frames.ecef_to_ned(np.radians(PAD_LAT_DEG), np.radians(PAD_LON_DEG)))
_E_HAT, _N_HAT, _U_HAT = _R_NED[1], _R_NED[0], -_R_NED[2]
_LZ1_ENU = np.array(
    [
        float(_E_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
        float(_N_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
        float(_U_HAT @ (_LZ1_ECEF - _PAD_ECEF)),
    ]
)
_R_PAD_SURFACE = float(np.linalg.norm(_PAD_ECEF)) - PAD_ALT_M


def to_enu(r_ecef):
    # el.const_pin: the 6.4e6-magnitude pad anchor must not be folded into
    # the axon TPU's lossy fused-add path inside the tick loop (the fuser
    # drops the f64 constant's low limb — elodin_tpu/ops/precise.py)
    d = r_ecef - el.const_pin(_PAD_ECEF)
    return jnp.stack(
        [jnp.asarray(_E_HAT) @ d, jnp.asarray(_N_HAT) @ d, jnp.asarray(_U_HAT) @ d]
    )


def vec_enu(v_ecef):
    return jnp.stack(
        [jnp.asarray(_E_HAT) @ v_ecef, jnp.asarray(_N_HAT) @ v_ecef, jnp.asarray(_U_HAT) @ v_ecef]
    )


def from_enu_dir(d_enu):
    return (
        d_enu[0] * jnp.asarray(_E_HAT)
        + d_enu[1] * jnp.asarray(_N_HAT)
        + d_enu[2] * jnp.asarray(_U_HAT)
    )


def altitude_m(r_ecef):
    """Spherical altitude above the pad surface radius (uniform along the
    whole downrange arc, unlike the pad-tangent ENU z)."""
    return la.norm(r_ecef) - _R_PAD_SURFACE


def lox_rp1(prop_kg):
    return (
        prop_kg * (LOX_LOAD_KG / STAGE1_PROP_KG),
        prop_kg * (RP1_LOAD_KG / STAGE1_PROP_KG),
    )


def upright_attitude() -> el.Quaternion:
    """Body +X onto the pad's local up."""
    up = np.asarray(_U_HAT)
    x = np.array([1.0, 0.0, 0.0])
    axis = np.cross(x, up)
    axis = axis / np.linalg.norm(axis)
    ang = float(np.arccos(np.clip(x @ up, -1.0, 1.0)))
    return el.Quaternion.from_axis_angle(jnp.asarray(axis), jnp.float64(ang))


@el.dataclass
class Booster(el.Archetype):
    prop_kg: Prop = field(default_factory=lambda: jnp.float64(STAGE1_PROP_KG))
    phase: Phase = field(default_factory=lambda: jnp.float64(ASCENT))
    throttle: Throttle = field(default_factory=lambda: jnp.float64(1.0))
    engines_lit: EnginesLit = field(default_factory=lambda: jnp.float64(0.0))
    engine_cmd: EngineCmd = field(default_factory=lambda: jnp.asarray(MASK_ALL))
    engine_spool: EngineSpool = field(default_factory=lambda: jnp.zeros(N_ENGINES))
    engine_lit_state: EngineLitState = field(default_factory=lambda: jnp.zeros(N_ENGINES))
    teateb_charges: TeatebCharges = field(
        default_factory=lambda: jnp.asarray(INITIAL_CHARGES)
    )
    thrust_total: ThrustTotal = field(default_factory=lambda: jnp.float64(0.0))
    thrust_dir: ThrustDir = field(default_factory=lambda: jnp.asarray(_U_HAT))
    thrust_eff: ThrustEff = field(default_factory=lambda: jnp.float64(1.0))
    dry_mass: DryMass = field(default_factory=lambda: jnp.float64(STAGE1_DRY_MASS_KG))
    wind: Wind = field(default_factory=lambda: jnp.zeros(3))
    cd_descent: CdDescent = field(default_factory=lambda: jnp.float64(CD_DESCENT_NOMINAL))
    cg_station: CgStation = field(default_factory=lambda: jnp.float64(25.0))
    qbar: Qbar = field(default_factory=lambda: jnp.float64(0.0))
    mach: MachNum = field(default_factory=lambda: jnp.float64(0.0))
    tvc_cmd: TvcCmd = field(default_factory=lambda: jnp.zeros(2))
    tvc_state: TvcState = field(default_factory=lambda: jnp.zeros(2))
    fin_cmd: FinCmd = field(default_factory=lambda: jnp.zeros(4))
    fin_state: FinState = field(default_factory=lambda: jnp.zeros(4))
    rcs_cmd: RcsCmd = field(default_factory=lambda: jnp.zeros(8))
    rcs_state: RcsState = field(default_factory=lambda: jnp.zeros(8))
    tank_pressure: TankPressure = field(
        default_factory=lambda: jnp.full(2, TANK_P_NOM_PA)
    )
    inlet_pressure: InletPressure = field(
        default_factory=lambda: jnp.full(2, TANK_P_NOM_PA)
    )
    spec_force_body: SpecForceBody = field(default_factory=lambda: jnp.zeros(3))
    lifted: Lifted = field(default_factory=lambda: jnp.float64(0.0))
    meco_t: MecoT = field(default_factory=lambda: jnp.float64(-1.0))
    land_single: LandSingle = field(default_factory=lambda: jnp.float64(0.0))
    land_commit: LandCommit = field(default_factory=lambda: jnp.float64(0.0))
    touchdown_vz: TouchdownVz = field(default_factory=lambda: jnp.float64(0.0))
    touchdown_vlat: TouchdownVlat = field(default_factory=lambda: jnp.float64(0.0))
    touchdown_tilt: TouchdownTilt = field(default_factory=lambda: jnp.float64(0.0))
    miss_distance: MissDistance = field(default_factory=lambda: jnp.float64(-1.0))


# --- guidance (in-graph FSW: phase ladder + pointing + engine pattern) -------


IIP_STEPS = 24
IIP_CD_S_M2 = 24.0  # FSW's engines-first drag estimate (CA_DESCENT * S_ref + fins)
# Earth rotation in the pad-ENU basis: the coast arc picks up kilometers of
# Coriolis drift, so the predictor integrates the same rotating-frame EOM as
# the plant (reference main.rs impact_point integrates in ECEF).
_OMEGA_ENU = OMEGA_EARTH_RADPS * np.array(
    [float(_E_HAT[2]), float(_N_HAT[2]), float(_U_HAT[2])]
)
_G_APPARENT = G0 - OMEGA_EARTH_RADPS**2 * _R_PAD_SURFACE * float(
    np.cos(np.radians(PAD_LAT_DEG)) ** 2
)


def _impact_point(r_enu, v_enu, mass, cd_s=IIP_CD_S_M2, wind_enu=None):
    """Drag-aware rotating-frame ballistic impact point (pad-ENU xy).

    The vacuum flat-earth IIP is kilometers off: descent drag steepens the
    fall, the coast arc picks up kilometers of Coriolis drift, and gravity
    weakens ~10% over the 150+ km loft — so the FSW predictor forward-
    integrates the same rotating-frame EOM as the plant with an
    engines-first drag estimate (reference controller/src/main.rs
    impact_point).  Fixed step count keeps it one small scan under
    jit/vmap.

    Integrator: Heun (RK2).  At 24 steps it is BOTH ~2x cheaper and ~10x
    more accurate than the 96-step semi-implicit Euler it replaced
    (worst-case vs a 2048-step dense reference: 19 m at apogee coast vs
    319 m; <=1.3 m everywhere below 60 km) — and the IIP scan was ~70% of
    the whole guidance tick, so this is the falcon9 campaign's single
    hottest loop."""
    h0 = jnp.maximum(r_enu[2], 1.0)
    vz0 = v_enu[2]
    t_vac = (vz0 + jnp.sqrt(vz0 * vz0 + 2.0 * G0 * h0)) / G0
    dt = jnp.clip(1.35 * t_vac, 8.0, 430.0) / IIP_STEPS
    omega = jnp.asarray(_OMEGA_ENU)
    center = jnp.asarray([0.0, 0.0, _R_PAD_SURFACE])

    def accel(r, v):
        h = jnp.maximum(r[2], 0.0)
        # drag acts on the AIR-relative velocity: a 12 m/s wind otherwise
        # biases the predicted impact by hundreds of meters, which the
        # descent steering then inherits as ignition miss
        v_air = v if wind_enu is None else v - wind_enu
        speed = la.norm(v_air) + 1e-9
        rho = 1.225 * jnp.exp(-h / 8_500.0)
        # Central gravity in the pad frame: over a 70 km arc the gravity
        # direction rotates ~0.6 deg, which a constant -z field turns into a
        # kilometer of coast drift.
        to_center = -(r + center)
        g_h = _G_APPARENT * (_R_PAD_SURFACE / (_R_PAD_SURFACE + h)) ** 2
        return (
            g_h * to_center / jnp.maximum(la.norm(to_center), 1.0)
            - 2.0 * jnp.cross(omega, v)
            - 0.5 * rho * speed * v_air * (cd_s / mass)
        )

    def body(carry, _):
        r, v, done = carry
        a1 = accel(r, v)
        a2 = accel(r + v * dt, v + a1 * dt)
        v_n = v + 0.5 * (a1 + a2) * dt
        r_n = r + 0.5 * (v + v_n) * dt
        crossing = (~done) & (r_n[2] <= 0.0)
        # Interpolate the ground crossing within the step.
        dz = jnp.minimum(r_n[2] - r[2], -1e-9)
        frac = jnp.where(crossing, r_n[2] / dz, 0.0)
        r_c = r_n - (r_n - r) * frac
        r_out = jnp.where(done, r, jnp.where(crossing, r_c, r_n))
        v_out = jnp.where(done, v, v_n)
        return (r_out, v_out, done | crossing), None

    (r_f, _, _), _ = jax.lax.scan(
        body, (r_enu, v_enu, r_enu[2] <= 0.0), None, length=IIP_STEPS
    )
    return r_f[:2]


@el.system
def guidance(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[
        el.WorldPos,
        el.WorldVel,
        Prop,
        Phase,
        DryMass,
        ThrustDir,
        CgStation,
        CdDescent,
        Wind,
        LandSingle,
        LandCommit,
        MecoT,
    ],
) -> el.Query[Phase, Throttle, EngineCmd, ThrustDir, EnginesLit, LandSingle, LandCommit, MecoT]:
    t = tick[0] * ts[0]

    def one(pos, vel, prop, phase, dry, prev_dir, cg, cd_desc, wind_c, land_single, land_commit, meco_t):
        r = pos.linear()
        v = vel.linear()
        r_enu = to_enu(r)
        v_enu = vec_enu(v)
        h = altitude_m(r)
        speed = la.norm(v) + 1e-9
        phase = phase.astype(jnp.int32)
        sep_done = (meco_t >= 0.0) & (t >= meco_t + SEP_DELAY_S)
        m_now = dry + prop + jnp.where(sep_done, 0.0, STAGE2_AND_PAYLOAD_KG)
        vz = v_enu[2]
        vdown = -vz
        # Engine-plane height above the LZ-1 deck (the pad-ENU z of the deck
        # already carries earth curvature + geodetic altitude; the spherical
        # ascent altitude runs a different datum and is ~30 m off here).
        h_e = jnp.maximum(r_enu[2] - jnp.asarray(_LZ1_ENU)[2] - cg, 0.5)
        p_amb = atmosphere.pressure(jnp.maximum(h, 0.0))
        t_eng_max = prop_mod.engine_thrust_per_engine(1.0, p_amb)
        t_eng_min = prop_mod.engine_thrust_per_engine(THROTTLE_MIN, p_amb)

        # -- phase transitions (monotone ladder) --------------------------
        # The FSW flies its own aero database scaled by the vehicle's actual
        # descent-drag figure (the reference disperses fsw_cd_s_m2 the same
        # way, main.py:87).
        fsw_cd = IIP_CD_S_M2 * cd_desc / CD_DESCENT_NOMINAL
        impact_xy = _impact_point(r_enu, v_enu, dry + prop, fsw_cd, wind_c)
        iip_err = jnp.asarray(_LZ1_ENU)[:2] - impact_xy
        # Boostback targets an aim point past LZ-1 along the return track:
        # the (unmodeled) entry burn pulls the impact short by a few km, and
        # entry/descent steering trims the residual off the true predictor.
        ret_dir = jnp.asarray(_LZ1_ENU)[:2] - r_enu[:2]
        ret_dir = ret_dir / (la.norm(ret_dir) + 1e-6)
        aim_xy = jnp.asarray(_LZ1_ENU)[:2] + BOOSTBACK_AIM_BIAS_M * ret_dir
        bb_err = aim_xy - impact_xy
        bb_done = la.norm(bb_err) < 1_000.0
        # Hoverslam ignition (reference main.rs AeroDescent): ignite when the
        # descent rate crosses the single-engine finishing profile (the
        # curve the de-escalated burn rides), charging the spool-up distance
        # against the altitude; the burn opens on three engines to catch any
        # excess before handing over to the center engine.
        a_land3 = 0.70 * jnp.maximum(3.0 * t_eng_max / m_now - G0, 0.5)
        h_eff = jnp.maximum(h_e - LANDING_SPOOL_CHARGE_S * jnp.maximum(vdown, 0.0) - 20.0, 1.0)
        v_profile = jnp.sqrt(2.0 * a_land3 * h_eff)
        want_landing = (
            (vdown > 5.0)
            & (h_e < LANDING_ARM_ALT_M)
            & (vdown * LANDING_IGNITION_MARGIN >= v_profile)
        )

        # Flip completion gate for the boostback light.
        x_body = pos.angular() @ jnp.asarray([1.0, 0.0, 0.0])
        att_err_prev = jnp.arccos(
            jnp.clip(jnp.dot(x_body, prev_dir / (la.norm(prev_dir) + 1e-9)), -1.0, 1.0)
        )

        meco_now = (phase == ASCENT) & (
            ((t >= T_MECO_MIN_S) & (prop <= MECO_RESERVE_KG)) | (t >= T_MECO_MAX_S)
        )
        meco_t = jnp.where(meco_now & (meco_t < 0.0), t, meco_t)
        phase = jnp.where(meco_now, FLIP, phase)
        bb_window = (meco_t >= 0.0) & (t >= meco_t + SEP_DELAY_S + FLIP_MIN_S)
        phase = jnp.where(
            (phase == FLIP) & bb_window & (att_err_prev < BOOSTBACK_ATT_GATE_RAD),
            BOOSTBACK,
            phase,
        )
        # Hard timeout: the burn's TVC corrects any residual flip error.
        phase = jnp.where(
            (phase == FLIP) & (meco_t >= 0.0) & (t >= meco_t + FLIP_TIMEOUT_S),
            BOOSTBACK,
            phase,
        )
        phase = jnp.where((phase == BOOSTBACK) & bb_done, COAST, phase)
        phase = jnp.where((phase == COAST) & (h < ENTRY_BURN_ALT_M) & (vz < 0), ENTRY, phase)
        phase = jnp.where(
            (phase == ENTRY) & (speed < ENTRY_BURN_EXIT_SPEED_MPS), DESCENT, phase
        )
        phase = jnp.where((phase == DESCENT) & want_landing, LANDING, phase)

        # -- pointing commands -------------------------------------------
        az = jnp.radians(ASCENT_AZIMUTH_DEG)
        downrange = jnp.asarray([jnp.sin(az), jnp.cos(az), 0.0])
        pitch = jnp.radians(PITCH_KICK_DEG) * jnp.clip((t - T_PITCH_START_S) / 8.0, 0.0, 1.0)
        kick = jnp.asarray([0.0, 0.0, 1.0]) * jnp.cos(pitch) + downrange * jnp.sin(pitch)
        v_unit_enu = v_enu / speed
        ascent_dir = jnp.where(speed > 120.0, v_unit_enu, kick)

        bb_dir_xy = bb_err / (la.norm(bb_err) + 1e-6)
        boostback_dir = jnp.asarray([bb_dir_xy[0], bb_dir_xy[1], -0.10])
        boostback_dir = boostback_dir / la.norm(boostback_dir)

        retro = -v_unit_enu

        # Entry-burn powered divert: tilt the retro thrust toward the IIP
        # error (the big correction authority of the return).
        iip_n = la.norm(iip_err) + 1e-6
        steer_vec = jnp.asarray([iip_err[0] / iip_n, iip_err[1] / iip_n, 0.0])
        entry_steer = jnp.clip(iip_n / 2000.0, 0.0, 1.0) * ENTRY_STEER_MAX_RAD
        entry_dir = retro + entry_steer * steer_vec
        entry_dir = entry_dir / la.norm(entry_dir)

        # Descent steering: tilt the retro attitude toward the IIP error so
        # body lift (stable engines-first trim) walks the arc onto LZ-1.
        steer = jnp.clip(iip_n / 1500.0, 0.0, 1.0) * STEER_TILT_MAX_RAD
        descent_dir = retro + steer * steer_vec
        descent_dir = descent_dir / la.norm(descent_dir)

        # -- landing burn (reference main.rs LandingBurn) ------------------
        # Continuous hoverslam: the vertical rate loop rides the feasible
        # suicide curve (never coasts); ZEM/ZEV shapes only the lateral.
        up = jnp.asarray([0.0, 0.0, 1.0])
        # The curve reaches V_TD at 3 m and holds it: the sqrt profile's
        # final drop is untrackable (dv_des/dt diverges as h -> 0), so a
        # curve aimed at the deck always lands hot by the tracking lag.
        # The ~2.5 s constant-sink tail also gives the attitude loop time
        # to level before the legs touch.
        h_land = jnp.maximum(h_e - 2.0, 0.0)
        a_floor = jnp.maximum(t_eng_min / m_now - G0, 0.5)
        a_single = jnp.maximum(t_eng_max / m_now - G0, 0.6)
        # 35% into the feasible band, not the midpoint: the shallower curve
        # leaves ~2.9x braking margin to recover tracking error accumulated
        # through the spool/attitude lags — at the midpoint the last-10 m
        # catch-up saturates the engine and the vehicle lands ~3 m/s hot.
        a_mid = a_floor + 0.35 * (a_single - a_floor)
        # Two-stage hoverslam, reference main.rs:651-707 architecture.
        # Vertical: ONE symmetric rate loop onto the suicide curve
        # v_des = sqrt(2 a h) + V_TD.  Real authority on both sides of the
        # profile — fall behind and it brakes harder, get ahead (drag
        # over-braked you high up) and the loop commands below hover with
        # kv*error so the sink rebuilds instead of crawling the last 20 m.
        v_single = jnp.sqrt(2.0 * a_mid * h_land)
        # Hand over EARLY by the outer pair's spool-down tail: three
        # engines at min throttle still brake ~23 m/s^2 (T_min3/W ~ 3.3),
        # and after the cut the pair keeps thrusting for ~tau_shutdown —
        # ~2 x 470 kN x 0.35 s / m ~ 9 m/s of unavoidable extra braking.
        # Switching at the curve itself used to drive the vehicle ~5 m/s
        # below the profile, where min-throttle (T/W > 1) pins it.
        spool_tail = (
            2.0 * t_eng_min * ENGINE_SHUTDOWN_TAU_S / jnp.maximum(m_now, 1.0)
        )
        go_single = vdown <= v_single + spool_tail
        land_single = jnp.where((phase == LANDING) & go_single, 1.0, land_single)
        on_single = land_single > 0.5
        a_land = jnp.where(on_single, a_mid, a_land3)
        v_des = jnp.sqrt(2.0 * a_land * h_land) + zemzev.V_TD_MPS
        # Lateral-cleanup hold: a sample arriving low with lateral velocity
        # still to burn off slows its descent (propellant reserve is ~11 t,
        # time is the scarce resource) until the damper has cleaned up —
        # landing slowly 30 m off beats landing on time at 8 m/s sideways.
        vlat_now = la.norm(v_enu[:2])
        cleanup = (h_e < 60.0) & (vlat_now > 0.7)
        v_des = jnp.where(
            cleanup,
            v_des * jnp.clip(1.0 - (vlat_now - 0.7) / 6.0, 0.25, 1.0),
            v_des,
        )
        # Slightly higher rate gain in the last 200 m (reference :675).
        kv = jnp.where(h_e < 200.0, LANDING_KV_LOW, LANDING_KV_HIGH)
        # a_land feedforward: riding the curve requires exactly a_land of
        # braking, so without it the loop trails the profile by a_land/kv
        # (~1.5 m/s) all the way to the deck and touches down that much hot.
        a_up = jnp.maximum(G0 + a_land + kv * (vdown - v_des), 0.0)

        # Lateral: ZEM/ZEV accel (zemzev.py), tilt-capped — the t_go^-2
        # gain growth closes the divert on the hoverslam clock, unlike a
        # first-order stop-curve chase that arrives still carrying the
        # envelope-slope lag.  Commit-to-vertical freezes it near the deck.
        p_rel = r_enu - jnp.asarray(_LZ1_ENU) - cg * up
        t_go, t_raw = zemzev.t_go_hoverslam(h_e, vdown)
        miss_h = la.norm(p_rel[:2])
        commit_gate = (h_e < zemzev.COMMIT_ALT_M) | (
            (t_raw > 0.0) & (t_raw < zemzev.COMMIT_TGO_S) & (h_e < 200.0)
        )
        commit_now = commit_gate & ((miss_h < COMMIT_MISS_MAX_M) | (h_e < 25.0))
        land_commit = jnp.where((phase == LANDING) & commit_now, 1.0, land_commit)
        committed = land_commit > 0.5
        # Wider divert tilt above 100 m (there is time to level again up
        # there); the conservative cap applies only near the deck.
        tilt_cap = jnp.where(h_e > 100.0, 0.35, zemzev.TILT_CAP_RAD)
        max_lat = jnp.maximum(a_up, G0) * jnp.tan(tilt_cap)
        # ZEM/ZEV lateral on the hoverslam t_go (zemzev.py: waypoint
        # above 150 m, rest-at-touchdown plan, tilt-capped); the residual
        # lateral velocity still carried at commit is handled by the
        # post-commit damper below.
        a_zem = zemzev.accel_cmd(p_rel, v_enu, up, t_go, committed)
        a_lat3 = a_zem - jnp.dot(a_zem, up) * up

        # Post-commit: stop chasing position but keep damping the lateral
        # VELOCITY — the ZEM plan aims for rest at touchdown, so at the
        # commit point (~5 s out) it still carries ~8 m/s laterally, and a
        # hard freeze lands with all of it.  The damping tilt budget tapers
        # from the full cap at 25 m to 1 degree at the deck so the final
        # attitude stays inside the touchdown envelope while still holding
        # wind-drag drift (~0.15 m/s^2 needs ~0.7 deg).
        a_damp = -LANDING_KLAT_POST * v_enu * (1.0 - up)
        damp_cap = jnp.maximum(
            jnp.tan(jnp.deg2rad(1.0)) * jnp.maximum(a_up, G0),
            max_lat * jnp.clip((h_e - 4.0) / 21.0, 0.0, 1.0),
        )
        # during a cleanup hold (still above 12 m) the damper gets the full
        # cap: the hold buys the time to level afterwards
        damp_cap = jnp.where(
            cleanup & (h_e > 12.0), max_lat, damp_cap
        )
        a_damp = a_damp * jnp.minimum(
            1.0, damp_cap / jnp.maximum(la.norm(a_damp), 1e-6)
        )
        # Post-commit position recovery (the apollo lesson): a gentle
        # pad-ward chase claws back the divert shortfall — but ONLY with
        # the budget LEFT OVER after velocity damping, so a large miss can
        # never dilute the lateral-velocity cleanup that keeps the
        # touchdown inside the envelope.  Faded out below 12 m like every
        # other chase gain.
        k_pos_post = 0.05 * jnp.clip((h_e - 12.0) / 30.0, 0.0, 1.0)
        chase_budget = jnp.sqrt(jnp.maximum(
            damp_cap**2 - la.norm(a_damp) ** 2, 0.0
        ))
        a_chase = -k_pos_post * p_rel * (1.0 - up)
        a_chase = a_chase * jnp.minimum(
            1.0, chase_budget / jnp.maximum(la.norm(a_chase), 1e-6)
        )
        a_damp = a_damp + a_chase
        a_lat3 = jnp.where(committed, a_damp, a_lat3)
        lat_mag = la.norm(a_lat3)
        a_lat = a_lat3 * jnp.minimum(1.0, max_lat / jnp.maximum(lat_mag, 1e-6))
        a_cmd = jnp.maximum(a_up, G0) * up + a_lat
        landing_dir = a_cmd / jnp.maximum(la.norm(a_cmd), 1e-6)

        # Engine count from the required thrust: open on three only while a
        # single engine cannot deliver; de-escalate monotonically (TEA-TEB
        # budget — the outer pair never relights).  When even single-engine
        # min throttle would over-thrust (T_min/W > 1 mid-burn), cut and
        # coast — the spool stays hot, so the relight needs no charge.
        cos_tilt = jnp.maximum(jnp.dot(vec_enu(x_body), up), 0.6)
        three = ~on_single
        n_land = jnp.where(three, 3.0, 1.0)
        landing_throttle = jnp.clip(
            (m_now * a_up / cos_tilt / n_land + p_amb * ENGINE_A_E_M2) / ENGINE_T_VAC_N,
            THROTTLE_MIN,
            1.0,
        )
        # Min-throttle lofting guard, near the deck only: a cut long enough
        # to cool the spool would need a 5th TEA-TEB charge that isn't there
        # (the spool survives sub-second cuts).
        # Cut below 0.5 m/s of sink (not only when actually ascending):
        # min throttle over-thrusts (T_min/W ~ 1.1), so during the
        # constant-V_TD tail the sink otherwise decays to a perpetual
        # hover above the deck.  The band keeps sink in ~[0.5, V_TD].
        lofting = (phase == LANDING) & (h_e < 150.0) & (vdown < 0.5)
        # Terminal cutoff (reference main.rs: alt < 2 && speed < 1.5): kill
        # thrust at the deck so T_min/W > 1 cannot hold a skating hover.
        # Cut at 0.45 m: free-fall from the old 0.6 m cut to the 0.4 m
        # touchdown plane alone adds sqrt(2g·0.2) — a guaranteed ~2 m/s
        # impact, right at the envelope edge.
        lofting = lofting | ((phase == LANDING) & (h_e < 0.45) & (vdown < 1.8))

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
            [ascent_dir, boostback_dir, boostback_dir, retro, entry_dir, descent_dir, landing_dir],
            jnp.asarray([0.0, 0.0, 1.0]),
        )
        # Ascent throttle shaping (reference main.rs:508-517, matching the
        # flown CRS-12 profile): the Max-Q bucket caps throttle while
        # dynamic pressure is high and the vehicle is still subsonic-ish,
        # and the 3.6 g acceleration limit throttles down toward MECO as
        # the stack lightens.
        qbar_now = 0.5 * atmosphere.density(jnp.maximum(h, 0.0)) * speed**2
        bucket = (qbar_now > BUCKET_Q_ON_PA) & (speed < 500.0)
        asc_throttle = jnp.where(bucket, BUCKET_THROTTLE, 1.0)
        u_g_limit = ASCENT_G_LIMIT * m_now / jnp.maximum(
            N_ENGINES * t_eng_max, 1.0
        )
        asc_throttle = jnp.clip(
            jnp.minimum(asc_throttle, u_g_limit), THROTTLE_MIN, 1.0
        )
        throttle = jnp.select(
            [phase == ASCENT, phase == BOOSTBACK, phase == ENTRY, phase == LANDING],
            [asc_throttle, BOOSTBACK_THROTTLE, ENTRY_THROTTLE, landing_throttle],
            0.0,
        )
        mask_all = jnp.asarray(MASK_ALL)
        mask_trio = jnp.asarray(MASK_TRIO)
        mask_center = jnp.asarray(MASK_CENTER)
        landing_mask = jnp.where(three, mask_trio, mask_center)
        landing_mask = jnp.where(lofting, jnp.zeros(N_ENGINES), landing_mask)
        engine_cmd = jnp.select(
            [phase == ASCENT, phase == BOOSTBACK, phase == ENTRY, phase == LANDING],
            [mask_all, mask_trio, mask_trio, landing_mask],
            jnp.zeros(N_ENGINES),
        )
        out_of_prop = prop <= 0.0
        throttle = jnp.where(out_of_prop, 0.0, throttle)
        engine_cmd = jnp.where(out_of_prop, jnp.zeros(N_ENGINES), engine_cmd)
        return (
            phase.astype(jnp.float64),
            throttle,
            engine_cmd,
            from_enu_dir(dir_enu),
            jnp.sum(engine_cmd),
            land_single,
            land_commit,
            meco_t,
        )

    return q.map(
        (Phase, Throttle, EngineCmd, ThrustDir, EnginesLit, LandSingle, LandCommit, MecoT),
        one,
    )


# --- propulsion plant --------------------------------------------------------


@el.system
def engine_dynamics(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[
        el.WorldPos,
        EngineCmd,
        Throttle,
        EngineSpool,
        EngineLitState,
        TeatebCharges,
        Prop,
        ThrustEff,
        Phase,
    ],
) -> el.Query[EngineSpool, EngineLitState, TeatebCharges, ThrustTotal, Prop]:
    """Per-engine spool with ignition gating (reference sim.py:372-433):
    a dark engine lights only while TEA-TEB charges remain (one per light);
    spin-up is slow from cold, throttle response fast once running."""
    dt = ts[0]

    def one(pos, cmd, throttle, spool, lit, charges, prop, eff, phase):
        want = cmd > 0.5
        # A cold (not-spinning) engine needs a TEA-TEB charge to light; a
        # still-running engine accepts a hot re-command without one (the
        # landing lofting guard cuts/restores within the spool-down).
        cold = (lit < 0.5) & (spool < 0.5 * THROTTLE_MIN)
        can_light = charges > 0.5
        lighting = want & cold & can_light
        lit_new = jnp.where(
            want, jnp.where(cold, can_light.astype(spool.dtype), 1.0), 0.0
        )
        charges = charges - lighting.astype(spool.dtype)

        # dry tanks make no thrust: the spool target collapses and the
        # produced force is masked, so a sample that exhausts propellant
        # before touchdown gets no free braking impulse from the spool tail
        has_prop = prop > 0.0
        target = lit_new * jnp.clip(throttle, THROTTLE_MIN, 1.0)
        target = jnp.where(has_prop, target, 0.0)
        running = spool > 0.5 * THROTTLE_MIN
        tau_up = jnp.where(running, ENGINE_THROTTLE_TAU_S, ENGINE_SPINUP_TAU_S)
        tau = jnp.where(target > spool, tau_up, ENGINE_SHUTDOWN_TAU_S)
        spool = spool + (1.0 - jnp.exp(-dt / tau)) * (target - spool)
        spool = jnp.where(spool < 1e-3, 0.0, spool)

        h = altitude_m(pos.linear())
        p_amb = atmosphere.pressure(jnp.maximum(h, 0.0))
        thrust = eff * jnp.sum(prop_mod.engine_thrust_per_engine(spool, p_amb))
        thrust = jnp.where(has_prop, thrust, 0.0)
        mdot = jnp.sum(prop_mod.cluster_mdot(1.0, spool))
        prop_new = jnp.maximum(prop - mdot * dt, 0.0)
        thrust = jnp.where(phase == DOWN, 0.0, thrust)
        return spool, lit_new, charges, thrust, prop_new

    return q.map((EngineSpool, EngineLitState, TeatebCharges, ThrustTotal, Prop), one)


@el.system
def tank_dynamics(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[TankPressure, Prop, EngineSpool, ThrustTotal, el.Inertia],
) -> el.Query[TankPressure, InletPressure]:
    """Isothermal ullage + helium infill while any engine runs; inlet adds
    the acceleration head (reference sim.py:460-520)."""
    dt = ts[0]

    def one(p_tank, prop, spool, thrust, inertia):
        m_lox, m_rp1 = lox_rp1(prop)
        mdot = jnp.sum(prop_mod.cluster_mdot(1.0, spool))
        mdot_lox, mdot_rp1 = prop_mod.split_mdot(mdot)
        infill = jnp.where(jnp.sum(spool) > 1e-3, 1.0, 0.0)
        p_lox = prop_mod.tank_pressure_step(
            p_tank[0], m_lox, mdot_lox, prop_mod.V_TANK_LOX_M3, prop_mod.RHO_LOX,
            infill, 0.0, dt,
        )
        p_rp1 = prop_mod.tank_pressure_step(
            p_tank[1], m_rp1, mdot_rp1, prop_mod.V_TANK_RP1_M3, prop_mod.RHO_RP1,
            infill, 0.0, dt,
        )
        # full stack mass (incl. stage 2 + payload until separation, via
        # mass_props): thrust/(dry+prop) overestimated the ascent head ~28%
        a_axial = thrust / jnp.maximum(inertia.mass(), 1.0)
        inlet = jnp.stack(
            [
                prop_mod.inlet_pressure(
                    p_lox, m_lox, prop_mod.RHO_LOX, prop_mod.LOX_TANK_BOTTOM_M, a_axial, mdot_lox
                ),
                prop_mod.inlet_pressure(
                    p_rp1, m_rp1, prop_mod.RHO_RP1, prop_mod.RP1_TANK_BOTTOM_M, a_axial, mdot_rp1
                ),
            ]
        )
        return jnp.stack([p_lox, p_rp1]), inlet

    return q.map((TankPressure, InletPressure), one)


@el.system
def mass_props(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[Prop, DryMass, MecoT],
) -> el.Query[el.Inertia, CgStation]:
    """Cylinder-stack mass properties each tick (reference sim.py:436-458);
    the dispersed dry mass shifts the dry element, stations stay nominal."""
    t = tick[0] * ts[0]

    def one(prop, dry, meco_t):
        m_lox, m_rp1 = lox_rp1(prop)
        sep_done = (meco_t >= 0.0) & (t >= meco_t + SEP_DELAY_S)
        m_upper = jnp.where(sep_done, 0.0, STAGE2_AND_PAYLOAD_KG)
        mass, cg, i_diag = prop_mod.stack_mass_props(m_lox, m_rp1, m_upper)
        mass = mass + (dry - STAGE1_DRY_MASS_KG)
        return el.SpatialInertia(mass=mass, inertia=i_diag), cg

    return q.map((el.Inertia, CgStation), one)


# --- attitude inner loop -----------------------------------------------------


@el.map
def airdata(
    pos: el.WorldPos, vel: el.WorldVel, wind: Wind
) -> tuple[Qbar, MachNum]:
    h = jnp.maximum(altitude_m(pos.linear()), 0.0)
    v_air = vel.linear() - from_enu_dir(wind)
    speed = la.norm(v_air)
    return (
        0.5 * atmosphere.density(h) * speed * speed,
        speed / atmosphere.speed_of_sound(h),
    )


@el.map
def attitude_control(
    pos: el.WorldPos,
    vel: el.WorldVel,
    tdir: ThrustDir,
    phase: Phase,
    inertia: el.Inertia,
    thrust: ThrustTotal,
    cg: CgStation,
    qbar: Qbar,
    mach: MachNum,
    wind: Wind,
) -> tuple[TvcCmd, FinCmd, RcsCmd]:
    """Inertia-scaled quaternion-error PD with phase-scheduled bandwidth
    (reference sim.py:684-733), allocated to TVC (powered pitch/yaw), grid
    fins (aero descent), and the RCS (roll always; everything unpowered)."""
    q = pos.angular()
    x_body = q @ jnp.asarray([1.0, 0.0, 0.0])
    d = tdir / (la.norm(tdir) + 1e-9)
    axis_w = jnp.cross(x_body, d)
    s = la.norm(axis_w)
    ang = jnp.arctan2(s, jnp.clip(jnp.dot(x_body, d), -1.0, 1.0))
    axis_w = jnp.where(s > 1e-8, axis_w / (s + 1e-12), jnp.zeros(3))
    err_body = q.inverse() @ (axis_w * ang)
    omega_body = q.inverse() @ vel.angular()
    i_diag = inertia.inertia_diag()

    landing = phase == LANDING
    tvc_on = thrust > TVC_THRUST_MIN_N
    # Authority-aware bandwidth: a single engine's gimbal torque
    # (T*cg*TVC_MAX ~ 0.9 MN m) is ~3x short of what wn=1.7 demands at
    # even 1.7 deg of error near touchdown — the loop saturates the
    # gimbal and rings to ~7 deg of tilt.  Cap wn so the PD's stiffness
    # term stays inside the gimbal authority at the current error.
    tau_max = TVC_MAX_RAD * jnp.maximum(cg * thrust, 1.0)
    i_tr = jnp.maximum(inertia.inertia_diag()[1], inertia.inertia_diag()[2])
    wn_auth = jnp.sqrt(tau_max / (i_tr * jnp.maximum(ang, 0.05)))
    wn_land = jnp.minimum(ATT_WN_TVC_LANDING, wn_auth)
    wn = jnp.where(tvc_on, jnp.where(landing, wn_land, ATT_WN_TVC), ATT_WN_RCS)
    zeta = jnp.where(tvc_on, ATT_ZETA_TVC, ATT_ZETA_RCS)
    # No roll reference (axisymmetric): damp roll rate only.
    err_vec = err_body * jnp.asarray([0.0, 1.0, 1.0])
    torque_des = i_diag * (wn**2 * err_vec - 2.0 * zeta * wn * omega_body)

    # TVC: lateral thrust fractions (dy, dz); tau = (0, T cg dz, -T cg dy).
    lever = jnp.maximum(cg * thrust, 1.0)
    tvc_cmd = jnp.where(
        tvc_on,
        jnp.stack([-torque_des[2] / lever, torque_des[1] / lever]),
        jnp.zeros(2),
    )
    tvc_cmd = jnp.clip(tvc_cmd, -TVC_MAX_RAD, TVC_MAX_RAD)
    tvc_torque = jnp.stack([0.0 * lever, lever * tvc_cmd[1], -lever * tvc_cmd[0]])

    # Grid fins pick up what the TVC doesn't, once there is dynamic pressure.
    fins_on = (~tvc_on) & (qbar > FIN_Q_MIN_PA) & (phase >= ENTRY)
    resid = torque_des - jnp.where(tvc_on, tvc_torque, jnp.zeros(3))
    auth = aero.fin_torque_authority(mach, jnp.maximum(qbar, 1.0), cg)
    # Trim feedforward: cancel the static aero restoring moment at the
    # current AoA, so the PD holds the commanded steering tilt instead of
    # equilibrating at a fraction of it (fins must out-muscle the stable
    # engines-first static margin to steer by body lift).
    v_air_body = q.inverse() @ (vel.linear() - from_enu_dir(wind))
    _, tau_static = aero.body_aero_wrench(
        v_air_body, mach, qbar, cg, omega_body=jnp.zeros(3)
    )
    resid = resid - jnp.where(fins_on, tau_static, jnp.zeros(3))
    pyr_cmd = jnp.stack(
        [resid[1] / jnp.maximum(auth[1], 1.0),  # pitch
         resid[2] / jnp.maximum(auth[2], 1.0),  # yaw
         resid[0] / jnp.maximum(auth[0], 1.0)]  # roll
    )
    pyr_cmd = jnp.clip(pyr_cmd, -FIN_MAX_RAD, FIN_MAX_RAD)
    fin_cmd = jnp.where(fins_on, aero.fin_mix(pyr_cmd), jnp.zeros(4))

    # RCS: roll when powered, everything unpowered in thin air; shut off
    # while the fins own attitude (holding AoA against the static margin on
    # cold gas would drain the nitrogen budget — reference main.rs:611).
    resid_rcs = jnp.where(
        tvc_on, jnp.stack([torque_des[0], 0.0 * lever, 0.0 * lever]), resid
    )
    in_deadband = (la.norm(err_vec) < RCS_DEADBAND_ATT_RAD) & (
        la.norm(omega_body) < RCS_DEADBAND_RATE_RADPS
    )
    rcs_cmd = jnp.where(
        in_deadband | fins_on | (phase == DOWN),
        jnp.zeros(8),
        rcs_mod.allocate_torque(resid_rcs, cg),
    )
    return tvc_cmd, fin_cmd, rcs_cmd


@el.system
def actuators(
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[TvcCmd, TvcState, FinCmd, FinState, RcsCmd, RcsState],
) -> el.Query[TvcState, FinState, RcsState]:
    """Rate-limited first-order actuators (reference sim.py:522-547)."""
    dt = ts[0]

    def one(tvc_cmd, tvc, fin_cmd, fin, rcs_cmd, rcs):
        return (
            prop_mod.actuator_step(
                tvc, tvc_cmd, dt, TVC_TAU_S, TVC_RATE_RADPS, -TVC_MAX_RAD, TVC_MAX_RAD
            ),
            prop_mod.actuator_step(
                fin, fin_cmd, dt, FIN_TAU_S, FIN_RATE_RADPS, -FIN_MAX_RAD, FIN_MAX_RAD
            ),
            prop_mod.actuator_step(rcs, rcs_cmd, dt, RCS_VALVE_TAU_S, lo=0.0, hi=1.0),
        )

    return q.map((TvcState, FinState, RcsState), one)


# --- effectors (forces + torques) --------------------------------------------


@el.map
def effectors(
    pos: el.WorldPos,
    vel: el.WorldVel,
    inertia: el.Inertia,
    phase: Phase,
    thrust: ThrustTotal,
    tvc: TvcState,
    fin: FinState,
    rcs_lv: RcsState,
    wind: Wind,
    cd_desc: CdDescent,
    cg: CgStation,
    qbar: Qbar,
    mach: MachNum,
    f: el.Force,
) -> tuple[el.Force, SpecForceBody]:
    """Rotating-ECEF forces: gravity + frame pseudo-forces (world), thrust /
    body aero / grid fins / RCS (body wrenches rotated out).  Mirrors the
    reference's apply_body_wrenches sum (sim.py:660-673)."""
    r = pos.linear()
    v = vel.linear()
    m = inertia.mass()
    q = pos.angular()

    g = -MU_EARTH_M3S2 * r / la.norm(r) ** 3
    w_e = jnp.asarray([0.0, 0.0, OMEGA_EARTH_RADPS])
    frame_acc = -jnp.cross(w_e, jnp.cross(w_e, r)) - 2.0 * jnp.cross(w_e, v)

    v_air_world = v - from_enu_dir(wind)
    v_air_body = q.inverse() @ v_air_world
    omega_body = q.inverse() @ vel.angular()

    # Thrust along the gimballed engine axis, applied at the engine plane.
    t_dir_body = jnp.stack([1.0 - 0.5 * (tvc[0] ** 2 + tvc[1] ** 2), tvc[0], tvc[1]])
    f_thrust = thrust * t_dir_body
    tau_thrust = jnp.cross(jnp.asarray([-1.0, 0.0, 0.0]) * cg, f_thrust)

    # Body aero from the Mach tables, erased by plume dominance.
    kappa = aero.plume_dominance(thrust, qbar)
    ca_scale = aero.config_blend(v_air_body[0]) + (
        1.0 - aero.config_blend(v_air_body[0])
    ) * (cd_desc / CD_DESCENT_NOMINAL)
    f_aero, tau_aero = aero.body_aero_wrench(
        v_air_body, mach, qbar, cg, omega_body=omega_body, ca_scale=ca_scale
    )
    f_fin, tau_fin = aero.fin_wrench(fin, mach, qbar, cg)
    f_aero = (1.0 - kappa) * f_aero
    tau_aero = (1.0 - kappa) * tau_aero

    f_rcs, tau_rcs = rcs_mod.rcs_wrench(rcs_lv, cg)

    f_body = f_thrust + f_aero + f_fin + f_rcs
    tau_body = tau_thrust + tau_aero + tau_fin + tau_rcs

    down = phase == DOWN
    force_w = jnp.where(down, jnp.zeros(3), m * (g + frame_acc) + (q @ f_body))
    torque_w = jnp.where(down, jnp.zeros(3), q @ tau_body)
    spec_force = jnp.where(down, jnp.zeros(3), f_body / m)
    return (
        el.SpatialForce(torque=f.torque() + torque_w, linear=f.force() + force_w),
        spec_force,
    )


# --- sensors -----------------------------------------------------------------


@el.system
def sensor_suite(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[
        el.WorldPos,
        el.WorldVel,
        SpecForceBody,
        MachNum,
        ThrustTotal,
        TankPressure,
        InletPressure,
        sn.GpsTimer,
        sn.GpsPos,
        sn.GpsVel,
        sn.GpsCount,
        sn.RadarTimer,
        sn.RadarRange,
        sn.RadarCount,
    ],
) -> el.Query[
    sn.ImuAccel,
    sn.ImuGyro,
    sn.GpsTimer,
    sn.GpsPos,
    sn.GpsVel,
    sn.GpsCount,
    sn.RadarTimer,
    sn.RadarRange,
    sn.RadarCount,
    sn.PressureMeas,
    sn.DisplaySpeed,
    sn.DisplayAlt,
]:
    """IMU at the physics rate; GPS/radar on timer-accumulator + hold with
    sample counters; GPS blackout in the retropropulsion plasma
    (reference sim.py:1019-1124, sensors.py)."""
    dt = ts[0]
    k = tick[0]

    def one(
        pos, vel, sf_body, mach, thrust, tank_p, inlet_p,
        gps_timer, gps_pos, gps_vel, gps_count,
        radar_timer, radar_range, radar_count,
    ):
        q = pos.angular()
        r_enu = to_enu(pos.linear())
        v_enu = vec_enu(vel.linear())
        omega_body = q.inverse() @ vel.angular()

        imu_accel = sf_body + sn.noise(k, 1, (3,), sn.IMU_ACCEL_SIGMA)
        w_earth_body = q.inverse() @ jnp.asarray([0.0, 0.0, OMEGA_EARTH_RADPS])
        imu_gyro = omega_body + w_earth_body + sn.noise(k, 2, (3,), sn.IMU_GYRO_SIGMA)

        # GPS: 25 Hz sample-and-hold, blacked out during hot retropropulsion.
        gps_timer = gps_timer + dt
        gps_due = gps_timer >= 1.0 / sn.GPS_RATE_HZ
        blackout = (mach > sn.BLACKOUT_MACH_MIN) & (thrust > sn.BLACKOUT_THRUST_MIN_N)
        gps_fire = gps_due & ~blackout
        gps_timer = jnp.where(gps_due, gps_timer - 1.0 / sn.GPS_RATE_HZ, gps_timer)
        next_count = gps_count + 1.0
        gps_pos = jnp.where(
            gps_fire, r_enu + sn.noise(next_count, 3, (3,), sn.GPS_POS_SIGMA), gps_pos
        )
        gps_vel = jnp.where(
            gps_fire, v_enu + sn.noise(next_count, 4, (3,), sn.GPS_VEL_SIGMA), gps_vel
        )
        gps_count = jnp.where(gps_fire, next_count, gps_count)

        # Radar altimeter: looks along -X (engines-first descent), FOV+range gated.
        radar_timer = radar_timer + dt
        radar_due = radar_timer >= 1.0 / sn.RADAR_RATE_HZ
        radar_timer = jnp.where(radar_due, radar_timer - 1.0 / sn.RADAR_RATE_HZ, radar_timer)
        boresight = q @ jnp.asarray([-1.0, 0.0, 0.0])
        up_world = from_enu_dir(jnp.asarray([0.0, 0.0, 1.0]))
        cos_down = jnp.dot(boresight, -up_world)
        h = jnp.maximum(r_enu[2], 0.0)
        slant = h / jnp.maximum(cos_down, 1e-3)
        visible = (cos_down > sn.RADAR_FOV_COS) & (slant < sn.RADAR_MAX_RANGE_M)
        next_rcount = radar_count + 1.0
        meas = slant + sn.noise(next_rcount, 5, (), sn.RADAR_SIGMA_M)
        radar_range = jnp.where(radar_due, jnp.where(visible, meas, -1.0), radar_range)
        radar_count = jnp.where(radar_due & visible, next_rcount, radar_count)

        pressure = jnp.concatenate([tank_p, inlet_p]) + sn.noise(
            k, 6, (4,), sn.PRESSURE_SIGMA_PA
        )

        speed = la.norm(v_enu)
        disp_speed = jnp.round(speed / sn.DISPLAY_SPEED_STEP) * sn.DISPLAY_SPEED_STEP
        disp_alt = jnp.round(r_enu[2] / sn.DISPLAY_ALT_STEP) * sn.DISPLAY_ALT_STEP
        return (
            imu_accel, imu_gyro,
            gps_timer, gps_pos, gps_vel, gps_count,
            radar_timer, radar_range, radar_count,
            pressure, disp_speed, disp_alt,
        )

    return q.map(
        (
            sn.ImuAccel, sn.ImuGyro,
            sn.GpsTimer, sn.GpsPos, sn.GpsVel, sn.GpsCount,
            sn.RadarTimer, sn.RadarRange, sn.RadarCount,
            sn.PressureMeas, sn.DisplaySpeed, sn.DisplayAlt,
        ),
        one,
    )


# --- ground interaction ------------------------------------------------------


@el.map
def contact(
    pos: el.WorldPos,
    vel: el.WorldVel,
    phase: Phase,
    thrust: ThrustTotal,
    inertia: el.Inertia,
    cg: CgStation,
    lifted: Lifted,
    tdvz: TouchdownVz,
    tdvlat: TouchdownVlat,
    tdtilt: TouchdownTilt,
    miss: MissDistance,
) -> tuple[el.WorldPos, el.WorldVel, Phase, Lifted, TouchdownVz, TouchdownVlat, TouchdownTilt, MissDistance]:
    """Pad hold-down until thrust exceeds weight; touchdown latch + upright
    pin at the end (reference pad_clamp sim.py:984 + ground_contact :800)."""
    r_enu = to_enu(pos.linear())
    v_enu = vec_enu(vel.linear())
    q = pos.angular()
    up_w = from_enu_dir(jnp.asarray([0.0, 0.0, 1.0]))
    x_body = q @ jnp.asarray([1.0, 0.0, 0.0])
    tilt = jnp.arccos(jnp.clip(jnp.dot(x_body, up_w), -1.0, 1.0))

    m = inertia.mass()
    released = lifted > 0.5
    release_now = (~released) & (thrust > m * G0 * 1.001)
    lifted_new = jnp.where(released | release_now, 1.0, 0.0)

    # Touchdown: engine plane reaches the LZ-1 deck during terminal descent.
    h_e = r_enu[2] - jnp.asarray(_LZ1_ENU)[2] - cg * jnp.cos(tilt)
    down_now = (phase >= LANDING) & (phase < DOWN) & (h_e <= 0.4) & (v_enu[2] < 1.5)
    was_down = phase == DOWN
    first = down_now & ~was_down
    phase_new = jnp.where(down_now | was_down, jnp.float64(DOWN), phase)

    tdvz_new = jnp.where(first, v_enu[2], tdvz)
    tdvlat_new = jnp.where(first, la.norm(v_enu[:2]), tdvlat)
    tdtilt_new = jnp.where(first, jnp.degrees(tilt), tdtilt)
    miss_new = jnp.where(
        first, la.norm(r_enu[:2] - jnp.asarray(_LZ1_ENU)[:2]), miss
    )

    hold = (~released) & (~release_now)
    frozen = was_down | first | hold
    vel_out = el.SpatialMotion(
        angular=jnp.where(frozen, jnp.zeros(3), vel.angular()),
        linear=jnp.where(frozen, jnp.zeros(3), vel.linear()),
    )
    # while held down the vehicle sits on the pad: re-pin the CG to
    # pad + cg·û every tick, otherwise the a·dt² residual of each
    # zero-velocity tick accumulates ~0.1-0.3 m of pad penetration over
    # the 2-3 s spool-up and biases the early-ascent altitude datum
    # el.const_pin: without it the axon TPU fuser drops the pad anchor's
    # f64 low limb inside the tick loop (0.2 m datum error — precise.py)
    pad_cg = el.const_pin(_PAD_ECEF) + cg * jnp.asarray(_U_HAT)
    lin_out = jnp.where(hold, pad_cg, pos.linear())
    # post-touchdown: pin the vertical so the landed booster doesn't keep
    # sinking g*dt^2 per zero-velocity tick (~0.1 m/s of deck penetration
    # corrupting post-landing trajectories); lateral position stays put
    h_err = (jnp.asarray(_LZ1_ENU)[2] + cg * jnp.cos(tilt) + 0.4) - r_enu[2]
    lin_out = jnp.where(
        was_down | first,
        lin_out + h_err * jnp.asarray(_U_HAT),
        lin_out,
    )
    return (
        el.SpatialTransform(angular=pos.angular(), linear=lin_out),
        vel_out,
        phase_new,
        lifted_new,
        tdvz_new,
        tdvlat_new,
        tdtilt_new,
        miss_new,
    )


# --- build -------------------------------------------------------------------


def build(params=None, sensors: bool = True) -> tuple[el.World, el.System]:
    p = {
        k: (params.get(k, v.default) if params else v.default) for k, v in PARAMS.items()
    }
    w = el.World()
    booster = Booster(
        thrust_eff=jnp.float64(p["thrust_eff"]),
        dry_mass=jnp.float64(p["dry_mass"]),
        wind=jnp.asarray([p["wind_e"], p["wind_n"], 0.0]),
        cd_descent=jnp.float64(p["cd_descent"]),
    )
    m0 = p["dry_mass"] + STAGE1_PROP_KG + STAGE2_AND_PAYLOAD_KG
    _, cg0, i0 = prop_mod.stack_mass_props(
        LOX_LOAD_KG, RP1_LOAD_KG, STAGE2_AND_PAYLOAD_KG
    )
    body = el.Body(
        world_pos=el.SpatialTransform(
            angular=upright_attitude(),
            linear=jnp.asarray(_PAD_ECEF) + float(cg0) * jnp.asarray(_U_HAT),
        ),
        world_vel=el.SpatialMotion(),
        inertia=el.SpatialInertia(mass=jnp.float64(m0), inertia=i0),
    )
    spawn = [body, booster]
    if sensors:
        spawn.append(sn.SensorSuite())
    w.spawn(spawn, name="Booster")

    sys = (
        # GNC at 20 Hz against the 100 Hz plant (el.every zero-order-holds
        # phase/throttle/engine pattern/thrust_dir between updates): the
        # real FSW rate split — F9-class guidance loops run well below the
        # plant rate — and the campaign's hottest compute (the 24-step IIP
        # scan inside guidance) runs on 1 of 5 ticks through ascent,
        # boostback, and entry.  From DESCENT on, guidance escalates to
        # full rate: the suicide-burn ignition altitude and the terminal
        # throttle loop cannot tolerate 50 ms command staleness (dispersed
        # tails lost the soft-landing envelope when they did; escalating a
        # phase earlier, at ENTRY, was measured to buy no extra softness).
        # Attitude control and engine/actuator dynamics stay at full rate.
        # Cost of the 20 Hz schedule on 1250 dispersed samples: soft-frac
        # 0.9912 -> 0.98 for a 64 -> 51 s share wall; GUIDANCE_EVERY_TICKS=1
        # restores the legacy every-tick guidance.
        el.every(GUIDANCE_EVERY_TICKS, guidance,
                 full_rate_when=lambda cols: cols["phase"] >= DESCENT)
        | engine_dynamics
        | tank_dynamics
        | mass_props
        | airdata
        | attitude_control
        | actuators
        | el.six_dof(sys=effectors, integrator=el.Integrator.SemiImplicit)
    )
    if sensors:
        sys = sys | sensor_suite
    sys = sys | contact
    return w, sys


def world() -> el.World:
    return build()[0]


def system() -> el.System:
    return build()[1]
