"""Falcon 9 model-level gates: US76 anchors, propulsion anchors and budget,
RCS/fin control effectiveness, canonical aero directions, plume dominance,
the flip-time budget, and the ZEM/ZEV landing-guidance replay.

Repo-side equivalents of the reference example suites
(examples/falcon9/test_aero.py, test_propulsion.py, test_zem_zev.py,
test_ladder.py — US76/actuator/mass-prop/authority anchors)."""

import importlib.util
import math
import os
import sys

import jax.numpy as jnp
import numpy as np

import elodin  # noqa: F401  (enables the f64 float policy)

F9_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples", "falcon9"
)


def _load(name: str):
    """Load a falcon9-local module under a prefixed sys.modules key, with the
    example dir on sys.path so its own plain imports resolve."""
    key = f"f9_{name}"
    if key in sys.modules:
        return sys.modules[key]
    sys.path.insert(0, F9_DIR)
    try:
        spec = importlib.util.spec_from_file_location(key, os.path.join(F9_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


atmosphere = _load("atmosphere")
constants = _load("constants")
propulsion = _load("propulsion")
aero = _load("aero")
rcs = _load("rcs")
zemzev = _load("zemzev")


# --- atmosphere --------------------------------------------------------------


def test_us76_anchors():
    assert abs(float(atmosphere.density(0.0)) - 1.2250) < 1e-3
    p11, t11 = atmosphere.pressure_temperature_at_geopotential(11_000.0)
    assert abs(float(p11) - 22_632.0) < 5.0
    assert abs(float(t11) - 216.65) < 1e-9
    assert abs(float(p11) / (atmosphere.R_AIR * float(t11)) - 0.3639) < 1e-3
    assert abs(float(atmosphere.speed_of_sound(0.0)) - 340.29) < 0.1
    assert float(atmosphere.density(100_000.0)) < 1e-5
    # Monotone decreasing pressure across every layer boundary.
    hs = np.linspace(0.0, 120_000.0, 400)
    p = np.asarray(atmosphere.pressure(jnp.asarray(hs)))
    assert (np.diff(p) < 0).all()


# --- propulsion --------------------------------------------------------------


def test_thrust_altitude_anchors():
    t_sl = float(propulsion.engine_thrust_per_engine(1.0, constants.P_SL_PA))
    t_vac = float(propulsion.engine_thrust_per_engine(1.0, 0.0))
    assert abs(t_sl - constants.ENGINE_T_SL_N) < 1.0
    assert abs(t_vac - constants.ENGINE_T_VAC_N) < 1.0
    assert abs((t_vac - t_sl) / constants.P_SL_PA - 0.681) < 1e-3


def test_propellant_budget_audit():
    """~275 kg/s per engine; the CRS-12 four-burn budget closes on the load."""
    mdot = float(propulsion.cluster_mdot(1.0, 1.0))
    assert abs(mdot - constants.ENGINE_T_SL_N / (constants.ENGINE_ISP_SL_S * constants.G0)) < 0.5
    assert abs(mdot - 275.0) < 3.0
    ascent = 9 * mdot * 147.0 - 9 * mdot * 39.0 * 0.3  # throttle-bucket credit
    burns = ascent + 3 * mdot * 46.0 + 3 * mdot * 14.0 + 1 * mdot * 0.7 * 33.0
    assert 0.93 * constants.STAGE1_PROP_KG < burns < 1.01 * constants.STAGE1_PROP_KG


def test_liftoff_thrust_to_weight():
    t = constants.N_ENGINES * float(
        propulsion.engine_thrust_per_engine(1.0, constants.P_SL_PA)
    )
    assert 1.2 < t / (constants.LIFTOFF_MASS_KG * constants.G0) < 1.4


def test_actuator_exact_discretization():
    tau = 0.007
    x = jnp.asarray(0.0)
    for _ in range(7):
        x = propulsion.actuator_step(x, 1.0, 0.001, tau)
    assert abs(float(x) - (1.0 - math.exp(-1.0))) < 1e-9
    # A giant step lands on the command without overshoot.
    x_big = propulsion.actuator_step(jnp.asarray(0.0), 1.0, 0.7, tau)
    assert 0.0 < float(x_big) <= 1.0 and abs(float(x_big) - 1.0) < 1e-9
    # Rate limit engages.
    x_rl = propulsion.actuator_step(jnp.asarray(0.0), 1.0, 0.001, 1e-6, rate_limit=10.0)
    assert abs(float(x_rl) - 0.01) < 1e-12


def test_stack_mass_props():
    mass, cg, inertia = propulsion.stack_mass_props(
        constants.LOX_LOAD_KG, constants.RP1_LOAD_KG
    )
    assert abs(float(mass) - (constants.STAGE1_DRY_MASS_KG + constants.STAGE1_PROP_KG)) < 1.0
    assert 0.0 < float(cg) < constants.STAGE1_LENGTH_M
    assert np.all(np.asarray(inertia) > 0.0)
    assert float(inertia[1]) > 10.0 * float(inertia[0])  # slender stack
    # CG walks down while the columns drain, then pops back to the dry station.
    cgs = [
        float(propulsion.stack_mass_props(constants.LOX_LOAD_KG * f, constants.RP1_LOAD_KG * f)[1])
        for f in (1.0, 0.6, 0.3)
    ]
    assert cgs[0] > cgs[1] > cgs[2]
    cg_dry = float(propulsion.stack_mass_props(0.0, 0.0)[1])
    assert abs(cg_dry - propulsion.DRY_CG_STATION_M) < 1e-6
    assert cgs[2] < cg_dry < cgs[0]
    # Attached stage 2 pulls the CG well above the interstage-less stack.
    cg_full = float(
        propulsion.stack_mass_props(
            constants.LOX_LOAD_KG, constants.RP1_LOAD_KG, constants.STAGE2_AND_PAYLOAD_KG
        )[1]
    )
    assert cg_full > cgs[0] + 5.0


def test_tank_pressure_dynamics():
    """Draining alone drops pressure; the infill valve recovers it toward the
    regulator setpoint; venting bleeds it down."""
    p = jnp.asarray(constants.TANK_P_NOM_PA)
    m = jnp.asarray(constants.LOX_LOAD_KG * 0.5)
    drained = propulsion.tank_pressure_step(
        p, m, 2000.0, propulsion.V_TANK_LOX_M3, propulsion.RHO_LOX, 0.0, 0.0, 1.0
    )
    assert float(drained) < float(p)
    refilled = propulsion.tank_pressure_step(
        drained, m, 0.0, propulsion.V_TANK_LOX_M3, propulsion.RHO_LOX, 1.0, 0.0, 1.0
    )
    assert float(drained) < float(refilled) <= propulsion.P_REGULATOR_PA + 1.0
    vented = propulsion.tank_pressure_step(
        p, m, 0.0, propulsion.V_TANK_LOX_M3, propulsion.RHO_LOX, 0.0, 1.0, 1.0
    )
    assert float(vented) < float(p)
    # Inlet pressure gains the acceleration head.
    p_in = propulsion.inlet_pressure(
        p, m, propulsion.RHO_LOX, propulsion.LOX_TANK_BOTTOM_M, 30.0, 1000.0
    )
    assert float(p_in) > float(p)


# --- RCS ---------------------------------------------------------------------


def test_rcs_axis_purity_and_authority():
    cg = 22.0
    b = np.asarray(rcs.effectiveness_matrix(jnp.asarray(cg)))
    assert b.shape == (6, rcs.N_RCS)
    authority = [abs(b[3 + axis, :]).sum() / 2.0 for axis in range(3)]
    for axis in range(3):
        for sign in (+1.0, -1.0):
            cmd = np.zeros(3)
            cmd[axis] = sign * 0.5 * authority[axis]
            levels = rcs.allocate_torque(jnp.asarray(cmd), jnp.asarray(cg))
            _, torque = rcs.rcs_wrench(levels, jnp.asarray(cg))
            torque = np.asarray(torque)
            assert abs(torque[axis] - cmd[axis]) < 1e-6 * abs(cmd[axis]) + 1e-9
            off = np.delete(torque, axis)
            assert np.all(np.abs(off) < 1e-9), f"off-axis torque {torque}"
    # Saturation pegs exactly the two thrusters of the chosen pair.
    levels = np.asarray(rcs.allocate_torque(jnp.asarray([0.0, 0.0, 1e9]), jnp.asarray(cg)))
    assert levels.max() <= 1.0 + 1e-12
    assert np.count_nonzero(levels > 0.99) == 2
    # Minimum-impulse floor: a 1% demand stays closed.
    tiny = np.asarray(
        rcs.allocate_torque(jnp.asarray([0.0, 0.01 * authority[1], 0.0]), jnp.asarray(cg))
    )
    assert np.all(tiny == 0.0)


def test_rcs_roll_force_free():
    cg = 22.0
    for tx in (+4.0e5, -4.0e5):
        levels = rcs.allocate_torque(jnp.asarray([tx, 0.0, 0.0]), jnp.asarray(cg))
        force, _ = rcs.rcs_wrench(levels, jnp.asarray(cg))
        assert np.all(np.abs(np.asarray(force)) < 1e-9)


def test_flip_time_budget():
    """Bang-bang 180-deg flip with the RCS pitch authority fits the recorded
    MECO-to-boostback window (~15-20 s)."""
    frac = 63_000.0 / constants.STAGE1_PROP_KG  # post-MECO reserve
    _, cg, inertia = propulsion.stack_mass_props(
        constants.LOX_LOAD_KG * frac, constants.RP1_LOAD_KG * frac
    )
    b = np.asarray(rcs.effectiveness_matrix(cg))
    pitch_auth = abs(b[4, :]).sum() / 2.0
    alpha = pitch_auth / float(inertia[1])
    t_flip = 2.0 * math.sqrt(math.pi / alpha)
    assert 8.0 < t_flip < 22.0, f"flip {t_flip:.1f} s"


# --- aero --------------------------------------------------------------------


def test_fin_mixing_axis_purity():
    cg = 20.0
    mach, qbar = 2.0, 30_000.0
    for axis, cmd in ((1, [0.1, 0.0, 0.0]), (2, [0.0, 0.1, 0.0]), (0, [0.0, 0.0, 0.1])):
        deltas = aero.fin_mix(jnp.asarray(cmd))
        _, torque = aero.fin_wrench(deltas, mach, qbar, cg)
        torque = np.asarray(torque)
        assert np.argmax(np.abs(torque)) == axis, f"cmd {cmd}: {torque}"
        # Positive command must produce POSITIVE torque about its own axis —
        # the attitude controller divides residuals by |authority| and assumes
        # this convention (a sign flip here is positive feedback in the loop).
        assert torque[axis] > 0.0, f"cmd {cmd}: {torque}"
        off = np.delete(torque, axis)
        assert np.all(np.abs(off) < 1e-9 * max(1.0, abs(torque[axis])))
    # A pure roll command is force-free (tangential forces cancel).
    force, _ = aero.fin_wrench(aero.fin_mix(jnp.asarray([0.0, 0.0, 0.2])), mach, qbar, cg)
    assert np.all(np.abs(np.asarray(force)) < 1e-9)


def test_aero_canonical_directions():
    cg, qbar = 22.5, 20_000.0
    s = constants.S_REF_M2
    # Nose-first axial flow: pure axial drag, no torque, ascent table.
    f, t = aero.body_aero_wrench(jnp.asarray([500.0, 0.0, 0.0]), 1.5, qbar, cg)
    f, t = np.asarray(f), np.asarray(t)
    assert f[0] < 0.0 and abs(f[1]) < 1e-9 and abs(f[2]) < 1e-9
    assert np.all(np.abs(t) < 1e-9)
    ca_a = float(aero.mach_lookup(aero.CA_ASCENT, 1.5))
    assert abs(f[0] + qbar * s * ca_a) < 1e-2  # tanh blend residual
    # Engines-first flow: descent table, much draggier.
    f, _ = aero.body_aero_wrench(jnp.asarray([-500.0, 0.0, 0.0]), 1.5, qbar, cg)
    f = np.asarray(f)
    ca_d = float(aero.mach_lookup(aero.CA_DESCENT, 1.5))
    assert f[0] > 0.0 and abs(f[0] - qbar * s * ca_d) < 1e-2
    assert ca_d > 2.0 * ca_a
    # Pure cross-flow: force opposes flow, static moment about +Y only.
    f, t = aero.body_aero_wrench(jnp.asarray([0.0, 0.0, 300.0]), 0.8, qbar, cg)
    f, t = np.asarray(f), np.asarray(t)
    assert f[2] < 0.0 and abs(f[0]) < 1e-6
    assert abs(t[1]) > 0.0 and abs(t[0]) < 1e-9 and abs(t[2]) < 1e-9


def test_pitch_damping_opposes_rate():
    cg, qbar = 22.5, 40_000.0
    v = jnp.asarray([-400.0, 0.0, 0.0])
    _, t0 = aero.body_aero_wrench(v, 1.5, qbar, cg, omega_body=jnp.zeros(3))
    _, t1 = aero.body_aero_wrench(v, 1.5, qbar, cg, omega_body=jnp.asarray([0.0, 0.5, 0.0]))
    assert float(t1[1]) < float(t0[1]) - 1e3


def test_plume_dominance():
    assert float(aero.plume_dominance(jnp.asarray(0.0), jnp.asarray(30_000.0))) == 0.0
    kappa_entry = float(aero.plume_dominance(jnp.asarray(2.3e6), jnp.asarray(30_000.0)))
    assert 0.85 < kappa_entry < 0.95
    assert float(aero.plume_dominance(jnp.asarray(5.0e5), jnp.asarray(40_000.0))) > 0.5


def test_fin_torque_authority_positive_at_speed():
    auth = np.asarray(aero.fin_torque_authority(1.2, 30_000.0, 20.0))
    assert np.all(auth > 0.0)
    # Pitch/yaw authority (long station lever) dwarfs roll (radius lever).
    assert auth[1] > 5.0 * auth[0] and auth[2] > 5.0 * auth[0]


# --- ZEM/ZEV -----------------------------------------------------------------


def test_zem_zev_closes_recorded_ignition_miss():
    r, v = zemzev.replay(*zemzev.ignition_state())
    r, v = np.asarray(r), np.asarray(v)
    miss = float(np.hypot(r[0], r[1]))
    verr = float(np.linalg.norm(v - np.array([0.0, 0.0, -zemzev.V_TD_MPS])))
    assert miss < 2.0, f"terminal miss {miss:.2f} m"
    assert verr < 0.5, f"terminal velocity err {verr:.2f} m/s"


def test_zem_zev_robust_to_larger_ignition_miss():
    r0, v0 = zemzev.ignition_state(miss_m=600.0, vlat_mps=40.0, vdown_mps=250.0, alt_m=3500.0)
    r, v = zemzev.replay(r0, v0)
    r, v = np.asarray(r), np.asarray(v)
    assert float(np.hypot(r[0], r[1])) < 10.0
    assert float(np.linalg.norm(v - np.array([0.0, 0.0, -zemzev.V_TD_MPS]))) < 2.0


def test_zem_zev_tilt_cap_respected():
    """Along the nominal replay, the commanded lateral accel never exceeds
    tan(TILT_CAP) of the vertical (pre-commit)."""
    up = jnp.asarray([0.0, 0.0, 1.0])
    r, v = zemzev.ignition_state()
    for _ in range(200):
        alt = float(r[2])
        if alt < zemzev.COMMIT_ALT_M + 5.0:
            break
        t_go, t_raw = zemzev.t_go_hoverslam(alt, -float(v[2]))
        a = np.asarray(zemzev.accel_cmd(r, v, up, t_go, jnp.asarray(False)))
        a_up, a_lat = a[2], float(np.hypot(a[0], a[1]))
        if a_up > 1.0:
            assert a_lat <= abs(a_up) * math.tan(zemzev.TILT_CAP_RAD) + 1e-6
        r, v = zemzev.step(r, v, up, 0.25)


# ---- sensor gates (reference test_sensors.py behavioral port) --------------


def _mission_probe(ticks):
    S = _load("sim")

    w, sysm = S.build()
    ex = w.build(sysm, simulation_rate=S.SIM_RATE_HZ)
    ex.record_history = False
    ex.run(ticks, show_progress=False)

    def get(name):
        return np.asarray(ex.read_component(f"booster.{name}")).ravel()

    return get


def test_imu_earth_rate_gyro_and_specific_force_on_pad():
    """Held on the pad, engines dark: the gyro reads exactly the Earth rate
    in the body frame, and the accelerometer reads ~0 specific force (the
    model excludes the hold-down normal force, like the reference's
    freefall identity, test_sensors.py:77)."""
    sn = _load("sensors")
    OMEGA_EARTH_RADPS = constants.OMEGA_EARTH_RADPS

    get = _mission_probe(3)  # 30 ms: spool barely begun, zero thrust
    gyro = get("imu_gyro")
    accel = get("imu_accel")
    assert abs(np.linalg.norm(gyro) - OMEGA_EARTH_RADPS) < 5 * sn.IMU_GYRO_SIGMA
    assert np.linalg.norm(accel) < 5 * sn.IMU_ACCEL_SIGMA + 1e-6


def test_imu_reads_thrust_specific_force_in_ascent():
    """Engines burning: f_B ~ T/m along body +X (aero still small at
    t = 10 s; reference test_sensors.py:93)."""
    get = _mission_probe(1000)  # t = 10 s
    accel = get("imu_accel")
    thrust = float(get("thrust_total")[0])
    # total stack mass from the inertia component (SpatialInertia layout
    # [ixx iyy izz, px py pz, m])
    mass = float(get("inertia")[6])
    assert thrust > 5e6
    assert abs(accel[0] - thrust / mass) < 0.3
    assert abs(accel[1]) < 0.3 and abs(accel[2]) < 0.3


def test_gps_cadence_and_display_quantization():
    """25 Hz GPS sample-and-hold: ~25 samples in the first second, held
    position near truth; webcast display readouts quantized to their steps
    (reference test_sensors.py:117)."""
    sn = _load("sensors")
    S = _load("sim")

    get = _mission_probe(100)  # exactly 1 s
    count = float(get("gps_count")[0])
    assert abs(count - 25.0) <= 1.0, count
    gps_pos = get("gps_pos")
    truth_enu = np.asarray(S.to_enu(get("world_pos")[4:7]))
    assert np.linalg.norm(gps_pos - truth_enu) < 25.0
    dspeed = float(get("display_speed")[0])
    dalt = float(get("display_alt")[0])
    assert abs(dspeed / sn.DISPLAY_SPEED_STEP
               - round(dspeed / sn.DISPLAY_SPEED_STEP)) < 1e-9
    assert abs(dalt / sn.DISPLAY_ALT_STEP
               - round(dalt / sn.DISPLAY_ALT_STEP)) < 1e-9


def test_radar_sees_ground_nose_up_on_pad():
    """Radar boresight is -X (out the engines): nose-up it looks straight
    down, so on the pad it must report ~ the CG altitude, inside range and
    FOV (reference test_sensors.py:138 geometry gates)."""
    get = _mission_probe(100)
    rng = float(get("radar_range")[0])
    h_cg = float(np.asarray(_load("sim").to_enu(get("world_pos")[4:7]))[2])
    assert rng > 0.0, "radar gated out despite looking at the deck"
    assert abs(rng - h_cg) < 2.0, (rng, h_cg)
    assert float(get("radar_count")[0]) > 0.0


# ---- mission realism vs recorded CRS-12 webcast telemetry ------------------


def test_mission_matches_recorded_crs12_profile():
    """Nominal mission vs the vendored public-domain CRS-12 stage-1 webcast
    telemetry (reference.py cleans it; reference examples/falcon9
    reference.py + hooks score the same channels).  Gates: early-ascent
    speed/altitude tight, apogee/vmax/event-times at honest tolerances.
    Known gap, recorded deliberately: the real vehicle's deep max-Q
    throttle-down (t 51-90 s) is flown only shallowly here because the
    boostback/entry targeting is calibrated against this ascent shape —
    mid-ascent speed runs up to ~35% hot through that window."""
    ref = _load("reference")
    S = _load("sim")
    import numpy.linalg as _la

    world, system = S.build(None, sensors=False)
    ex = world.build(system, simulation_rate=S.SIM_RATE_HZ)
    ex.run(S.DEFAULT_MAX_TICKS)
    h = ex.history(["booster.world_pos", "booster.world_vel",
                    "booster.phase", "booster.meco_t"])
    pos = np.asarray(h["booster.world_pos"])
    vel = np.asarray(h["booster.world_vel"])
    ph = np.asarray(h["booster.phase"]).ravel()
    t = np.arange(len(ph)) / 100.0
    alt = (pos[:, 4:7] - np.asarray(S._PAD_ECEF)) @ S._U_HAT
    speed = _la.norm(vel[:, 3:6], axis=1)

    p = ref.load_profile()
    ev = ref.events()
    ref.sanity_check()

    # early ascent (pre-bucket) tracks the recording tightly
    for tt in (20, 30, 40, 50):
        i = int(tt * 100)
        rv = ref.value_at(p, tt, "speed_mps")
        ra = ref.value_at(p, tt, "altitude_m")
        assert abs(speed[i] - rv) < 0.10 * rv + 5.0, (tt, speed[i], rv)
        assert abs(alt[i] - ra) < 0.10 * ra + 100.0, (tt, alt[i], ra)

    # mission invariants
    meco_t = float(np.asarray(h["booster.meco_t"])[-1])
    assert abs(meco_t - ev["meco"]) < 20.0, meco_t
    assert abs(alt.max() - max(p["altitude_m"])) < 0.08 * max(p["altitude_m"])
    vmax_ref = max(p["speed_mps"])
    assert abs(speed.max() - vmax_ref) < 0.10 * vmax_ref, speed.max()
    td = np.where(ph >= 7)[0]
    assert len(td), "never touched down"
    assert abs(t[td[0]] - ev["landing_end"]) < 60.0, t[td[0]]


def test_reference_profiles_both_missions():
    """Both vendored mission recordings load and pass sanity (reference
    test_sensors.py:72 test_reference_profiles)."""
    ref = _load("reference")
    for mission in ("crs12", "crs11"):
        p = ref.load_profile(mission)
        ev = ref.events(mission)
        assert p["time_s"][-1] > 400.0
        assert max(p["speed_mps"]) > 1500.0
        assert max(p["altitude_m"]) > 100_000.0
        assert 100.0 < ev["meco"] < 200.0
