"""Example sims as integration tests: build headless, run ticks, check
physics invariants (the reference gates examples through scripts/ci/regress.sh
with telemetry-CSV baselines; these are the in-repo equivalents)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def load_module(example: str, module: str = "sim"):
    path = os.path.join(EXAMPLES, example, f"{module}.py")
    sys.path.insert(0, os.path.join(EXAMPLES, example))
    try:
        spec = importlib.util.spec_from_file_location(f"{example}_{module}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def test_ball_bounces_and_stays_above_ground():
    sim = load_module("ball")
    w = sim.world(seed=3)
    exec_ = w.build(sim.system(), simulation_rate=1.0 / sim.SIM_TIME_STEP)
    exec_.run(600)  # 5 seconds
    df = exec_.history("ball.world_pos")
    z = np.stack([np.asarray(v)[6] for v in df["ball.world_pos"]])
    assert z[0] == 6.0
    assert z.min() > -0.5  # bounce keeps it near/above ground
    assert (z[1:] < 6.0).all()  # it fell
    # it bounced at least once: after hitting bottom it rises
    i_min = z.argmin()
    assert z[i_min:].max() > z[i_min] + 0.3


def test_three_body_periodicity():
    sys.path.insert(0, os.path.join(EXAMPLES, "three-body"))
    try:
        import elodin as el
        from jax import numpy as jnp
        from jax.numpy import linalg as la

        # rebuild the world inline (main.py ends in w.run which parses argv)
        spec = importlib.util.spec_from_file_location(
            "three_body_main", os.path.join(EXAMPLES, "three-body", "main.py")
        )
        # instead run via the bench CLI in a subprocess elsewhere; here just
        # verify that momentum is conserved for a 2-body fold
        G = 6.6743e-11
        w = el.World()
        a = w.spawn(
            el.Body(
                world_pos=el.WorldPos(linear=jnp.array([1.0, 0.0, 0.0])),
                world_vel=el.WorldVel(linear=jnp.array([0.0, 0.5, 0.0])),
                inertia=el.Inertia(1.0 / G),
            ),
            name="A",
        )
        b = w.spawn(
            el.Body(
                world_pos=el.WorldPos(linear=jnp.array([-1.0, 0.0, 0.0])),
                world_vel=el.WorldVel(linear=jnp.array([0.0, -0.5, 0.0])),
                inertia=el.Inertia(1.0 / G),
            ),
            name="B",
        )
        GravityEdge = el.Annotated[el.Edge, el.Component("gravity_edge", el.ComponentType.Edge)]

        @el.dataclass
        class GravityConstraint(el.Archetype):
            a: GravityEdge

            def __init__(self, a, b):
                self.a = GravityEdge(a, b)

        @el.system
        def gravity(
            graph: el.GraphQuery[GravityEdge],
            query: el.Query[el.WorldPos, el.Inertia],
        ) -> el.Query[el.Force]:
            def gravity_fn(force, a_pos, a_inertia, b_pos, b_inertia):
                r = a_pos.linear() - b_pos.linear()
                norm = la.norm(r)
                f = G * a_inertia.mass() * b_inertia.mass() * r / (norm**3)
                return el.Force(linear=force.force() - f)

            return graph.edge_fold(query, query, el.Force, el.Force(), gravity_fn)

        w.spawn(GravityConstraint(a, b), name="A -> B")
        w.spawn(GravityConstraint(b, a), name="B -> A")
        exec_ = w.build(el.six_dof(sys=gravity), simulation_rate=120.0)
        exec_.run(240)
        df = exec_.history(["a.world_vel", "b.world_vel"])
        va = df["a.world_vel"][-1].to_numpy()[3:]
        vb = df["b.world_vel"][-1].to_numpy()[3:]
        # equal masses, symmetric ICs: total momentum stays zero
        np.testing.assert_allclose(va + vb, 0.0, atol=1e-9)
        assert abs(va[1]) < 0.5  # pulled inward from initial tangential speed
    finally:
        sys.path.pop(0)


def test_nbody_total_edge_orbits():
    mod = load_module("n-body", "main")
    w = mod.build_world(n_asteroids=4, seed=1)
    exec_ = w.build(mod.build_system(), simulation_rate=1.0 / mod.SIM_TIME_STEP)
    exec_.run(500)
    df = exec_.history("earth.world_pos")
    r0 = df["earth.world_pos"][0].to_numpy()[4:]
    r1 = df["earth.world_pos"][-1].to_numpy()[4:]
    # earth moved along its orbit but kept its radius (circular orbit)
    assert np.linalg.norm(r1 - r0) > 1e8
    np.testing.assert_allclose(
        np.linalg.norm(r1), np.linalg.norm(r0), rtol=1e-4
    )


def test_cube_sat_detumbles_and_estimates():
    mod = load_module("cube-sat", "main")
    w = mod.build_world()
    exec_ = w.build(mod.build_system(), simulation_rate=1.0 / mod.SIM_TIME_STEP)
    exec_.run(1200)  # 10 seconds
    df = exec_.history(["ore_sat.world_pos", "ore_sat.att_est", "ore_sat.radius"])
    # orbit radius maintained
    r = float(df["ore_sat.radius"][-1])
    np.testing.assert_allclose(r, mod.radius, rtol=1e-3)
    # attitude estimate converged toward true attitude
    q_est = df["ore_sat.att_est"][-1].to_numpy()
    q_true = df["ore_sat.world_pos"][-1].to_numpy()[:4]
    dot = abs(float(np.dot(q_est, q_true)))
    assert dot > 0.95, f"MEKF estimate diverged: |<q_est,q_true>| = {dot}"


def test_rocket_ascends_under_thrust():
    mod = load_module("rocket", "main")
    w = mod.build_world()
    exec_ = w.build(mod.build_system(), simulation_rate=1.0 / mod.SIM_TIME_STEP)
    exec_.run(600)  # 5 s of boost
    df = exec_.history(["rocket.world_pos", "rocket.mach", "rocket.thrust"])
    z = df["rocket.world_pos"][-1].to_numpy()[6]
    assert z > 50.0, f"rocket failed to climb: z={z}"
    assert float(df["rocket.mach"][-1]) > 0.1
    assert float(df["rocket.thrust"][1]) > 100.0  # boost phase thrust
    # fin deflection stayed in limits
    df2 = exec_.history("rocket.fin_deflect")
    fins = np.array([float(v) for v in df2["rocket.fin_deflect"]])
    assert (np.abs(fins) <= 40.0).all()


def test_rocket_external_fin_trim():
    mod = load_module("rocket", "main")
    w = mod.build_world()
    exec_ = w.build(mod.build_system(), simulation_rate=1.0 / mod.SIM_TIME_STEP)
    exec_.run(10)
    exec_.write_component("rocket.fin_control_trim", 5.0)
    exec_.run(10)
    trim = exec_.read_component("rocket.fin_control_trim")
    np.testing.assert_allclose(np.asarray(trim), 5.0)


def test_drone_stabilizes_and_holds_altitude():
    mod = load_module("drone", "main")
    w = mod.build_world(tilt_deg=20.0)
    exec_ = w.build(mod.build_system(), simulation_rate=mod.SIMULATION_RATE)
    exec_.run(int(8 * mod.SIMULATION_RATE))  # 8 seconds
    df = exec_.history("drone.world_pos")
    final = df["drone.world_pos"][-1].to_numpy()
    q, z = final[:4], final[6]
    # level attitude recovered from the 20-degree tilt
    tilt = 2 * np.degrees(np.arccos(np.clip(abs(q[3]), 0, 1)))
    assert tilt < 3.0, f"drone still tilted {tilt:.1f} deg"
    # altitude held near the 2 m setpoint
    assert abs(z - 2.0) < 0.3, f"altitude {z:.2f}"


def test_mc_batched_campaign_cpu():
    mod = load_module("monte-carlo", "batched")
    out = mod.run_campaign(128, 2400, seed=7)
    assert out["landed_frac"] > 0.9
    assert out["soft_landing_frac"] > 0.8
    assert -6.0 < out["mean_touchdown_vz"] < 0.0


def test_mc_process_campaign(tmp_path):
    """Process-per-sample fallback runner end-to-end."""
    from elodin_tpu.monte_carlo import run_campaign

    sim = os.path.join(EXAMPLES, "monte-carlo", "main.py")
    if not os.path.exists(sim):
        pytest.skip("no process-mode main.py")
    config = {
        "monte_carlo": {
            "n_samples": 2,
            "seed": 1,
            "variables": {
                "start_altitude": {"dist": "uniform", "min": 1800, "max": 2200},
            },
        }
    }
    records = run_campaign(sim, config, tmp_path / "out", workers=2,
                           max_ticks=50, timeout=300)
    assert len(records) == 2
    assert all(r["valid"] for r in records), records
    assert (tmp_path / "out" / "results.csv").exists()
    assert (tmp_path / "out" / "summary.json").exists()


def test_linalg_ops_coverage():
    mod = load_module("linalg", "main")
    w = mod.build_world()
    exec_ = w.build(mod.build_system(), simulation_rate=120.0)
    exec_.run(10)
    df = exec_.history(["linalg.mat_a", "linalg.chol_out", "linalg.svd_s",
                        "linalg.solve_out", "linalg.det", "linalg.eig_vals"])
    a = df["linalg.mat_a"][-1].to_numpy().reshape(4, 4)
    chol = df["linalg.chol_out"][-1].to_numpy().reshape(4, 4)
    np.testing.assert_allclose(chol @ chol.T, a, rtol=1e-8)
    x = df["linalg.solve_out"][-1].to_numpy()
    np.testing.assert_allclose(a @ x, np.arange(4.0) + 1.0, rtol=1e-8)
    s = df["linalg.svd_s"][-1].to_numpy()
    w_eig = np.sort(df["linalg.eig_vals"][-1].to_numpy())
    # SPD: singular values == eigenvalues
    np.testing.assert_allclose(np.sort(s), w_eig, rtol=1e-8)
    det = float(df["linalg.det"][-1])
    np.testing.assert_allclose(det, np.prod(w_eig), rtol=1e-8)


def test_frames_regression():
    """Frame-correctness: gravity sign per local frame, two-body energy
    conservation (reference examples/frames)."""
    mod = load_module("frames", "main")
    z_enu = mod.run_drop("ENU")
    z_ned = mod.run_drop("NED")
    assert z_enu[-1] < z_enu[0] and z_ned[-1] > z_ned[0]
    np.testing.assert_allclose(z_enu, -z_ned, atol=1e-12)
    w, s = mod.build_two_body()
    exec_ = w.build(s, simulation_rate=mod.SIM_RATE)
    exec_.run(600)
    df = exec_.history(["a.world_pos", "b.world_pos", "a.world_vel", "b.world_vel"])
    e = mod.total_energy(df)
    assert abs(e[-1] - e[0]) / abs(e[0]) < 1e-6


def test_db_client_example():
    """Full cross-process pipeline: sim serving over TCP, client reads live
    telemetry + SQL + writes back (reference examples/db-client)."""
    import subprocess

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        ELODIN_MAX_TICKS="400",
        ELODIN_SIM_ADDR="127.0.0.1:2271",
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(EXAMPLES)] + env.get("PYTHONPATH", "").split(os.pathsep)
        ),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "db-client", "main.py")],
        env=env,
        cwd=os.path.join(EXAMPLES, "db-client"),
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "sql rows: 5" in proc.stdout
    assert "ground.station_temp" in proc.stdout


def test_betaflight_sitl_lockstep():
    """External-process UDP lockstep at kHz rates (feature catalog §19)."""
    mod = load_module("betaflight-sitl", "main")
    rate = mod.run(ticks=1500)
    # ~1.4 kHz idle on this box; the threshold only guards against a
    # stuck/deadlocked bridge, with margin for load from parallel runs
    assert rate > 100, f"lockstep too slow: {rate:.0f} Hz"


def test_betaflight_sitl_batched_deep_hold():
    """Deep-hold batched lockstep (hold=256 on the 1 kHz plant, controller
    decimated to 3.9 Hz): the PD hover loop must still close — the
    stability floor behind bench.py's hold-depth sweep legs
    (`lockstep_hz_tpu_batched_h256`), where plant rate scales with hold
    depth only while the loop stays convergent at the decimated rate."""
    mod = load_module("betaflight-sitl", "main")
    rate = mod.run_batched(trips=10, hold=256)  # asserts |z - 2| < 0.5
    assert rate > 0


def test_apollo_lander_soft_landing():
    """In-graph ZEM/ZEV guided lunar descent: soft pinpoint touchdown."""
    mod = load_module("apollo-lander", "main")
    w = mod.build_world()
    exec_ = w.build(mod.build_system(), simulation_rate=mod.SIM_RATE)
    exec_.run(int(180 * mod.SIM_RATE))
    df = exec_.history(["eagle.world_pos", "eagle.landed_vz", "eagle.fuel"])
    td = float(df["eagle.landed_vz"][-1])
    pos = df["eagle.world_pos"][-1].to_numpy()
    assert -3.0 < td < 0.0, f"touchdown vz {td}"
    assert np.linalg.norm(pos[4:6]) < 10.0
    assert float(df["eagle.fuel"][-1]) > 1000.0


def test_apollo_lander_dispersed_campaign():
    mod = load_module("apollo-lander", "main")
    out = mod.run_dispersed(128, seed=5)
    assert out["landed_frac"] > 0.95
    assert out["soft_frac"] > 0.7
    assert out["min_fuel_kg"] > 1000.0


def test_rotating_cube_quarter_turn():
    import math

    sim = load_module("rotating-cube")
    ex = sim.world().build(sim.system(), simulation_rate=1.0 / sim.SIM_TIME_STEP)
    ex.run(120, show_progress=False)  # 1 s at pi/2 rad/s => quarter turn
    q = np.asarray(ex.read_component("cube.world_pos"))
    assert abs(abs(q[0]) - math.sin(math.pi / 4)) < 1e-4
    assert abs(q[3] - math.cos(math.pi / 4)) < 1e-4
    assert np.allclose(q[4:], [0.0, 0.0, 1.0])


def test_geo_frames_markers_and_enu():
    sim = load_module("geo-frames")
    ex = sim.world().build(sim.system(), simulation_rate=60.0)
    ex.run(30, show_progress=False)
    pole = np.asarray(ex.read_component("ecef_north_pole.world_pos"))
    assert abs(pole[6] - 6356752.314245) < 1.0
    # ENU up offset from origin reproduces geodetic altitude gain
    up = sim.ecef_from_enu(0.0, 0.0, 1000.0)
    origin = sim.ecef_from_enu(0.0, 0.0, 0.0)
    assert abs(np.linalg.norm(np.asarray(up) - np.asarray(origin)) - 1000.0) < 1e-6


def test_ellipsoid_drone_path_in_graph():
    sim = load_module("ellipsoid")
    w, _body = sim.world()
    ex = w.build(sim.system(), simulation_rate=sim.SIM_RATE)
    ex.run(240, show_progress=False)
    drone = np.asarray(ex.read_component("drone.world_pos"))
    shell = np.asarray(ex.read_component("ellipsoid.world_pos"))
    assert np.all(np.isfinite(drone))
    assert abs(drone[4]) <= sim.DRONE_PATH_RADIUS[0] + 1e-9
    assert np.allclose(shell[4:], 0.0)  # only the drone is path-driven
    # sensor camera config registered for the editor/DB
    assert any("scene_cam" in k for k in w.assets)


def test_stablehlo_op_coverage():
    sim = load_module("stablehlo")
    ex = sim.world().build(sim.system(), simulation_rate=sim.SIMULATION_RATE)
    ex.run(100, show_progress=False)
    for comp in ["probe.hlo_vec", "probe.hlo_mat", "probe.hlo_bits",
                 "probe.hlo_scalar"]:
        v = np.asarray(ex.read_component(comp))
        assert np.all(np.isfinite(np.asarray(v, dtype=np.float64))), comp


def test_cube_sat_pysim_detumbles():
    mod = load_module("cube-sat-pysim", "main")
    omegas = mod.run()
    assert omegas[-1] < omegas[0] * 0.9


def test_logstream_producer_and_msg_persistence(tmp_path):
    """Producer -> server -> msg log -> reopen (the logstream example flow,
    plus the MsgLog reload path)."""
    import importlib.util as _ilu
    import json

    import elodin_tpu.db as edb
    from elodin_tpu.db.postcard import msg_id
    from elodin_tpu.db.storage import Database

    path = str(tmp_path / "db")
    srv = edb.Server.start(path)
    spec = _ilu.spec_from_file_location(
        "logstream_main", os.path.join(EXAMPLES, "logstream", "main.py")
    )
    mod = _ilu.module_from_spec(spec)
    sys.path.insert(0, os.path.join(EXAMPLES, "logstream"))
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    n = mod.log_producer(srv.addr, n=12)
    assert n == 12
    import time as _t

    _t.sleep(0.3)
    srv.stop()

    db = Database(path)
    log = db.msg_log(msg_id("fsw_log"))
    entries = [json.loads(d) for _, d in log.entries]
    assert len(entries) == 12
    assert entries[0]["message"].startswith("boot:")
    assert entries[-1]["level"] == 4


def test_falcon9_rtls_mission():
    """Full RTLS mission lands softly at LZ-1 (reference examples/falcon9
    CRS-12 profile: ascent, MECO, boostback, entry, descent, landing)."""
    sim = load_module("falcon9")
    w, sysm = sim.build()
    ex = w.build(sysm, simulation_rate=sim.SIM_RATE_HZ)
    ex.record_history = False
    ex.run(sim.DEFAULT_MAX_TICKS, show_progress=False)
    vz = float(np.asarray(ex.read_component("booster.touchdown_vz")).ravel()[0])
    miss = float(np.asarray(ex.read_component("booster.miss_distance")).ravel()[0])
    phase = float(np.asarray(ex.read_component("booster.phase")).ravel()[0])
    prop = float(np.asarray(ex.read_component("booster.prop_kg")).ravel()[0])
    assert phase == sim.DOWN
    # the declared touchdown envelope (constants.py), not a loose proxy
    assert -2.0 < vz < 0.0, vz
    assert 0.0 <= miss < 50.0, miss
    # the lateral-cleanup hold trades propellant for envelope compliance
    # (~20 s of terminal hold); ~4 t of reserve is a clean landing, fumes
    # would be <1 t
    assert prop > 2_000.0


def test_falcon9_dispersed_campaign():
    """32 dispersed missions as one vmapped program; all land softly."""
    saved_sim = sys.modules.pop("sim", None)  # another example's sim module
    sys.path.insert(0, os.path.join(EXAMPLES, "falcon9"))
    try:
        import importlib.util as _ilu

        spec = _ilu.spec_from_file_location(
            "falcon9_batched", os.path.join(EXAMPLES, "falcon9", "batched.py")
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = mod.run_campaign(32, seed=7)
    finally:
        sys.path.pop(0)
        sys.modules.pop("sim", None)
        if saved_sim is not None:
            sys.modules["sim"] = saved_sim
    assert out["landed_frac"] == 1.0
    # soft now means the FULL declared envelope (vz/vlat/tilt, batched.py)
    assert out["soft_landing_frac"] >= 0.9
    # The cleanup hold + budget-limited post-commit position recovery
    # land softly AND close most of the miss; the tail gate allows the
    # occasional hard-wind sample that lands ~100 m off (soft) instead
    # of on-pad at 8 m/s sideways.
    assert out["p95_miss_m"] < 150.0
    assert out["median_miss_m"] < 25.0


def test_covariance_ellipsoids_agree():
    """Cholesky and direct covariance channels describe the same ellipsoid
    (reference examples/covariance-ellipsoids)."""
    sim = load_module("covariance-ellipsoids", "main")
    ex = sim.world().build(sim.system(), simulation_rate=sim.SIM_RATE)
    ex.run(97, show_progress=False)
    packed_l = np.asarray(ex.read_component("cholesky.cholesky_factor"))
    packed_cov = np.asarray(ex.read_component("covariance.error_covariance"))
    L = np.zeros((3, 3))
    L[np.tril_indices(3)] = packed_l
    cov = np.zeros((3, 3))
    cov[np.tril_indices(3)] = packed_cov
    cov = cov + np.tril(cov, -1).T
    np.testing.assert_allclose(L @ L.T, cov, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(cov) > 0)


def test_voyager_jupiter_assist():
    """Hohmann-phased probe escapes the solar system after the Jupiter flyby
    (reference examples/voyager SPICE replay; here circular ephemerides)."""
    sim = load_module("voyager", "main")
    w, sysm = sim.build()
    ex = w.build(sysm, simulation_rate=sim.SIMULATION_RATE_HZ)
    ex.record_history = False

    def probe_energy():
        pos = np.asarray(ex.read_component("voyager.world_pos")).ravel()[4:]
        vel = np.asarray(ex.read_component("voyager.world_vel")).ravel()[3:]
        return sim.specific_energy(pos, vel)

    year_ticks = int(sim.YEAR_S / sim.SIM_TIME_STEP)
    ex.run(year_ticks, show_progress=False)  # pre-encounter: bound transfer
    e_before = probe_energy()
    assert -160e6 < e_before < -100e6, e_before
    ex.run(3 * year_ticks, show_progress=False)  # through the flyby
    e_after = probe_energy()
    assert e_after > 50e6, e_after  # hyperbolic: solar escape
    # planets stayed on their circles
    jup = np.asarray(ex.read_component("jupiter.world_pos")).ravel()[4:]
    assert abs(np.linalg.norm(jup) / sim.AU - 5.203) < 1e-6


def test_sensor_camera_room():
    """Balls stay inside the room; both camera configs registered
    (reference examples/sensor-camera)."""
    sim = load_module("sensor-camera", "main")
    w = sim.world()
    ex = w.build(sim.system(), simulation_rate=1.0 / sim.SIM_TIME_STEP)
    ex.run(600, show_progress=False)
    for i in range(8):
        p = np.asarray(ex.read_component(f"ball_{i}.world_pos"))[4:]
        assert np.all(np.abs(p[:2]) <= sim.BOUNDARY + 1e-6), (i, p)
        assert sim.BALL_RADIUS - 1e-6 <= p[2] <= 2 * sim.BOUNDARY + 1e-6, (i, p)
    cams = [k for k in w.assets if "cam" in k]
    assert len(cams) == 2


def test_barrowman_prediction():
    """Barrowman equations: published invariants (reference
    examples/rocket-barrowman openrocket_aero.py)."""
    sys.path.insert(0, os.path.join(EXAMPLES, "rocket-barrowman"))
    try:
        from barrowman import FinSet, NoseCone, Transition, calisto, solve, static_margin
    finally:
        sys.path.pop(0)

    # every slender nose: CNa = 2; conical CP at 2/3 L, ogive at 0.466 L
    assert NoseCone(0.6, "conical").cna() == 2.0
    assert abs(NoseCone(0.6, "conical").xcp() - 0.4) < 1e-12
    assert abs(NoseCone(0.5, "ogive").xcp() - 0.233) < 1e-12
    # boattail gives negative CNa (destabilizing-forward shift is handled
    # by the weighted sum), flare gives positive
    d = 0.1
    assert Transition(1.0, 0.1, d, 0.06, d).cna() < 0
    assert Transition(1.0, 0.1, d, 0.14, d).cna() > 0
    # more fin area -> more CNa; interference factor > bare fins
    base = dict(position=1.2, n=4, root_chord=0.12, tip_chord=0.06,
                span=0.11, sweep=0.06, body_radius=0.05, d_ref=0.1)
    small = FinSet(**base)
    big = FinSet(**{**base, "span": 0.16})
    assert big.cna() > small.cna() > 0

    comps, d_ref, xcg = calisto()
    aero = solve(comps)
    # fins dominate: composite CP well aft of the nose-only CP, margin
    # positive and in the typical 1-4 caliber band for this geometry
    assert aero.xcp > 1.0
    margin = static_margin(aero, xcg, d_ref)
    assert 1.0 < margin < 4.0, margin


def test_rocket_barrowman_stable_flight():
    """Statically-stable rocket weathercocks into the wind and flies a
    ballistic arc without tumbling."""
    sim = load_module("rocket-barrowman", "main")
    ex = sim.world().build(sim.system(), simulation_rate=1.0 / sim.SIM_TIME_STEP)
    ex.record_history = False
    ex.run(1200, show_progress=False)  # 10 s: burnout + coast
    pos = np.asarray(ex.read_component("calisto.world_pos")).ravel()
    vel = np.asarray(ex.read_component("calisto.world_vel")).ravel()
    assert pos[6] > 300.0, pos  # well off the pad
    # attitude still tracks the velocity vector (no tumble): angle between
    # nose and velocity under 25 degrees during coast
    from elodin_tpu.spatial import quat_rotate

    nose = np.asarray(quat_rotate(pos[:4], np.array([0.0, 0.0, 1.0])))
    v = vel[3:] / np.linalg.norm(vel[3:])
    angle = np.degrees(np.arccos(np.clip(nose @ v, -1, 1)))
    assert angle < 25.0, angle


def test_crazyflie_edu_lab_flight():
    """Crazyflie 2.1 flies the scripted lab: takeoff, square, land
    (reference examples/crazyflie-edu firmware cascade labs)."""
    sim = load_module("crazyflie-edu")
    ex = sim.world().build(sim.system(), simulation_rate=sim.SIM_RATE_HZ)
    ex.record_history = False

    def pos():
        return np.asarray(ex.read_component("crazyflie.world_pos")).ravel()[4:]

    ex.run(1000, show_progress=False)  # t=2s: hovering at the first waypoint
    p = pos()
    assert abs(p[2] - 0.6) < 0.05, p
    ex.run(3000, show_progress=False)  # t=8s: corner (0.6, 0.6)
    p = pos()
    assert abs(p[0] - 0.6) < 0.05 and abs(p[1] - 0.6) < 0.05, p
    ex.run(4500, show_progress=False)  # t=17s: landed near origin
    p = pos()
    assert p[2] < 0.08 and np.linalg.norm(p[:2]) < 0.1, p


def test_video_stream_frames_roundtrip(tmp_path):
    """Opaque frame messages flow producer -> db -> consumer with the frame
    header intact (reference examples/video-stream data plane)."""
    import elodin_tpu.db as edb

    sim = load_module("video-stream", "main")
    srv = edb.Server.start(str(tmp_path / "db"))
    try:
        n = sim.stream_frames(srv.addr, n_frames=12)
        assert n == 12
        import time as _t

        _t.sleep(0.3)
        client = edb.Client.connect(srv.addr)
        msgs = client.get_msgs(sim.STREAM_NAME)
        client.close()
    finally:
        srv.stop()
    assert len(msgs) == 12
    payload = msgs[5][1]
    if isinstance(payload, str):
        payload = payload.encode("latin1")
    assert bytes(payload[:3]) == b"FRM"
    assert int.from_bytes(bytes(payload[3:7]), "little") == 5
    # ball sim runs alongside
    ex = sim.world().build(sim.system(), simulation_rate=1.0 / sim.SIM_TIME_STEP)
    ex.run(240, show_progress=False)
    p = np.asarray(ex.read_component("ball.world_pos")).ravel()[4:]
    assert np.all(np.abs(p[:2]) < sim.BOUNDARY + 0.5)


def test_rc_jet_autopilot_mission():
    """BDX-class jet holds cruise, climbs on schedule, and flies a
    coordinated 90-degree heading change (reference examples/rc-jet)."""
    sim = load_module("rc-jet")
    ex = sim.world().build(sim.system(), simulation_rate=sim.SIM_RATE_HZ)
    ex.record_history = False

    def state():
        pos = np.asarray(ex.read_component("bdx.world_pos")).ravel()
        vel = np.asarray(ex.read_component("bdx.world_vel")).ravel()
        ab = np.degrees(np.asarray(ex.read_component("bdx.alpha_beta")).ravel())
        hdg = np.degrees(np.arctan2(vel[4], vel[3]))
        return pos[6], np.linalg.norm(vel[3:]), hdg, ab

    ex.run(int(10 * sim.SIM_RATE_HZ), show_progress=False)  # t=10s: cruise
    alt, spd, hdg, _ = state()
    assert abs(alt - 120.0) < 10.0 and abs(hdg - 90.0) < 2.0, (alt, hdg)
    ex.run(int(18 * sim.SIM_RATE_HZ), show_progress=False)  # t=28s: climbed
    alt, spd, hdg, _ = state()
    assert abs(alt - 160.0) < 8.0, alt
    ex.run(int(20 * sim.SIM_RATE_HZ), show_progress=False)  # t=48s: turned
    alt, spd, hdg, ab = state()
    assert abs(hdg - 180.0) < 5.0, hdg
    assert abs(alt - 160.0) < 10.0, alt
    assert 30.0 < spd < 42.0, spd
    assert abs(ab[1]) < 2.0, ab  # coordinated: low sideslip


def test_mc_campaign_quality_retention_artifacts(tmp_path):
    """Quality gates (degraded != invalid), retention, perf.csv,
    resources.csv, and the out-dir pid lock
    (libs/monte-carlo/src/lib.rs:103-117,1165-1178,1369-1373)."""
    import json

    from elodin_tpu.monte_carlo import run_campaign
    from elodin_tpu.monte_carlo.campaign import CampaignLock

    sim = os.path.join(EXAMPLES, "monte-carlo", "main.py")
    if not os.path.exists(sim):
        pytest.skip("no process-mode main.py")
    config = {
        "monte_carlo": {
            "n_samples": 2,
            "seed": 1,
            "variables": {
                "start_altitude": {"dist": "uniform", "min": 1800, "max": 2200},
            },
            # impossible pacing bound -> every real-time run is degraded
            "quality": {"max_behind_deadline_frac": -1.0},
            "retention": {
                "keep_run_db": "always",
                "prune_on_fail": ["context.json"],
            },
        }
    }
    out = tmp_path / "out"
    records = run_campaign(sim, config, out, workers=2, max_ticks=50,
                           timeout=300)
    assert all(r["valid"] for r in records)
    assert all(r["degraded"] for r in records)  # forced-slow marked degraded
    summary = json.loads((out / "summary.json").read_text())
    assert summary["degraded"] == 2 and summary["invalid"] == 0
    assert summary["passed"] == 0
    assert (out / "perf.csv").exists()
    assert (out / "resources.csv").exists()
    # retention: degraded runs count as failed -> prune_on_fail applied
    for r in records:
        run_dir = out / "runs" / r["run_id"]
        assert not (run_dir / "context.json").exists()

    # out-dir pid lock: a second campaign on the same dir fails fast
    lock = CampaignLock(out)
    with pytest.raises(RuntimeError, match="locked by pid"):
        run_campaign(sim, config, out, workers=1, max_ticks=10)
    lock.release()


def test_nbody_batched_scale_runner():
    """examples/n-body/batched.py at modest scale on CPU: finite state
    and conserved total momentum (pair-force symmetry)."""
    mod = load_module("n-body", "batched")
    out = mod.run(256, 50, dtype=np.float64)
    assert out["momentum_drift_rel"] < 1e-10, out
    assert out["entity_steps_per_sec"] > 0


def test_mc_process_campaign_resume_preserves_results(tmp_path):
    """Regression: re-running a finished campaign with resume=True used to
    rewrite results.csv/summary.json from only the newly-executed runs
    (zero), discarding the whole campaign's records."""
    import csv as _csv
    import json

    from elodin_tpu.monte_carlo import run_campaign

    sim = os.path.join(EXAMPLES, "monte-carlo", "main.py")
    if not os.path.exists(sim):
        pytest.skip("no process-mode main.py")
    config = {
        "monte_carlo": {
            "n_samples": 2,
            "seed": 1,
            "variables": {
                "start_altitude": {"dist": "uniform", "min": 1800, "max": 2200},
            },
        }
    }
    out = tmp_path / "out"
    first = run_campaign(sim, config, out, workers=2, max_ticks=20,
                         timeout=300)
    assert len(first) == 2
    # everything already complete: the resumed run executes nothing new but
    # must still report the full campaign
    again = run_campaign(sim, config, out, workers=2, max_ticks=20,
                         timeout=300, resume=True)
    assert len(again) == 2
    with open(out / "results.csv") as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 2
    summary = json.loads((out / "summary.json").read_text())
    assert summary["total"] == 2 and summary["valid"] == 2
