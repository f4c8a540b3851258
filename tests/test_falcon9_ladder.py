"""Falcon9 phase-1 physics verification ladder, ported behaviorally from
the reference's examples/falcon9/test_ladder.py + test_frames.py
(WHITEPAPER 14.3): independent checks the rotating-ECEF plant must pass
before any calibration is meaningful — apparent-gravity wiring, the
classic Coriolis drop, quaternion kinematics, a ballistic arc against an
independent inertial-frame numpy oracle, and a one-period orbit hold,
under BOTH integrators (the symplectic-vs-RK4 gap quantified, not
asserted)."""

import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import elodin_tpu as el
from elodin_tpu import frames

# load falcon9's constants under a prefixed module key (same convention as
# test_falcon9._load) so the bare name 'constants' is never registered in
# sys.modules for other suites to trip over
import importlib.util as _ilu

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
_spec = _ilu.spec_from_file_location(
    "f9_constants", os.path.join(EXAMPLES, "falcon9", "constants.py")
)
_constants = _ilu.module_from_spec(_spec)
sys.modules.setdefault("f9_constants", _constants)
_spec.loader.exec_module(_constants)
MU_EARTH_M3S2 = _constants.MU_EARTH_M3S2
OMEGA_EARTH_RADPS = _constants.OMEGA_EARTH_RADPS
PAD_LAT_DEG = _constants.PAD_LAT_DEG
PAD_LON_DEG = _constants.PAD_LON_DEG
WGS84_A_M = _constants.WGS84_A_M

LAT = math.radians(PAD_LAT_DEG)
LON = math.radians(PAD_LON_DEG)
_NED = np.asarray(frames.ecef_to_ned(LAT, LON), dtype=np.float64)
UP = -_NED[2]
PAD_ECEF = np.asarray(
    frames.geodetic_to_ecef(LAT, LON, 3.0), dtype=np.float64
)

INTEGRATORS = [
    ("semi_implicit", el.Integrator.SemiImplicit),
    ("rk4", el.Integrator.Rk4),
]


def apparent_gravity(r):
    """Point-mass gravitation + centrifugal at ECEF position r."""
    r = np.asarray(r, dtype=np.float64)
    g = -MU_EARTH_M3S2 * r / np.linalg.norm(r) ** 3
    w = np.array([0.0, 0.0, OMEGA_EARTH_RADPS])
    return g - np.cross(w, np.cross(w, r))


def build_passive(r0, v0, init_angular_vel=None, integrator=el.Integrator.Rk4):
    """Coast-only rotating-ECEF world: gravity + frame pseudo-forces, no
    thrust/aero (the reference's build_passive, sim.py:1343)."""

    @el.map
    def coast_forces(
        pos: el.WorldPos, vel: el.WorldVel, inertia: el.Inertia, f: el.Force
    ) -> el.Force:
        r = pos.linear()
        v = vel.linear()
        m = inertia.mass()
        g = -MU_EARTH_M3S2 * r / jnp.linalg.norm(r) ** 3
        w_e = jnp.asarray([0.0, 0.0, OMEGA_EARTH_RADPS])
        frame_acc = -jnp.cross(w_e, jnp.cross(w_e, r)) - 2.0 * jnp.cross(
            w_e, v
        )
        return f + el.SpatialForce(linear=m * (g + frame_acc))

    w = el.World()
    w.spawn(
        el.Body(
            world_pos=el.SpatialTransform(linear=jnp.asarray(r0)),
            world_vel=el.SpatialMotion(
                linear=jnp.asarray(v0),
                angular=(
                    jnp.asarray(init_angular_vel)
                    if init_angular_vel is not None
                    else jnp.zeros(3)
                ),
            ),
            inertia=el.Inertia(1.0),
        ),
        name="probe",
    )
    return w, el.six_dof(sys=coast_forces, integrator=integrator)


def _run(world, system, rate_hz: float, steps: int):
    ex = world.build(system, simulation_rate=rate_hz)
    ex.record_history = False
    ex.run(steps, show_progress=False)
    pos = np.asarray(ex.read_component("probe.world_pos"), np.float64).ravel()
    vel = np.asarray(ex.read_component("probe.world_vel"), np.float64).ravel()
    return pos[:4], pos[4:], vel[:3], vel[3:]


def test_freefall_matches_apparent_gravity():
    """One step from rest: acceleration = gravitation + centrifugal,
    pointing within ~0.2 deg of the geodetic down (plumb line)."""
    world, system = build_passive(PAD_ECEF, np.zeros(3))
    _, _, _, v1 = _run(world, system, 1000.0, 1)
    accel = v1 * 1000.0
    np.testing.assert_allclose(accel, apparent_gravity(PAD_ECEF), rtol=1e-6)
    cos_angle = -accel @ UP / np.linalg.norm(accel)
    assert math.degrees(math.acos(min(1.0, cos_angle))) < 0.2


@pytest.mark.parametrize("name,integrator", INTEGRATORS)
def test_coriolis_drop(name, integrator):
    """100 m drop deflects east by (1/3) w g t^3 cos(lat) ~ 1.9 cm."""
    r0 = PAD_ECEF + UP * 100.0
    world, system = build_passive(r0, np.zeros(3), integrator=integrator)
    g = float(np.linalg.norm(apparent_gravity(r0)))
    t_fall = math.sqrt(2.0 * 100.0 / g)
    steps = int(round(t_fall * 1000.0))
    _, r1, _, _ = _run(world, system, 1000.0, steps)
    delta_ned = _NED @ (r1 - r0)
    east = delta_ned[1]
    expected = OMEGA_EARTH_RADPS * g * t_fall**3 * math.cos(LAT) / 3.0
    assert abs(east - expected) < 0.03 * expected + 2e-4
    assert abs(delta_ned[2] - 100.0) < 0.15  # fell ~100 m (down is +)


@pytest.mark.parametrize("name,integrator", INTEGRATORS)
def test_quaternion_single_axis(name, integrator):
    """1 deg/s about +Z for 90 s = 90 deg yaw, correct sign, unit norm."""
    omega = math.radians(1.0)
    world, system = build_passive(
        PAD_ECEF + np.array([0.0, 0.0, 1e7]),
        np.zeros(3),
        init_angular_vel=np.array([0.0, 0.0, omega]),
        integrator=integrator,
    )
    q, _, w, _ = _run(world, system, 100.0, 9000)
    np.testing.assert_allclose(w, [0.0, 0.0, omega], atol=1e-12)
    assert abs(np.linalg.norm(q) - 1.0) < 1e-6
    half = math.radians(90.0) / 2.0
    expected = np.array([0.0, 0.0, math.sin(half), math.cos(half)])
    if q @ expected < 0.0:
        q = -q
    np.testing.assert_allclose(q, expected, atol=2e-3)


def _rotate_z(angle: float, v: np.ndarray) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], v[2]])


def _inertial_oracle(r_e0, v_e0, t_end: float, dt: float) -> np.ndarray:
    """Two-body coast propagated in the INERTIAL frame with numpy RK4,
    mapped back to ECEF — an independent formulation of the same physics."""
    omega = np.array([0.0, 0.0, OMEGA_EARTH_RADPS])
    r, v = r_e0.copy(), v_e0 + np.cross(omega, r_e0)

    def acc(rr):
        return -MU_EARTH_M3S2 * rr / np.linalg.norm(rr) ** 3

    for _ in range(int(round(t_end / dt))):
        k1v, k1r = acc(r), v
        k2v, k2r = acc(r + 0.5 * dt * k1r), v + 0.5 * dt * k1v
        k3v, k3r = acc(r + 0.5 * dt * k2r), v + 0.5 * dt * k2v
        k4v, k4r = acc(r + dt * k3r), v + dt * k3v
        r = r + dt / 6.0 * (k1r + 2 * k2r + 2 * k3r + k4r)
        v = v + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
    return _rotate_z(-OMEGA_EARTH_RADPS * t_end, r)


# (integrator, rate Hz, coast s, tolerance m) — the 100 Hz rows stress a
# coarse dt to expose the first-order vs fourth-order gap on the record.
BALLISTIC_CASES = [
    ("semi_implicit", 1000.0, 20.0, 1.0),
    ("semi_implicit", 100.0, 200.0, 25.0),
    ("rk4", 100.0, 200.0, 0.5),
]


@pytest.mark.parametrize("name,rate_hz,coast_s,tol_m", BALLISTIC_CASES)
def test_ballistic_arc_vs_inertial_oracle(name, rate_hz, coast_s, tol_m):
    """MECO-class coast vs the independent inertial-frame oracle."""
    integrator = dict(INTEGRATORS)[name]
    r0 = PAD_ECEF + UP * 61_000.0
    north, east = _NED[0], _NED[1]
    v_dir = north * 0.5 + east * 0.5
    v0 = 1656.0 * (
        v_dir / np.linalg.norm(v_dir) * math.cos(math.radians(45.0))
        + UP * math.sin(math.radians(45.0))
    )
    world, system = build_passive(r0, v0, integrator=integrator)
    _, r_sim, _, _ = _run(world, system, rate_hz, int(round(coast_s * rate_hz)))
    err = np.linalg.norm(r_sim - _inertial_oracle(r0, v0, coast_s, 0.01))
    assert err < tol_m, f"{name} @{rate_hz} Hz: {err:.3f} m"


# Semi-implicit Euler is symplectic: bounded phase-space distortion of
# order dt*v_orbit at the deliberately coarse dt = 1 s, no secular growth.
ORBIT_RADIUS_TOL_M = {"semi_implicit": 16_000.0, "rk4": 5.0}
ORBIT_ENERGY_TOL = {"semi_implicit": 2e-3, "rk4": 1e-7}


@pytest.mark.parametrize("name,integrator", INTEGRATORS)
def test_orbit_radius_hold(name, integrator):
    """Circular 200 km orbit, one period at 1 Hz: bounded radius error,
    conserved inertial specific energy."""
    r_mag = WGS84_A_M + 200_000.0
    r0 = np.array([r_mag, 0.0, 0.0])
    v_circ = math.sqrt(MU_EARTH_M3S2 / r_mag)
    v0 = np.array([0.0, v_circ - OMEGA_EARTH_RADPS * r_mag, 0.0])
    period = 2.0 * math.pi * math.sqrt(r_mag**3 / MU_EARTH_M3S2)
    world, system = build_passive(r0, v0, integrator=integrator)
    _, r1, _, v1 = _run(world, system, 1.0, int(round(period)))
    radius_err = abs(np.linalg.norm(r1) - r_mag)
    omega = np.array([0.0, 0.0, OMEGA_EARTH_RADPS])
    e0 = 0.5 * np.linalg.norm(v0 + np.cross(omega, r0)) ** 2 - MU_EARTH_M3S2 / r_mag
    e1 = (
        0.5 * np.linalg.norm(v1 + np.cross(omega, r1)) ** 2
        - MU_EARTH_M3S2 / np.linalg.norm(r1)
    )
    assert radius_err < ORBIT_RADIUS_TOL_M[name]
    assert abs((e1 - e0) / e0) < ORBIT_ENERGY_TOL[name]


# ---- frame gates (reference test_frames.py) --------------------------------


def test_pad_ecef_geodetic_roundtrip():
    lat, lon, alt = frames.ecef_to_geodetic(jnp.asarray(PAD_ECEF))
    assert abs(math.degrees(float(lat)) - PAD_LAT_DEG) < 1e-7
    assert abs(math.degrees(float(lon)) - PAD_LON_DEG) < 1e-7
    assert abs(float(alt) - 3.0) < 1e-3


def test_ned_basis_orthonormal_up_is_ellipsoid_normal():
    assert np.allclose(_NED @ _NED.T, np.eye(3), atol=1e-12)
    # the ellipsoid normal from the geodetic latitude
    n_expect = np.array(
        [
            math.cos(LAT) * math.cos(LON),
            math.cos(LAT) * math.sin(LON),
            math.sin(LAT),
        ]
    )
    assert np.allclose(UP, n_expect, atol=1e-12)


def test_rotating_frame_magnitudes():
    """Centrifugal ~0.03 m/s^2 at the pad latitude; Coriolis on a 100 m/s
    vertical ascent ~0.015 m/s^2 — textbook magnitudes, correct at 10%."""
    w = np.array([0.0, 0.0, OMEGA_EARTH_RADPS])
    cent = -np.cross(w, np.cross(w, PAD_ECEF))
    assert abs(np.linalg.norm(cent) - 0.0339 * math.cos(LAT)) < 0.004
    cor = -2.0 * np.cross(w, 100.0 * UP)
    assert abs(np.linalg.norm(cor) - 2 * OMEGA_EARTH_RADPS * 100.0 * math.cos(LAT)) < 1e-4


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
