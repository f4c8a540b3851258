"""Drone input-shaping + attitude-error gates.

Repo-side equivalent of reference examples/drone/test_util.py plus shaping
properties the reference never asserts (accel-cap respect, tilt/heading
recombination, large-step convergence through the feedforward washout).
"""

import importlib.util
import os
import sys

import jax.numpy as jnp
import numpy as np

import elodin as el

DRONE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples", "drone"
)


def _mod(name: str):
    key = f"drone_{name}_shapet"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, os.path.join(DRONE_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def test_quat_euler_round_trip():
    shp = _mod("shaping")
    cases = [
        (jnp.asarray([1.0, 0.0, 0.0]), 0.0, [0.0, 0.0, 0.0]),
        (jnp.asarray([1.0, 0.0, 0.0]), np.pi / 2, [np.pi / 2, 0.0, 0.0]),
        (jnp.asarray([0.0, 1.0, 0.0]), np.pi / 2, [0.0, np.pi / 2, 0.0]),
        (jnp.asarray([0.0, 0.0, 1.0]), np.pi / 2, [0.0, 0.0, np.pi / 2]),
    ]
    for axis, angle, expected in cases:
        q = el.Quaternion.from_axis_angle(axis, angle)
        euler = np.asarray(shp.quat_to_euler(q))
        assert np.allclose(euler, expected, atol=1e-6), (angle, euler)
        back = shp.euler_to_quat(jnp.asarray(euler))
        assert np.allclose(np.asarray(back.vector()), np.asarray(q.vector()), atol=1e-6)


def test_quat_to_axis_angle():
    shp = _mod("shaping")
    q = el.Quaternion.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), np.pi / 2)
    rv = np.asarray(shp.quat_to_axis_angle(q))
    assert np.allclose(rv, [0.0, np.pi / 2, 0.0], atol=1e-9)
    # near-identity stays finite and linear
    q = el.Quaternion.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 1e-12)
    rv = np.asarray(shp.quat_to_axis_angle(q))
    assert np.all(np.isfinite(rv)) and abs(rv[0] - 1e-12) < 1e-15


def test_angular_euler_rate_conversion():
    shp = _mod("shaping")
    att = el.Quaternion.identity()
    w = jnp.asarray([1.0, 2.0, 3.0])
    er = shp.angular_to_euler_rate(att, w)
    assert np.allclose(np.asarray(er), [1.0, 2.0, 3.0], atol=1e-6)
    assert np.allclose(np.asarray(shp.euler_to_angular_rate(att, er)), np.asarray(w), atol=1e-6)
    # 90-degree roll swaps pitch/yaw authority (reference test_util gate)
    att = el.Quaternion.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), np.pi / 2)
    w = jnp.asarray([0.0, 2.0, 1.0])
    er = shp.angular_to_euler_rate(att, w)
    assert np.allclose(np.asarray(er), [0.0, -1.0, 2.0], atol=1e-6), er
    assert np.allclose(np.asarray(shp.euler_to_angular_rate(att, er)), np.asarray(w), atol=1e-6)


def test_normalize_angle_and_quat_dist():
    shp = _mod("shaping")
    for a, want in [(3 * np.pi, np.pi), (-3 * np.pi, np.pi), (0.5 * np.pi, 0.5 * np.pi),
                    (-0.5 * np.pi, -0.5 * np.pi), (1.5 * np.pi, -0.5 * np.pi)]:
        assert abs(float(shp.normalize_angle(jnp.float64(a))) - want) < 1e-9, a
    q1 = el.Quaternion.identity()
    q2 = el.Quaternion.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 1.0)
    assert abs(float(shp.quat_dist(q1, q2)) - 1.0) < 1e-6


def test_sqrt_controller_regimes():
    shp = _mod("shaping")
    p, amax, dt = 4.0, 2.0, 1.0 / 300.0
    lin_dist = amax / p**2
    # linear region: exactly P * error
    e = 0.5 * lin_dist
    out = float(shp.sqrt_controller(jnp.float64(e), p, amax, dt))
    assert abs(out - p * e) < 1e-12
    # sqrt region: implied stopping acceleration never exceeds the cap.
    # Stopping from rate v over distance e needs a = v^2 / (2 e).
    for e in [2 * lin_dist, 10 * lin_dist, 100 * lin_dist]:
        v = float(shp.sqrt_controller(jnp.float64(e), p, amax, dt))
        assert v**2 / (2.0 * e) <= amax + 1e-9, e
    # odd symmetry
    v_neg = float(shp.sqrt_controller(jnp.float64(-10 * lin_dist), p, amax, dt))
    v_pos = float(shp.sqrt_controller(jnp.float64(10 * lin_dist), p, amax, dt))
    assert abs(v_neg + v_pos) < 1e-12
    # last-step clip: the demand never overshoots the error in one dt
    tiny = 1e-6
    v = float(shp.sqrt_controller(jnp.float64(tiny), 1e6, amax, dt))
    assert v <= tiny / dt + 1e-15


def test_shape_rate_accel_cap_and_convergence():
    shp = _mod("shaping")
    amax, dt = 5.0, 1.0 / 300.0
    target, desired = 0.0, 3.0
    rates = [target]
    t = jnp.float64(target)
    for _ in range(2000):
        t = shp.shape_rate(t, jnp.float64(desired), amax, dt, 0.1)
        rates.append(float(t))
    accel = np.abs(np.diff(rates)) / dt
    assert accel.max() <= amax + 1e-9
    assert abs(rates[-1] - desired) < 1e-3


def test_shape_angle_never_exceeds_budget():
    shp = _mod("shaping")
    amax, dt = 6.0, 1.0 / 300.0
    rate = jnp.float64(0.0)
    prev = 0.0
    for _ in range(300):
        rate = shp.shape_angle(jnp.float64(1.0), rate, amax, dt, 0.15)
        assert abs(float(rate) - prev) <= amax * dt + 1e-12
        prev = float(rate)


def test_tilt_heading_error_decomposition():
    shp = _mod("shaping")
    up = jnp.asarray([0.0, 0.0, 1.0])
    # pure yaw error: no tilt, full heading
    q_b = el.Quaternion.identity()
    q_t = el.Quaternion.from_axis_angle(up, 0.7)
    err, tilt = shp.tilt_heading_error(q_t, q_b)
    assert float(tilt) < 1e-9
    assert np.allclose(np.asarray(err), [0.0, 0.0, 0.7], atol=1e-9)
    # pure tilt error: no heading component
    q_t = el.Quaternion.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), 0.4)
    err, tilt = shp.tilt_heading_error(q_t, q_b)
    assert abs(float(tilt) - 0.4) < 1e-9
    assert abs(float(err[2])) < 1e-9
    assert abs(float(err[0]) - 0.4) < 1e-9
    # mixed error recombines: q_tilt * q_head == body->target
    q_b = el.Quaternion.from_axis_angle(jnp.asarray([0.3, 0.5, 0.2]) / np.linalg.norm([0.3, 0.5, 0.2]), 0.6)
    q_t = el.Quaternion.from_axis_angle(jnp.asarray([0.1, -0.4, 0.8]) / np.linalg.norm([0.1, -0.4, 0.8]), 0.9)
    err, tilt = shp.tilt_heading_error(q_t, q_b)
    # reconstruct: tilt about (err_x, err_y), heading about z, in order
    exy = jnp.asarray([err[0], err[1], 0.0])
    n = float(jnp.linalg.norm(exy))
    q_tilt = el.Quaternion.from_axis_angle(exy / n, n)
    q_head = el.Quaternion.from_axis_angle(up, err[2])
    q_err = q_b.inverse() * q_t
    recombined = (q_tilt * q_head).vector()
    want = q_err.vector()
    sign = np.sign(float(jnp.dot(recombined, want)))
    assert np.allclose(np.asarray(recombined) * sign, np.asarray(want), atol=1e-9)
    # tilt angle matches the z-axis misalignment
    zb = np.asarray(q_b @ up)
    zt = np.asarray(q_t @ up)
    assert abs(float(tilt) - np.arccos(np.clip(zb @ zt, -1, 1))) < 1e-9


def test_euler_accel_limit_conservative():
    shp = _mod("shaping")
    budget = jnp.asarray([10.0, 10.0, 3.0])
    for axis, angle in [((1.0, 0.0, 0.0), 0.0), ((1.0, 0.0, 0.0), 0.9), ((0.0, 1.0, 0.0), 0.7)]:
        att = el.Quaternion.from_axis_angle(jnp.asarray(axis), angle)
        lim = np.asarray(shp.angular_to_euler_accel_limit(att, budget))
        assert np.all(lim > 0.0)
        # never grants more than the most generous single-axis budget scaled
        # by the worst-case 1/0.1 trig clip
        assert np.all(lim <= float(jnp.max(budget)) / 0.1 + 1e-9)


def test_large_step_converges_through_washout():
    """A 60-degree commanded roll step (tilt error crosses the feedforward
    washout band) still converges, flying on the estimator."""
    key = "drone_main_shapet"
    if key not in sys.modules:
        spec = importlib.util.spec_from_file_location(key, os.path.join(DRONE_DIR, "main.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
    m = sys.modules[key]
    w = m.build_world()
    ex = w.build(m.build_system(noise=True), simulation_rate=m.SIMULATION_RATE)
    ex.record_history = False
    ex.write_component("drone.angle_desired", np.asarray([np.radians(60.0), 0.0, 0.0]))
    ex.run(int(4 * m.SIMULATION_RATE), show_progress=False)
    pos = np.asarray(ex.read_component("drone.world_pos")).ravel()
    q = el.Quaternion.from_array(jnp.asarray(pos[:4]))
    y_body = np.asarray(q @ jnp.asarray([0.0, 1.0, 0.0]))
    roll = np.degrees(np.arctan2(y_body[2], y_body[1]))
    assert abs(roll - 60.0) < 5.0, roll
