"""ADCS algorithm tests with the reference's golden values
(fsw/roci/adcs/src/{triad,mekf,ukf}.rs test modules)."""

import numpy as np
import jax.numpy as jnp
import pytest

import elodin_tpu as el
from elodin_tpu.adcs import (
    Mekf,
    MerweConfig,
    UkfState,
    YangLQR,
    calculate_covariance,
    magical_calibrate,
    triad,
    yang_lqr_control,
)
from elodin_tpu.spatial import (
    quat_from_axis_angle,
    quat_inverse,
    quat_mul,
    quat_rotate,
)


def test_triad_golden():
    # triad.rs:29-66: 45 deg about z gives the sqrt(2)/2 DCM
    q = quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), np.pi / 4)
    ref_a = np.array([0.0, 1.0, 0.0])
    ref_b = np.array([1.0, 0.0, 0.0])
    qi = quat_inverse(q)
    body_a = np.asarray(quat_rotate(qi, ref_a))
    body_b = np.asarray(quat_rotate(qi, ref_b))
    dcm = np.asarray(triad(body_a, body_b, ref_a, ref_b))
    s = np.sqrt(2) / 2
    expected = np.array([[s, s, 0.0], [-s, s, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(dcm, expected, atol=1e-10)


@pytest.mark.parametrize("axis", [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
def test_triad_recovers_rotation(axis):
    for ang in np.linspace(-2.0, 2.0, 9):
        q = quat_from_axis_angle(np.array(axis), ang)
        ref_a = np.array([0.0, 1.0, 0.0])
        ref_b = np.array([1.0, 0.0, 0.0])
        qi = quat_inverse(q)
        body_a = np.asarray(quat_rotate(qi, ref_a))
        body_b = np.asarray(quat_rotate(qi, ref_b))
        dcm = np.asarray(triad(body_a, body_b, ref_a, ref_b))
        for v in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [1.0, 0, 1.0]):
            v = np.array(v)
            np.testing.assert_allclose(
                dcm @ v, np.asarray(quat_rotate(qi, v)), atol=1e-5
            )


def test_mekf_covariance_golden():
    # mekf.rs tests: sigma_g/sigma_b/dt chosen to hit the quoted Q values
    sigma_g = np.array([0.01, 0.01, 0.01])
    sigma_b = np.array([0.01, 0.01, 0.01])
    dt = 1.0 / 120.0
    q = np.asarray(calculate_covariance(sigma_g, sigma_b, dt))
    np.testing.assert_allclose(q[0, 0], 8.33352623e-07, rtol=1e-6)
    np.testing.assert_allclose(q[0, 3], 3.47222222e-09, rtol=1e-6)
    np.testing.assert_allclose(q[3, 3], sigma_b[0] ** 2 * dt, rtol=1e-12)


def test_mekf_propagate_quaternion_golden():
    # mekf.rs:246-253
    from elodin_tpu.adcs.mekf import propagate_quaternion
    from elodin_tpu.spatial import quat_identity

    q = propagate_quaternion(quat_identity(), jnp.asarray([1.0, 0.0, 0.0]), 1.0 / 60.0)
    np.testing.assert_allclose(
        np.asarray(q), [0.00833324, 0.0, 0.0, 0.99996528], atol=1e-5
    )


def test_mekf_propagate_covariance_golden():
    # mekf.rs:213-241
    from elodin_tpu.adcs.mekf import propagate_state_covariance

    yqy = np.zeros((6, 6))
    np.fill_diagonal(yqy[:3, :3], 8.33352623e-07)
    np.fill_diagonal(yqy[3:, 3:], 8.3333e-07)
    np.fill_diagonal(yqy[:3, 3:], -3.4722e-09)
    np.fill_diagonal(yqy[3:, :3], -3.4722e-09)
    out = np.asarray(
        propagate_state_covariance(
            jnp.eye(6), jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(yqy), 1.0 / 120.0
        )
    )
    assert abs(out[0, 0] - 1.00007028) < 1e-6
    assert abs(out[0, 3] - -8.33333681e-03) < 1e-6
    assert abs(out[1, 4] - -8.33324036e-03) < 1e-6
    assert abs(out[1, 5] - -3.47220213e-05) < 1e-6
    assert abs(out[2, 4] - 3.47220213e-05) < 1e-6


def test_mekf_converges():
    """mekf.rs:255-295 test_mekf: static convergence to a 45-deg attitude,
    then tracking under rotation with zero-bias recovery."""
    dt = 1.0 / 120.0
    q = quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), np.pi / 4)
    ref_a = np.array([0.0, 1.0, 0.0])
    ref_b = np.array([1.0, 0.0, 0.0])
    state = Mekf.new(np.full(3, 0.01), np.full(3, 0.01), dt)
    body_a = np.asarray(quat_rotate(quat_inverse(q), ref_a))
    body_b = np.asarray(quat_rotate(quat_inverse(q), ref_b))
    for _ in range(180):
        state.omega = jnp.zeros(3)
        state = state.estimate_attitude(
            [body_a, body_b], [ref_a, ref_b], [0.03, 0.03]
        )
    np.testing.assert_allclose(np.asarray(state.q_hat), np.asarray(q), atol=1e-3)
    from elodin_tpu.spatial import quat_integrate_body

    for _ in range(120):
        q = quat_integrate_body(q, jnp.asarray([1.0 / 120.0, 0.0, 0.0]))
        body_a = np.asarray(quat_rotate(quat_inverse(q), ref_a))
        body_b = np.asarray(quat_rotate(quat_inverse(q), ref_b))
        state.omega = jnp.asarray([1.0, 0.0, 0.0])
        state = state.estimate_attitude(
            [body_a, body_b], [ref_a, ref_b], [0.03, 0.03]
        )
    np.testing.assert_allclose(np.asarray(state.b_hat), np.zeros(3), atol=1e-2)
    np.testing.assert_allclose(np.asarray(state.q_hat), np.asarray(q), atol=1e-3)


def test_mekf_reset_if_invalid():
    state = Mekf.new(np.full(3, 0.01), np.full(3, 1e-4), 0.01)
    state.q_hat = jnp.asarray([np.nan, 0.0, 0.0, 1.0])
    state = state.reset_if_invalid()
    np.testing.assert_allclose(np.asarray(state.q_hat), [0, 0, 0, 1.0])


def test_ukf_sigma_points_golden():
    # ukf.rs:366-383
    cfg = MerweConfig(3, 1.0, 2.0, 2.0)
    points = np.asarray(
        cfg.sigma_points(jnp.asarray([0.0, 1.0, 0.0]), jnp.eye(3))
    )
    expected = np.array(
        [
            [0.0, 1.0, 0.0],
            [2.23606798, 1.0, 0.0],
            [0.0, 3.23606798, 0.0],
            [0.0, 1.0, 2.23606798],
            [-2.23606798, 1.0, 0.0],
            [0.0, -1.23606798, 0.0],
            [0.0, 1.0, -2.23606798],
        ]
    )
    np.testing.assert_allclose(points, expected, atol=1e-7)


def test_ukf_weights_golden():
    # ukf.rs:385-400
    cfg = MerweConfig(3, 1.0, 1.0, 2.0)
    assert cfg.lambda_ == 2.0
    np.testing.assert_allclose(
        np.asarray(cfg.mean_weights()), [0.4, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]
    )
    cfg2 = MerweConfig(3, 1.0, 2.0, 2.0)
    np.testing.assert_allclose(
        np.asarray(cfg2.covariance_weights()),
        [2.4, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1],
    )


def test_ukf_linear_tracking():
    """UKF on a linear system reduces estimation error."""
    dt = 0.1
    state = UkfState(
        x_hat=jnp.asarray([0.0, 1.0]),
        covar=jnp.eye(2),
        prop_covar=jnp.eye(2) * 1e-4,
        noise_covar=jnp.eye(1) * 1e-2,
        config=MerweConfig(2, 1.0, 2.0, 1.0),
    )

    def prop(x):
        return jnp.asarray([x[0] + dt * x[1], x[1]])

    def measure(x, _z):
        return x[:1]

    true_x, true_v = 0.0, 0.7
    rng = np.random.default_rng(1)
    for _ in range(50):
        true_x += dt * true_v
        z = jnp.asarray([true_x + rng.normal(0, 0.1)])
        state = state.update(z, prop, measure)
    assert abs(float(state.x_hat[1]) - true_v) < 0.05


def test_yang_lqr():
    # control is zero at the goal, restoring toward the goal otherwise
    j = np.array([1.0, 2.0, 3.0])
    lqr = YangLQR(j, np.ones(3), np.ones(3) * 4.0, np.ones(3))
    np.testing.assert_allclose(np.asarray(lqr.k), 2.0)
    goal = quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), 0.5)
    u_at_goal = np.asarray(lqr.control(goal, np.zeros(3), goal))
    np.testing.assert_allclose(u_at_goal, 0.0, atol=1e-12)
    att = quat_from_axis_angle(np.array([0.0, 0.0, 1.0]), 0.0)
    u = np.asarray(lqr.control(att, np.zeros(3), goal))
    assert u[2] > 0  # torque toward +z rotation


def test_yang_lqr_closed_loop():
    """Rigid body + LQR drives attitude to the goal."""
    j = np.array([1.0, 1.0, 1.0])
    lqr = YangLQR(j, np.ones(3) * 4.0, np.ones(3) * 4.0, np.ones(3))
    goal = quat_from_axis_angle(np.array([0.2, 0.9, 0.1]), 0.9)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    w = jnp.zeros(3)
    dt = 0.05
    from elodin_tpu.spatial import quat_integrate_body

    for _ in range(400):
        torque = lqr.control(q, w, goal)
        w = w + dt * torque / j
        q = quat_integrate_body(q, w * dt)
    dot = abs(float(jnp.sum(q * goal)))
    assert dot > 0.9995, f"LQR did not converge: {dot}"


def test_magical_synthetic():
    """Recover a synthetic hard-iron offset + diagonal soft-iron scale."""
    rng = np.random.default_rng(2)
    n = 64
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t_true = np.diag([1.2, 0.9, 1.1])
    h_true = np.array([0.3, -0.2, 0.5])
    y = dirs @ t_true.T + h_true
    m, t, h, done = magical_calibrate(y)
    assert bool(done)
    np.testing.assert_allclose(np.asarray(h), h_true, atol=2e-2)
    # T is identified up to a rotation; compare the invariant T T^T
    np.testing.assert_allclose(
        np.asarray(t) @ np.asarray(t).T, t_true @ t_true.T, atol=5e-2
    )


def test_magkal_synthetic():
    """MagKal (streaming UKF calibration) makes corrupted readings
    calibratable: like the reference test (magkal.rs test_calibrate), the
    gate is FUNCTIONAL — corrected readings point along the true field to
    cos ~ 1 — because the D parameters themselves are only weakly
    identifiable from the scalar Crassidis residual."""
    from elodin_tpu.adcs import MagKal

    rng = np.random.default_rng(5)
    b_true = np.array([12.0, -7.0, 4.0])
    d_true = np.array([[0.02, 0.005, 0.0],
                       [0.005, -0.015, 0.002],
                       [0.0, 0.002, 0.01]])
    kal = MagKal()
    fields, readings = [], []
    for _ in range(300):
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        field = 45.0 * direction  # ~Earth-field magnitude, uT
        z = (np.eye(3) + d_true) @ field + b_true
        fields.append(field)
        readings.append(z)
        kal = kal.update(z, field)
    d_hat = np.asarray(kal.d_hat)
    h_hat = np.asarray(kal.h_hat)
    # apply the estimated calibration: invert z = (I+D)B + b
    inv = np.linalg.inv(np.eye(3) + d_hat)
    for field, z in zip(fields[::25], readings[::25]):
        corrected = inv @ (z - h_hat)
        cos = corrected @ field / (
            np.linalg.norm(corrected) * np.linalg.norm(field)
        )
        assert cos > 1.0 - 6e-3, cos
    # the hard-iron offset itself is strongly identifiable
    np.testing.assert_allclose(h_hat, b_true, atol=0.8)


def test_mekf_f32_policy_scan_carry():
    """Under ELODIN_FLOAT_POLICY=f32 the MEKF state must be uniformly f32
    (regression: hard-f64 zeros/eye blocks promoted the filter mid-scan,
    which breaks lax.scan carry typing and silently runs emulated f64)."""
    from elodin_tpu.adcs import mekf as mekf_mod

    filt = mekf_mod.Mekf.new(
        jnp.full(3, 1e-3, dtype=jnp.float32),
        jnp.full(3, 1e-5, dtype=jnp.float32),
        0.01,
    )
    f32 = [filt.q_hat.dtype, filt.b_hat.dtype, filt.p.dtype, filt.omega.dtype]
    # under the default f64 policy everything is f64; force f32 arrays in
    # and assert no promotion happens through an update + reset
    filt = mekf_mod.Mekf(
        filt.q_hat.astype(jnp.float32), filt.b_hat.astype(jnp.float32),
        filt.p.astype(jnp.float32), filt.omega.astype(jnp.float32),
        filt.yqy.astype(jnp.float32), filt.dt,
    )
    body = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
    ref = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
    # sigma deliberately f64: it must be cast down, not promote the filter
    out = filt.estimate_attitude([body], [ref], [jnp.float64(0.01)])
    out = out.reset_if_invalid()
    assert out.q_hat.dtype == jnp.float32, f32
    assert out.b_hat.dtype == jnp.float32
    assert out.p.dtype == jnp.float32
    assert out.omega.dtype == jnp.float32


def test_mekf_measurement_length_mismatch_raises():
    """A sigma list shorter than the vector-observation lists must fail
    loudly instead of silently dropping a measurement."""
    from elodin_tpu.adcs import mekf as mekf_mod

    filt = mekf_mod.Mekf.new(jnp.full(3, 1e-3), jnp.full(3, 1e-5), 0.01)
    v = jnp.asarray([0.0, 0.0, 1.0])
    with pytest.raises(ValueError):
        filt.estimate_attitude([v, v], [v, v], [0.01])


def test_yang_lqr_large_angle_full_authority():
    """Regression: using the raw quaternion scalar as 'sign' scaled torque
    by cos(theta/2) — ~1000x too weak near a 180-degree slew."""
    import numpy as np

    from elodin_tpu.adcs.lqr import yang_lqr_control

    # attitude error ~180 deg about z: error quat ~ (0,0,1,~0)
    att = np.array([0.0, 0.0, np.sin(np.pi / 2 - 1e-3), np.cos(np.pi / 2 - 1e-3)])
    goal = np.array([0.0, 0.0, 0.0, 1.0])
    u = np.asarray(yang_lqr_control(att, np.zeros(3), goal, 1.0, 2.0))
    assert abs(u[2]) > 1.9, u  # full gain, not cos(theta/2)-collapsed
