"""Frames + geomagnetic model tests (golden values from
libs/nox-frames/src/earth.rs tests and the official NOAA WMM2020 test
vectors)."""

import os

import numpy as np
import pytest

from elodin_tpu import frames, wmm

REF_IERS = "/root/reference/libs/nox-frames/finals2000A.data"


def test_earth_rotation_golden():
    ep = frames.Epoch.from_gregorian_utc(2019, 1, 4, 12, 0, 0)
    iers = frames.IERS(REF_IERS if os.path.isfile(REF_IERS) else None)
    er = frames.earth_rotation(ep, iers)
    expected = np.array(
        [[0.23457505, -0.97209801, 0.0], [0.97209801, 0.23457505, 0.0], [0.0, 0.0, 1.0]]
    )
    tol = 1e-5 if os.path.isfile(REF_IERS) else 1e-4
    np.testing.assert_allclose(er, expected, atol=tol)


@pytest.mark.skipif(not os.path.isfile(REF_IERS), reason="IERS data unavailable")
def test_eci_to_ecef_golden():
    # earth.rs:146-156; our truncated nutation series is good to ~0.5 m
    ep = frames.Epoch.from_gregorian_utc(2019, 1, 4, 12, 0, 0)
    iers = frames.IERS(REF_IERS)
    x_eci = np.array([-2981784.0, 5207055.0, 3161595.0])
    x_ecef = frames.eci_to_ecef(ep, iers) @ x_eci
    expected = np.array([-5762648.74320628, -1682708.43849581, 3156027.93288401])
    assert np.abs(x_ecef - expected).max() < 1.0


def test_eci_ecef_roundtrip_orthonormal():
    ep = frames.Epoch.from_gregorian_utc(2022, 6, 15, 6, 30, 0)
    dcm = frames.eci_to_ecef(ep, frames.IERS(None))
    np.testing.assert_allclose(dcm @ dcm.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(dcm), 1.0, atol=1e-12)


def test_ned_to_ecef_golden():
    # earth.rs:158-166
    lat, long = np.radians(40.29959), np.radians(-111.72822)
    ecef = np.asarray(frames.ned_to_ecef(lat, long)) @ np.array([4.0, 5.0, 6.0])
    np.testing.assert_allclose(ecef, [7.2966, 4.8032, -0.8300], atol=1e-4)


def test_sun_vec_golden():
    # earth.rs:168-180 (astropy source), epsilon 1e-2
    ep = frames.Epoch.from_gregorian_utc(2019, 1, 4, 12, 0, 0)
    sv = frames.sun_vec(ep)
    expected = np.array([0.23061245658276283, -0.8770198065823603, -0.3801863810692247])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(sv, expected, atol=1e-2)


def test_sun_vec_equinox_and_solstice():
    """Independent astronomical goldens AWAY from perihelion, where the
    sin(2M) equation-of-center term is large (the Jan-4 golden above sits
    where it vanishes and cannot catch a bad coefficient)."""
    # March 2020 equinox (2020-03-20 03:49 UTC): sun at RA ~ 0 -> +X in ECI
    sv = frames.sun_vec(frames.Epoch.from_gregorian_utc(2020, 3, 20, 3, 49, 0))
    assert np.degrees(np.arccos(np.clip(sv @ np.array([1.0, 0, 0]), -1, 1))) < 0.5
    # June 2019 solstice (2019-06-21 15:54 UTC): RA = 90 deg, dec = +obliquity
    eps = np.radians(23.4366)
    target = np.array([0.0, np.cos(eps), np.sin(eps)])
    sv = frames.sun_vec(frames.Epoch.from_gregorian_utc(2019, 6, 21, 15, 54, 0))
    assert np.degrees(np.arccos(np.clip(sv @ target, -1, 1))) < 0.5


def test_geodetic_roundtrip():
    lat = np.radians(np.array([-75.0, -10.0, 0.0, 33.0, 80.0]))
    lon = np.radians(np.array([10.0, 250.0, -45.0, 0.0, 179.0]))
    alt = np.array([0.0, 100.0, 5e3, 400e3, 35786e3])
    ecef = frames.geodetic_to_ecef(lat, lon, alt)
    lat2, lon2, alt2 = frames.ecef_to_geodetic(ecef)
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-10)
    np.testing.assert_allclose(np.asarray(alt2), alt, atol=1e-4)


def test_wmm_official_test_vector():
    # NOAA WMM2020 test value: 2020.0, h=0, lat=80N, lon=0
    b = np.asarray(wmm.field_ned(np.radians(80.0), 0.0, 0.0, 2020.0))
    np.testing.assert_allclose(b, [6570.4, -146.3, 54606.0], atol=0.5)


def test_wmm_equator_value():
    b = np.asarray(wmm.field_ned(0.0, np.radians(120.0), 0.0, 2020.0))
    np.testing.assert_allclose(b[0], 39624.3, atol=1.0)


def test_wmm_batched():
    lat = np.radians(np.array([80.0, 0.0, -80.0]))
    lon = np.radians(np.array([0.0, 120.0, 240.0]))
    alt = np.zeros(3)
    b = np.asarray(wmm.field_ned(lat, lon, alt, 2020.0))
    singles = np.stack(
        [np.asarray(wmm.field_ned(la, lo, 0.0, 2020.0)) for la, lo in zip(lat, lon)]
    )
    np.testing.assert_allclose(b, singles, atol=1e-9)


def test_wmm_secular_variation():
    b0 = np.asarray(wmm.field_ned(np.radians(40.0), np.radians(-105.0), 0.0, 2020.0))
    b5 = np.asarray(wmm.field_ned(np.radians(40.0), np.radians(-105.0), 0.0, 2024.0))
    # field drifts on the order of tens of nT/yr, not thousands
    assert 1.0 < np.abs(b5 - b0).max() < 1000.0


def test_egm08_real_coefficient_load_path(tmp_path):
    """Accuracy test for the C_normal.npy/S_normal.npy load path
    (reference python/elodin/egm08.py:16-50) with REAL EGM2008 degree-2/3
    coefficients: the Pines-recursion acceleration must match the gradient
    of the independently-written textbook spherical-harmonic potential
    (autodiff oracle) to near machine precision."""
    import jax
    import jax.numpy as jnp

    from elodin_tpu.gravity.egm08 import EGM08

    # real EGM2008 normalized coefficients (tide-free), degree <= 3
    C = np.zeros((4, 4))
    S = np.zeros((4, 4))
    C[0, 0] = 1.0
    C[2, 0] = -484.165143790815e-6
    C[2, 2] = 2.43938357328313e-6
    S[2, 2] = -1.40027370385934e-6
    C[3, 0] = 0.9571612070934731e-6
    C[3, 1] = 2.03046201047864e-6
    S[3, 1] = 0.248200415856872e-6
    np.save(tmp_path / "C_normal.npy", C)
    np.save(tmp_path / "S_normal.npy", S)

    eg = EGM08(3, cache_directory=str(tmp_path))
    # confirm the files were actually loaded (not the zonal fallback)
    np.testing.assert_allclose(np.asarray(eg.c_bar), C)
    np.testing.assert_allclose(np.asarray(eg.s_bar), S)

    mu, R = eg.mu_earth, eg.r_ref

    def potential(r_vec):
        """U = mu/r * sum_l (R/r)^l sum_m Pbar_lm(sin phi) *
        (Cbar cos m lam + Sbar sin m lam) — geodesy normalization,
        no Condon-Shortley phase; written independently of the Pines code."""
        x, y, z = r_vec[0], r_vec[1], r_vec[2]
        r = jnp.sqrt(x * x + y * y + z * z)
        u = z / r  # sin(latitude)
        lam = jnp.arctan2(y, x)
        c = jnp.sqrt(1.0 - u * u)  # cos(latitude)
        # unnormalized associated Legendre (geodesy sign convention)
        P = {
            (2, 0): 0.5 * (3 * u * u - 1),
            (2, 1): 3 * u * c,
            (2, 2): 3 * (1 - u * u),
            (3, 0): 0.5 * (5 * u**3 - 3 * u),
            (3, 1): c * 1.5 * (5 * u * u - 1),
            (3, 2): 15 * u * (1 - u * u),
            (3, 3): 15 * c**3,
        }

        def nbar(l, m):
            import math

            k = 1.0 if m == 0 else 2.0
            return np.sqrt(
                k * (2 * l + 1) * math.factorial(l - m) / math.factorial(l + m)
            )

        total = 1.0
        for (l, m), p in P.items():
            cb, sb = C[l, m], S[l, m]
            if cb == 0.0 and sb == 0.0:
                continue
            total += (
                (R / r) ** l
                * nbar(l, m)
                * p
                * (cb * jnp.cos(m * lam) + sb * jnp.sin(m * lam))
            )
        return mu / r * total

    grad_u = jax.grad(potential)
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(32, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 6.878e6
    got = np.asarray(eg.acceleration(jnp.asarray(pts)))
    want = np.stack([np.asarray(grad_u(jnp.asarray(p))) for p in pts])
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 1e-12, f"Pines vs potential-gradient mismatch: {err}"
