"""U.S. Standard Atmosphere 1976, vectorized for JAX.

Parity target: reference examples/falcon9/atmosphere.py (US76 to the 86 km
table top; exponential isothermal continuation above).  Anchors asserted by
tests: rho(0) = 1.2250 kg/m^3, p = 22,632 Pa and rho = 0.3639 kg/m^3 at
H = 11 km geopotential, a(0) = 340.29 m/s.

The seven-layer table is standards data.  Base pressures are derived once at
import with numpy (hydrostatic closed forms per layer); the runtime lookup is
a single `searchsorted` + gather, so a batched altitude vector stays one
fused XLA gather regardless of layer mix.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

G0 = 9.80665
R_UNIV = 8.31432  # J / (mol K)
M_AIR_KG_MOL = 28.9644e-3
R_AIR = R_UNIV / M_AIR_KG_MOL  # 287.053 J/(kg K)
GAMMA_AIR = 1.4
_BETA = G0 * M_AIR_KG_MOL / R_UNIV  # hydrostatic exponent scale, K/m
EARTH_RADIUS_GP_M = 6_356_766.0
P_SL_PA = 101_325.0

# US76 layer table: geopotential base altitude (m), base temp (K), lapse (K/m).
_LAYERS = np.array(
    [
        # h_base      T_base    lapse
        [0.0, 288.15, -6.5e-3],
        [11_000.0, 216.65, 0.0],
        [20_000.0, 216.65, 1.0e-3],
        [32_000.0, 228.65, 2.8e-3],
        [47_000.0, 270.65, 0.0],
        [51_000.0, 270.65, -2.8e-3],
        [71_000.0, 214.65, -2.0e-3],
        [84_852.0, 186.946, 0.0],
    ]
)


def _derive_base_pressures(layers: np.ndarray) -> np.ndarray:
    out = [P_SL_PA]
    for k in range(1, len(layers)):
        h0, t0, lam = layers[k - 1]
        span = layers[k, 0] - h0
        if lam == 0.0:
            out.append(out[-1] * math_exp(-_BETA * span / t0))
        else:
            out.append(out[-1] * (t0 / (t0 + lam * span)) ** (_BETA / lam))
    return np.asarray(out)


def math_exp(x: float) -> float:
    return float(np.exp(x))


_BASE_P = _derive_base_pressures(_LAYERS)

_H0 = jnp.asarray(_LAYERS[:, 0])
_T0 = jnp.asarray(_LAYERS[:, 1])
_LAM = jnp.asarray(_LAYERS[:, 2])
_P0 = jnp.asarray(_BASE_P)


def geopotential_altitude(h_m):
    """Geometric -> geopotential altitude."""
    return EARTH_RADIUS_GP_M * h_m / (EARTH_RADIUS_GP_M + h_m)


def pressure_temperature_at_geopotential(h_gp_m):
    """(p [Pa], T [K]) at geopotential altitude; works on any array shape."""
    h = jnp.clip(h_gp_m, 0.0, 250_000.0)
    k = jnp.clip(jnp.searchsorted(_H0, h, side="right") - 1, 0, len(_BASE_P) - 1)
    dh = h - _H0[k]
    t0, lam, p0 = _T0[k], _LAM[k], _P0[k]
    temp = t0 + lam * dh
    iso = lam == 0.0
    # Both branches evaluate; make the gradient branch's pow well-defined
    # where lam == 0 before `where` selects the isothermal closed form.
    lam_nz = jnp.where(iso, 1.0, lam)
    p_grad = p0 * (t0 / temp) ** (_BETA / lam_nz)
    p_iso = p0 * jnp.exp(-_BETA * dh / t0)
    return jnp.where(iso, p_iso, p_grad), temp


def pressure_temperature(h_m):
    return pressure_temperature_at_geopotential(geopotential_altitude(h_m))


def pressure(h_m):
    return pressure_temperature(h_m)[0]


def temperature(h_m):
    return pressure_temperature(h_m)[1]


def density(h_m):
    p, t = pressure_temperature(h_m)
    return p / (R_AIR * t)


def speed_of_sound(h_m):
    return jnp.sqrt(GAMMA_AIR * R_AIR * pressure_temperature(h_m)[1])
