"""J2 oblateness gravity (parity: python/elodin/j2.py)."""

from __future__ import annotations

import jax.numpy as jnp


class J2:
    def __init__(self):
        self.r_ref = 6.378e6  # equatorial radius, m
        self.mu_earth = 3.986004418e14  # GM, m^3/s^2
        self.J2 = 1.08262668e-3

    def compute_field(self, x, y, z, mass):
        """Point gravity + J2 zonal perturbation force on ``mass`` at
        (x, y, z) in an Earth-centered frame; batched over leading dims."""
        r = jnp.stack([jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)], axis=-1)
        return self.force(r, mass)

    def force(self, r, mass):
        r = jnp.asarray(r)
        norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
        e_r = r / norm
        # sin(lat) = z/r: factor EVERYTHING through dimensionless ratios —
        # bare norm**6 (~1e41 at LEO radii) overflows the f32 exponent
        # range of TPU-emulated f64 and returned NaN forces on the TPU
        # backend (finite on CPU, so the CPU-pinned test suite never saw
        # it).  No intermediate here exceeds ~mu/r^2 * (r_ref/r)^2.
        u = r[..., 2:3] / norm  # sin(geocentric latitude)
        m = jnp.asarray(mass)[..., None] if jnp.ndim(mass) == jnp.ndim(r) - 1 else mass
        g0 = self.mu_earth / norm**2  # point-mass accel magnitude
        f = -m * g0 * e_r
        e_z = jnp.zeros_like(r).at[..., 2].set(1.0)
        j2_scale = g0 * self.J2 * (self.r_ref / norm) ** 2
        j2 = -m * j2_scale * (
            3.0 * u * e_z + (1.5 - 7.5 * u * u) * e_r
        )
        return f + j2
