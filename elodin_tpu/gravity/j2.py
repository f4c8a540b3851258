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
        z = r[..., 2:3]
        m = jnp.asarray(mass)[..., None] if jnp.ndim(mass) == jnp.ndim(r) - 1 else mass
        f = -self.mu_earth * m * r / norm**3
        e_z = jnp.zeros_like(r).at[..., 2].set(1.0)
        j2 = (
            -self.mu_earth
            * m
            * self.J2
            * self.r_ref**2
            * (
                3 * z / norm**5 * e_z
                + (3.0 / (2.0 * norm**4) - 15.0 * z**2 / (2.0 * norm**6)) * e_r
            )
        )
        return f + j2
