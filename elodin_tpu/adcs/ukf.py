"""Unscented Kalman filter with Merwe scaled sigma points
(parity: fsw/roci/adcs/src/ukf.rs).

The reference builds sigma points row-by-row with typed tensor dims; here the
whole sigma set is one stacked matrix op and the propagate/measure fans run
under ``jax.vmap``, so a UKF update is a single fused XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.smallalg import cholesky_upper, psd_solve


def unscented_transform(points, mean_weights, covar_weights):
    """(ukf.rs:8-28): weighted mean + weighted outer-product covariance."""
    x_hat = jnp.einsum("...sn,...s->...n", points, mean_weights)
    y = points - x_hat[..., None, :]
    covar = jnp.einsum("...sn,...s,...sm->...nm", y, covar_weights, y)
    return x_hat, covar


def cross_covar(x_hat, z_hat, points_x, points_z, covar_weights):
    """(ukf.rs:30-57)."""
    dx = points_x - x_hat[..., None, :]
    dz = points_z - z_hat[..., None, :]
    return jnp.einsum("...sn,...s,...sz->...nz", dx, covar_weights, dz)


def predict(sigma_points, prop_fn, mean_weights, covar_weights, prop_covar):
    """(ukf.rs:59-85)."""
    points = jax.vmap(prop_fn)(sigma_points)
    x_hat, covar = unscented_transform(points, mean_weights, covar_weights)
    return points, x_hat, covar + prop_covar


def innovate(x_points, z, measure_fn, mean_weights, covar_weights, noise_covar):
    """(ukf.rs:86-122)."""
    points = jax.vmap(lambda p: measure_fn(p, z))(x_points)
    z_hat, covar = unscented_transform(points, mean_weights, covar_weights)
    return points, z_hat, covar + noise_covar


class MerweConfig:
    """Merwe scaled sigma-point config (ukf.rs:125-247).

    Value-equal and hashable: instances land in pytree aux_data (UkfState),
    where JAX compares treedefs by equality — two structurally identical
    states built from separate config objects must match or tree_map /
    lax carries mixing them fail and jit caching is defeated."""

    def __init__(self, n: int, alpha: float, beta: float, kappa: float):
        self.n = n
        self.alpha = alpha
        self.beta = beta
        self.kappa = kappa
        self.lambda_ = alpha**2 * (n + kappa) - n

    def _key(self):
        return (self.n, self.alpha, self.beta, self.kappa)

    def __eq__(self, other) -> bool:
        return isinstance(other, MerweConfig) and self._key() == other._key()

    def __hash__(self) -> int:
        return hash(self._key())

    def sigma_points(self, x, sigma):
        """2n+1 points: x, x + rows(U), x - rows(U) where
        U = chol((n+lambda) Sigma)^T (ukf.rs:151-177)."""
        n, lam = self.n, self.lambda_
        u = cholesky_upper((n + lam) * sigma)
        plus = x[..., None, :] + u
        minus = x[..., None, :] - u
        return jnp.concatenate([x[..., None, :], plus, minus], axis=-2)

    def mean_weights(self):
        n, lam = self.n, self.lambda_
        w_i = 1.0 / (2.0 * (n + lam))
        w = jnp.full(2 * n + 1, w_i)
        return w.at[0].set(lam / (n + lam))

    def covariance_weights(self):
        n, lam = self.n, self.lambda_
        w_i = 1.0 / (2.0 * (n + lam))
        w = jnp.full(2 * n + 1, w_i)
        return w.at[0].set(lam / (n + lam) + (1.0 - self.alpha**2 + self.beta))


@jax.tree_util.register_pytree_node_class
@dataclass
class UkfState:
    """UKF state (ukf.rs State); update() mirrors ukf.rs:271-324."""

    x_hat: jnp.ndarray
    covar: jnp.ndarray
    prop_covar: jnp.ndarray
    noise_covar: jnp.ndarray
    config: MerweConfig

    def update(self, z, prop_fn, measure_fn) -> "UkfState":
        cfg = self.config
        sigma = cfg.sigma_points(self.x_hat, self.covar)
        mw = cfg.mean_weights()
        cw = cfg.covariance_weights()
        points_x, x_hat, covar = predict(sigma, prop_fn, mw, cw, self.prop_covar)
        points_z, z_hat, z_covar = innovate(
            points_x, z, measure_fn, mw, cw, self.noise_covar
        )
        pxz = cross_covar(x_hat, z_hat, points_x, points_z, cw)
        # solve instead of explicit inverse (conditioning + cost)
        k = jnp.swapaxes(
            psd_solve(z_covar, jnp.swapaxes(pxz, -1, -2)),
            -1, -2,
        )
        y = z - z_hat
        x_new = x_hat + (k @ y[..., None])[..., 0]
        covar_new = covar - k @ z_covar @ jnp.swapaxes(k, -1, -2)
        return UkfState(x_new, covar_new, self.prop_covar, self.noise_covar, cfg)

    def tree_flatten(self):
        return (self.x_hat, self.covar, self.prop_covar, self.noise_covar), (
            self.config,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, config=aux[0])
