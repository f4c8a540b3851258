"""Covariance ellipsoid comparison
(parity: examples/covariance-ellipsoids/main.py — two entities publish the
same time-varying 3x3 covariance, one as a packed lower-triangular Cholesky
factor and one as the packed covariance itself, for the editor's
covariance-ellipsoid renderer to draw; they must overlay exactly).

Packing order for a symmetric/lower-triangular 3x3 is row-major lower:
[m00, m10, m11, m20, m21, m22].
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

SIM_RATE = 60.0
SIM_TIME_STEP = 1.0 / SIM_RATE
CYCLE_SECONDS = 8.0

CholeskyFactor = ty.Annotated[
    jax.Array,
    el.Component("cholesky_factor", el.ComponentType(el.PrimitiveType.F64, (6,))),
]
ErrorCovariance = ty.Annotated[
    jax.Array,
    el.Component("error_covariance", el.ComponentType(el.PrimitiveType.F64, (6,))),
]


@el.dataclass
class CholeskyData(el.Archetype):
    cholesky_factor: CholeskyFactor = field(default_factory=lambda: jnp.zeros(6))


@el.dataclass
class CovarianceData(el.Archetype):
    error_covariance: ErrorCovariance = field(default_factory=lambda: jnp.zeros(6))


def cholesky_at(t):
    """Time-varying lower-triangular factor (same cycle as the reference)."""
    phase = 2.0 * jnp.pi * t / CYCLE_SECONDS
    return jnp.array(
        [
            [1.2 + 0.3 * jnp.sin(phase), 0.0, 0.0],
            [0.4 * jnp.sin(phase * 0.7), 0.8 + 0.2 * jnp.cos(phase), 0.0],
            [
                -0.25 * jnp.cos(phase * 0.8),
                0.3 * jnp.sin(phase * 1.3),
                0.5 + 0.15 * jnp.sin(phase + 0.5),
            ],
        ]
    )


def pack_lower(m):
    return jnp.array([m[0, 0], m[1, 0], m[1, 1], m[2, 0], m[2, 1], m[2, 2]])


@el.system
def publish_cholesky(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[CholeskyFactor],
) -> el.Query[CholeskyFactor]:
    t = tick[0] * ts[0]
    return q.map(CholeskyFactor, lambda _c: pack_lower(cholesky_at(t)))


@el.system
def publish_covariance(
    tick: el.Query[el.SimulationTick],
    ts: el.Query[el.SimulationTimeStep],
    q: el.Query[ErrorCovariance],
) -> el.Query[ErrorCovariance]:
    t = tick[0] * ts[0]
    L = cholesky_at(t)
    return q.map(ErrorCovariance, lambda _c: pack_lower(L @ L.T))


def world() -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(world_pos=el.SpatialTransform(linear=jnp.array([-2.0, 0.0, 0.0]))),
            CholeskyData(),
        ],
        name="cholesky",
    )
    w.spawn(
        [
            el.Body(world_pos=el.SpatialTransform(linear=jnp.array([2.0, 0.0, 0.0]))),
            CovarianceData(),
        ],
        name="covariance",
    )
    w.schematic(
        """
        viewport name=Viewport look_at="(0,0,0,0, 0,0,0)" show_grid=#true
        object_3d eql="cholesky.world_pos" {
            covariance_ellipsoid factor="cholesky.cholesky_factor" kind="cholesky"
        }
        object_3d eql="covariance.world_pos" {
            covariance_ellipsoid factor="covariance.error_covariance" kind="covariance"
        }
        """
    )
    return w


def system() -> el.System:
    return publish_cholesky | publish_covariance | el.six_dof(sys=())


if __name__ == "__main__":
    world().run(system(), simulation_rate=SIM_RATE)
