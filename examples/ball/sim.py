"""Bouncing ball in ENU with wind + drag (parity target:
reference examples/ball/sim.py — gravity, quadratic drag against a
seed-sampled wind field, lax.cond ground bounce)."""

import typing
from dataclasses import field

import elodin as el
import jax
from jax import numpy as jnp
from jax import random
from jax.numpy import linalg as la

SIM_TIME_STEP = 1.0 / 120.0
BALL_RADIUS = 0.2
BOUNCINESS = 0.85

Wind = typing.Annotated[
    jax.Array,
    el.Component(
        "wind",
        el.ComponentType(el.PrimitiveType.F64, (3,)),
        metadata={"element_names": "x,y,z"},
    ),
]


@el.dataclass
class WindData(el.Archetype):
    seed: el.Seed = field(default_factory=lambda: jnp.int64(0))
    wind: Wind = field(default_factory=lambda: jnp.array([0.0, 0.0, 0.0]))


def world(seed: int = 0) -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(world_pos=el.SpatialTransform(linear=jnp.array([0.0, 0.0, 6.0]))),
            WindData(seed=jnp.int64(seed)),
        ],
        name="ball",
    )
    w.schematic(
        """
        coordinate frame=ENU
        viewport name=Viewport pos="(0,0,0,0, 8,2,4)" look_at="(0,0,0,0, 0,0,3)"
        object_3d frame="ENU" ball.world_pos { sphere radius=0.2 { color orange } }
        """,
        "ball.kdl",
    )
    return w


@el.map
def gravity(f: el.Force, inertia: el.Inertia) -> el.Force:
    return f + el.SpatialForce(linear=jnp.array([0.0, 0.0, -9.81]) * inertia.mass())


@el.map
def bounce(p: el.WorldPos, v: el.WorldVel) -> el.WorldVel:
    return jax.lax.cond(
        jax.lax.max(p.linear()[2], v.linear()[2]) < 0.0,
        lambda _: el.SpatialMotion(
            linear=v.linear() * jnp.array([1.0, 1.0, -1.0]) * BOUNCINESS
        ),
        lambda _: v,
        operand=None,
    )


@el.map
def sample_wind(s: el.Seed, _w: Wind) -> Wind:
    return random.normal(random.key(s), shape=(3,))


@el.map
def apply_drag(w: Wind, v: el.WorldVel, f: el.Force) -> el.Force:
    rel = w - v.linear()
    cd = 0.5
    rho = 1.225
    speed = la.norm(rel)
    area = 2 * 3.1415 * BALL_RADIUS**2
    # speed * rel == speed^2 * rel_hat with no division: rel = 0 (wind
    # matching velocity exactly) stays 0 instead of 0/0 = NaN poisoning
    # the state; torque passes through (gravity may have contributed)
    drag_force = 0.5 * cd * rho * area * speed * rel
    return f + el.SpatialForce(linear=drag_force)


def system() -> el.System:
    effectors = gravity | apply_drag
    return sample_wind | bounce | el.six_dof(sys=effectors)
