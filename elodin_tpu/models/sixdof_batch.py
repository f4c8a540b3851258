"""Flagship benchmark model: N batched 6-dof bodies in one world.

This is the workload behind BASELINE.json's north star (>=100M
entity-steps/s): rigid bodies with central gravity + body-frame thrust +
quadratic drag, integrated with the same RK4 + quaternion pipeline the
reference uses (libs/nox-py/src/six_dof.rs:161), but with the entity axis
batched in HBM — the axis the reference cannot exploit (one process per
sim, scalar entity counts)."""

from __future__ import annotations

import jax
import numpy as np

import elodin_tpu as el
from elodin_tpu.spatial import _quat_homog_mat, quat_norm_sq
from elodin_tpu.system import LambdaSystem
import jax.numpy as jnp

MU = 3.986004418e14  # Earth GM, m^3/s^2
R0 = 6.371e6


def _gravity_thrust_drag(builder):
    """Central gravity + fixed body-frame thrust + quadratic drag, written
    batched over the entity column (no vmap needed)."""
    ids = builder.entities_of("world_pos")
    pos = builder.gather("world_pos", ids)
    vel = builder.gather("world_vel", ids)
    inertia = builder.gather("inertia", ids)
    force = builder.gather("force", ids)

    r = pos[..., 4:]
    m = inertia[..., 6:7]
    # r/|r|^3 via one rsqrt: emulated-f64 sqrt+divide+pow would dominate
    inv_rn = jax.lax.rsqrt(jnp.sum(r * r, axis=-1, keepdims=True))
    grav = (-MU) * m * (inv_rn * inv_rn * inv_rn) * r

    # body-frame thrust along +x and torque along +z: rotating an axis
    # vector is just a (scaled) column of the rotation matrix, so build the
    # homogeneous matrix once instead of two quaternion sandwiches
    q = pos[..., :4]
    rot = _quat_homog_mat(q)
    inv_n2 = 1.0 / quat_norm_sq(q)
    sx = 25.0 * m[..., 0] * inv_n2[..., 0]
    thrust_world = jnp.stack(
        [rot[0][0] * sx, rot[1][0] * sx, rot[2][0] * sx], axis=-1
    )
    sz = 1e-3 * m[..., 0] * inv_n2[..., 0]
    torque_world = jnp.stack(
        [rot[0][2] * sz, rot[1][2] * sz, rot[2][2] * sz], axis=-1
    )

    v = vel[..., 3:]
    drag = -0.02 * jnp.linalg.norm(v, axis=-1, keepdims=True) * v

    lin = force[..., 3:] + grav + thrust_world + drag
    torque = force[..., :3] + torque_world
    builder.scatter(
        "force", ids, jnp.concatenate([torque, lin], axis=-1)
    )


def batched_sixdof_init(n_bodies: int, seed: int = 0):
    """The flagship model's initial conditions as plain numpy columns:
    (world_pos (N,7) quat+pos, world_vel (N,6) omega+vel, inertia (N,7)).

    Split out of build_batched_sixdof so consumers that bypass the ECS
    World (the whole-rollout Pallas kernel bench, ops/sixdof_kernel.py)
    draw the SAME body population without paying the 131k-entity spawn."""
    rng = np.random.default_rng(seed)
    alt = R0 + 400e3 + rng.uniform(-50e3, 50e3, n_bodies)
    theta = rng.uniform(0, 2 * np.pi, n_bodies)
    pos = np.stack(
        [alt * np.cos(theta), alt * np.sin(theta), rng.normal(0, 1e4, n_bodies)],
        axis=-1,
    )
    vmag = np.sqrt(MU / alt)
    vel = np.stack(
        [-vmag * np.sin(theta), vmag * np.cos(theta), np.zeros(n_bodies)],
        axis=-1,
    )
    quat = np.zeros((n_bodies, 4))
    quat[:, 3] = 1.0
    omega = rng.normal(0, 0.01, (n_bodies, 3))
    mass = rng.uniform(400.0, 600.0, n_bodies)
    inertia = np.concatenate(
        [
            mass[:, None] * np.array([1.2, 1.0, 0.8]),
            np.zeros((n_bodies, 3)),
            mass[:, None],
        ],
        axis=-1,
    )
    return (
        np.concatenate([quat, pos], axis=-1),
        np.concatenate([omega, vel], axis=-1),
        inertia,
    )


def build_batched_sixdof(n_bodies: int, seed: int = 0) -> tuple:
    """Returns (world, system) with n_bodies dispersed LEO-ish bodies.

    Column dtypes follow the DECLARED component types (f64 here, or f32
    under ``set_float_policy("f32")``) — a dtype parameter could not be
    honored, so none is offered; cast the snapshot columns for ad-hoc
    f32 runs (bench.py does exactly this)."""
    w = el.World()
    world_pos, world_vel, inertia = batched_sixdof_init(n_bodies, seed)
    n_bodies = world_pos.shape[0]

    body = el.Body(
        world_pos=el.SpatialTransform.from_array(world_pos),
        world_vel=el.SpatialMotion.from_array(world_vel),
        inertia=el.SpatialInertia.from_array(inertia),
        force=el.SpatialForce.from_array(np.zeros((n_bodies, 6))),
        world_accel=el.SpatialMotion.from_array(np.zeros((n_bodies, 6))),
    )
    w.spawn_batch(body, n_bodies, name_prefix="b")

    effector = LambdaSystem(_gravity_thrust_drag, "gravity_thrust_drag")
    system = el.six_dof(time_step=1.0 / 120.0, sys=effector,
                        integrator=el.Integrator.Rk4)
    return w, system
