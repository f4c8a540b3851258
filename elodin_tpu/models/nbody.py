"""N-body benchmark model: all-pairs gravity at TPU scale.

Two gravity formulations over the same world:

* ``use_kernel=True``  — the ``ops.pairwise_gravity`` tiled Pallas kernel
  (f32 on TPU), the production path for 4k+ bodies.
* ``use_kernel=False`` — ``GraphQuery[TotalEdge].edge_fold``, the
  reference-compatible API (libs/nox-py/src/graph.rs:17,239), which the
  system compiler lowers to a dense masked sum when the fold is additive.

Initial conditions use a golden-angle spiral over a 2–3.5 AU annulus so the
minimum pair separation stays large enough for a 60 s step (uniform-random
placement puts some pair arbitrarily close and any integrator blows up).
"""

import numpy as np

import jax.numpy as jnp

import elodin_tpu as el
from elodin_tpu.ops.pairwise import pairwise_gravity
from elodin_tpu.system import LambdaSystem

G = 6.6743e-11
M_SUN = 1.989e30
AU = 1.496e11


def build_nbody(n_bodies: int, seed: int = 0, dtype=np.float64) -> el.World:
    rng = np.random.default_rng(seed)
    n_ast = n_bodies - 1
    k = np.arange(n_ast)
    r = (2.0 + 1.5 * (k + 0.5) / n_ast) * AU
    theta = k * (np.pi * (3.0 - np.sqrt(5.0)))  # golden angle
    pos = np.zeros((n_bodies, 3))
    pos[1:, 0] = r * np.cos(theta)
    pos[1:, 1] = r * np.sin(theta)
    vel = np.zeros((n_bodies, 3))
    v = np.sqrt(G * M_SUN / r)
    vel[1:, 0] = -v * np.sin(theta)
    vel[1:, 1] = v * np.cos(theta)
    mass = np.concatenate([[M_SUN], rng.uniform(1e15, 1e20, n_ast)])

    quat = np.zeros((n_bodies, 4))
    quat[:, 3] = 1.0
    inertia = np.concatenate(
        [np.tile(mass[:, None], (1, 3)), np.zeros((n_bodies, 3)),
         mass[:, None]],
        axis=-1,
    )
    w = el.World()
    body = el.Body(
        world_pos=el.SpatialTransform.from_array(
            np.concatenate([quat, pos], axis=-1).astype(dtype)
        ),
        world_vel=el.SpatialMotion.from_array(
            np.concatenate([np.zeros((n_bodies, 3)), vel], axis=-1).astype(dtype)
        ),
        inertia=el.SpatialInertia.from_array(inertia.astype(dtype)),
        force=el.SpatialForce.from_array(np.zeros((n_bodies, 6), dtype=dtype)),
        world_accel=el.SpatialMotion.from_array(np.zeros((n_bodies, 6), dtype=dtype)),
    )
    w.spawn_batch(body, n_bodies, name_prefix="b")
    return w


def _kernel_gravity(builder):
    ids = builder.entities_of("world_pos")
    pos = builder.gather("world_pos", ids)
    inertia = builder.gather("inertia", ids)
    force = builder.gather("force", ids)
    m = inertia[..., 6]
    acc = pairwise_gravity(pos[..., 4:], m, g=G)
    lin = force[..., 3:] + acc.astype(pos.dtype) * m[:, None]
    builder.scatter(
        "force", ids, jnp.concatenate([force[..., :3], lin], axis=-1)
    )


def build_system(time_step: float = 60.0, use_kernel: bool = True) -> el.System:
    if use_kernel:
        effector = LambdaSystem(_kernel_gravity, "pairwise_gravity_kernel")
    else:
        from elodin_tpu.entity import TotalEdge
        from elodin_tpu.system import GraphQuery, Query, system

        import jax.numpy.linalg as la

        @system
        def gravity(
            graph: GraphQuery[TotalEdge],
            query: Query[el.WorldPos, el.Inertia],
        ) -> Query[el.Force]:
            def gravity_fn(force, a_pos, a_inertia, b_pos, b_inertia):
                # grouped as (G*m) * (M*r/|r|^3): TPU "f64" is a double-f32
                # emulation whose exponent range is float32's, so the naive
                # G*m*M intermediate (~1e50 for sun-mass bodies) overflows
                # even though the resulting force (~1e16 N) is in range
                r = a_pos.linear() - b_pos.linear()
                norm = la.norm(r)
                f = (G * a_inertia.mass()) * (
                    (b_inertia.mass() / norm**3) * r
                )
                return el.Force(linear=force.force() - f)

            return graph.edge_fold(query, query, el.Force, el.Force(), gravity_fn)

        effector = gravity
    return el.six_dof(time_step=time_step, sys=effector,
                      integrator=el.Integrator.SemiImplicit)
