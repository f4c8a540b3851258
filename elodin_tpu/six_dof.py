"""Rigid-body six-dof pipeline and integrators.

Fused TPU re-design of the reference factory
``clear_forces |> effectors |> calc_accel |> integrator``
(libs/nox-py/src/six_dof.rs:161-203) and its integrators
(src/integrator/semi_implicit.rs:17-62, src/integrator/rk4.rs:53-130).

Unlike the reference — which composes per-entity expressions through a Rust
tracer and vmaps each map separately — the integrator math here is written
directly against the batched ``(n, k)`` component columns, so XLA sees one
flat elementwise graph per tick and fuses it into a couple of kernels.
The RK4 quaternion handling matches the reference exactly: each stage applies
``u = u0 + (dt*factor) * du`` through the nonlinear SpatialTransform ⊕
SpatialMotion add (normalize after a first-order world-frame quaternion
increment), and the final update folds the Runge-Kutta-weighted twist through
a single ⊕.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from .spatial import sixdof_accel, stf_add_motion
from .system import LambdaSystem, Pipe, System, SystemBuilder, as_system

WORLD_POS = "world_pos"
WORLD_VEL = "world_vel"
WORLD_ACCEL = "world_accel"
FORCE = "force"
INERTIA = "inertia"


class Integrator(enum.Enum):
    Rk4 = "rk4"
    SemiImplicit = "semi-implicit"


def _rows(builder: SystemBuilder, name: str, entity_ids):
    return builder.rows_of(name, entity_ids)


def _gather(builder: SystemBuilder, name: str, entity_ids):
    return builder.gather(name, entity_ids)


def _scatter(builder: SystemBuilder, name: str, entity_ids, value):
    builder.scatter(name, entity_ids, value)


def _intersection(builder: SystemBuilder, names):
    sets = [set(builder.entities_of(n)) for n in names]
    out = sets[0]
    for s in sets[1:]:
        out &= s
    ids = sorted(out)
    if not ids:
        raise RuntimeError(f"six_dof: no entity has all of {names}")
    return ids


def clear_forces(builder: SystemBuilder) -> None:
    """Zero the force column (libs/nox-py/src/six_dof.rs:148-150)."""
    col = builder.column(FORCE)
    builder.cols[FORCE] = jnp.zeros_like(col)


def calc_accel(builder: SystemBuilder) -> None:
    """world_accel = R(q) * ((R(q)^-1 force) / inertia)
    (libs/nox-py/src/six_dof.rs:137-146)."""
    ids = _intersection(builder, [FORCE, INERTIA, WORLD_POS])
    force = _gather(builder, FORCE, ids)
    inertia = _gather(builder, INERTIA, ids)
    pos = _gather(builder, WORLD_POS, ids)
    _scatter(builder, WORLD_ACCEL, ids, sixdof_accel(force, inertia, pos))


class _SixDofSystem(System):
    def __init__(self, time_step, effectors, integrator: Integrator):
        self.time_step = time_step
        self._pipe = Pipe(
            LambdaSystem(clear_forces, "clear_forces"),
            as_system(effectors),
            LambdaSystem(calc_accel, "calc_accel"),
        )
        self.integrator = integrator

    def _dt(self, builder: SystemBuilder):
        if self.time_step is not None:
            return self.time_step
        return builder.column("simulation_time_step")[0]

    def call(self, builder: SystemBuilder) -> None:
        if self.integrator == Integrator.SemiImplicit:
            self._run_pipe(builder)
            self._semi_implicit(builder)
        else:
            self._rk4(builder)

    def _run_pipe(self, builder: SystemBuilder) -> None:
        """Run clear_forces |> effectors |> calc_accel, in f32 under the
        'mixed' float policy: inputs are downcast at the pipe boundary, the
        f64 integrator state and any column the pipe left untouched are
        restored afterwards, and the f32 accel upcasts in u' = u + dt*du."""
        from . import _config

        dt32 = _config.effector_compute_dtype()
        if dt32 is None:
            self._pipe.call(builder)
            return
        # per-component policy override: precision="f64" components are
        # exempt from the mixed-policy downcast (SURVEY §7e)
        comps = getattr(builder.world, "components", {})
        keep64 = {
            k for k, c in comps.items()
            if c.metadata.get("precision") == "f64"
        }
        saved = dict(builder.cols)
        cast = {}
        for k, v in saved.items():
            arr = jnp.asarray(v)
            cast[k] = (
                arr.astype(dt32)
                if arr.dtype == jnp.float64 and k not in keep64
                else arr
            )
        builder.cols = dict(cast)
        self._pipe.call(builder)
        out = builder.cols
        for k, v in saved.items():
            # restore f64 for the integrator state and for every column the
            # pipe only read (identity check) — effector OUTPUTS stay f32
            if k in (WORLD_POS, WORLD_VEL) or out.get(k) is cast.get(k):
                out[k] = v
        for k in keep64:
            # a declared-f64 column the pipe WROTE keeps its new value but
            # must come back up to f64 (its f32 operands may have demoted it)
            if k in out and out[k].dtype != jnp.float64:
                out[k] = out[k].astype(jnp.float64)

    def _semi_implicit(self, builder: SystemBuilder) -> None:
        """v' = v + dt*a; x' = x ⊕ dt*v'  (symplectic Euler,
        libs/nox-py/src/integrator/semi_implicit.rs:17-32)."""
        dt = self._dt(builder)
        v_ids = _intersection(builder, [WORLD_VEL, WORLD_ACCEL])
        vel = _gather(builder, WORLD_VEL, v_ids)
        acc = _gather(builder, WORLD_ACCEL, v_ids)
        vel = vel + dt * acc
        _scatter(builder, WORLD_VEL, v_ids, vel)
        x_ids = _intersection(builder, [WORLD_POS, WORLD_VEL])
        pos = _gather(builder, WORLD_POS, x_ids)
        vel = _gather(builder, WORLD_VEL, x_ids)
        _scatter(builder, WORLD_POS, x_ids, stf_add_motion(pos, dt * vel))

    def _rk4(self, builder: SystemBuilder) -> None:
        """Classic RK4 over U=(pos,vel), DU=(vel,accel)
        (libs/nox-py/src/integrator/rk4.rs:79-126).  Stage sequence:

        for factor in (0, 1/2, 1/2, 1):
            (pos, vel) := u0 ⊕ dt*factor*du ; pipe() ; k_i := (vel, accel)
        u := u0 ⊕ (dt/6)*(k1 + 2 k2 + 2 k3 + k4)

        force/world_accel columns keep their last-stage (k4) values, exactly
        like the reference."""
        dt = self._dt(builder)
        u_ids = _intersection(builder, [WORLD_POS, WORLD_VEL])
        du_ids = _intersection(builder, [WORLD_VEL, WORLD_ACCEL])

        pos0 = _gather(builder, WORLD_POS, u_ids)
        vel0 = _gather(builder, WORLD_VEL, u_ids)

        def set_u(pos, vel):
            _scatter(builder, WORLD_POS, u_ids, pos)
            _scatter(builder, WORLD_VEL, u_ids, vel)

        if du_ids != u_ids:
            # entities with pos+vel but no world_accel (kinematic movers)
            # integrate with da = 0, matching the semi-implicit path where
            # they simply keep their velocity; the accel rows scatter onto
            # u rows by entity id
            pos_map = {e: i for i, e in enumerate(du_ids)}
            rows = [pos_map.get(e, -1) for e in u_ids]
            du_sel = jnp.asarray(
                np.array([max(r, 0) for r in rows], dtype=np.int32)
            )
            du_mask = jnp.asarray(np.array([r >= 0 for r in rows]))[:, None]
        else:
            du_sel = du_mask = None

        def read_du():
            # velocity exists for every u entity by construction (u = pos
            # AND vel); only accel needs masked alignment
            dv = _gather(builder, WORLD_VEL, u_ids)
            da = _gather(builder, WORLD_ACCEL, du_ids)
            if du_mask is not None:
                da = jnp.where(du_mask, da[du_sel], 0.0)
            return dv, da

        def stage(factor):
            # u := u0 + dt*factor*du(current)
            if factor == 0.0:
                # u0 ⊕ 0 is exactly [normalize(q), lin] (quat_mul with a
                # zero motion vanishes identically) — skip the dead ops
                # rather than trusting XLA to fold them
                q = pos0[..., :4]
                from .spatial import quat_normalize

                set_u(
                    jnp.concatenate(
                        [quat_normalize(q), pos0[..., 4:]], axis=-1
                    ),
                    vel0,
                )
                self._run_pipe(builder)
                return read_du()
            dv, da = read_du()
            f = dt * factor
            set_u(stf_add_motion(pos0, f * dv), vel0 + f * da)
            self._run_pipe(builder)
            return read_du()

        k1 = stage(0.0)
        k2 = stage(0.5)
        k3 = stage(0.5)
        k4 = stage(1.0)

        dv = (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]) * (1.0 / 6.0)
        da = (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]) * (1.0 / 6.0)
        set_u(stf_add_motion(pos0, dt * dv), vel0 + dt * da)


def six_dof(time_step=None, sys=None, integrator=Integrator.Rk4) -> System:
    """Six-dof system factory (libs/nox-py/src/lib.rs:107-126)."""
    if isinstance(integrator, str):
        integrator = Integrator(integrator)
    return _SixDofSystem(time_step, sys, integrator)


def increment_sim_tick(builder: SystemBuilder) -> None:
    """Always-piped tick counter (libs/nox-py/src/globals.rs:42-44)."""
    builder.cols["tick"] = builder.cols["tick"] + 1


increment_sim_tick_system = LambdaSystem(increment_sim_tick, "increment_sim_tick")
