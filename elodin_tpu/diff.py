"""Differentiable simulation: reverse-mode gradients through whole rollouts.

Beyond-reference capability.  The reference executes its tick program through
cranelift JIT or per-tick JAX dispatch with host round-trips
(libs/nox-py/src/cranelift_exec.rs:54-308, jax_exec.rs:118-234) and has no
adjoint path at all — the gradient of a trajectory with respect to initial
conditions, physical parameters, or controller gains simply does not exist
there.  Here the whole rollout is one ``lax.scan``, so ``jax.grad``
differentiates through every tick on-device, and long horizons use segmented
rematerialization (``jax.checkpoint``) to keep backward-pass memory at
O(T/k + k) instead of O(T).

Typical use::

    roll = rollout(world, system, ticks=600, outputs=("world_pos",))
    def loss(overrides):
        final = roll(overrides)
        return jnp.sum((final["world_pos"][ROW, 4:] - target) ** 2)
    g = jax.grad(loss)({"world_vel": v0_column})

The returned function is pure: it never mutates the world, and every call
starts from the world's snapshot with ``overrides`` applied on top, so it can
be freely jitted, vmapped (e.g. a batch of candidate parameters), or wrapped
in an optax training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .system import build_step


def _build_step(world, system):
    meta, cols = world.snapshot()
    step = build_step(meta, system)
    return step, meta, {k: jnp.asarray(v) for k, v in cols.items()}


def rollout(world, system, ticks: int, *, outputs=None, record: bool = False,
            remat_segments: int | None = None, simulation_rate: float | None = None):
    """Build a pure, differentiable function ``overrides -> state``.

    ``overrides`` is a dict of component-name -> column value merged over the
    world snapshot before stepping (the differentiable inputs).  With
    ``record=False`` the function returns the final state (restricted to
    ``outputs`` when given); with ``record=True`` it returns the per-tick
    trajectory of ``outputs`` stacked on a leading time axis.

    ``remat_segments=k`` splits the rollout into k checkpointed segments
    (``jax.checkpoint`` around an inner scan): the backward pass stores only
    k segment-boundary states and re-runs each segment's forward when its
    adjoint is needed — the standard sqrt-T memory/compute trade.  ``ticks``
    must be divisible by ``k``.
    """
    if simulation_rate is not None:
        world.set_sim_time_step(1.0 / simulation_rate)
    step, meta, cols0 = _build_step(world, system)
    if outputs is not None:
        missing = [k for k in outputs if k not in cols0]
        if missing:
            raise KeyError(f"unknown output components: {missing}")
    if record and outputs is None:
        raise ValueError("record=True requires explicit outputs=(...)")
    if remat_segments is not None:
        if remat_segments <= 0 or ticks % remat_segments:
            raise ValueError(
                f"ticks ({ticks}) must be divisible by remat_segments "
                f"({remat_segments})"
            )

    def body(state, _):
        out = step(state)
        ys = {k: out[k] for k in outputs} if record else None
        return out, ys

    def fn(overrides=None):
        state = dict(cols0)
        if overrides:
            for k, v in overrides.items():
                if k not in state:
                    raise KeyError(f"unknown component {k!r}")
                state[k] = jnp.asarray(v, dtype=state[k].dtype).reshape(
                    state[k].shape
                )
        if remat_segments is None:
            final, ys = jax.lax.scan(body, state, None, length=ticks)
        else:
            chunk = ticks // remat_segments

            @jax.checkpoint
            def segment(s):
                return jax.lax.scan(body, s, None, length=chunk)

            final, ys = jax.lax.scan(
                lambda s, _: segment(s), state, None, length=remat_segments
            )
            if record:
                # (segments, chunk, ...) -> (ticks, ...)
                ys = jax.tree_util.tree_map(
                    lambda a: a.reshape((ticks,) + a.shape[2:]), ys
                )
        if record:
            return ys
        if outputs is not None:
            return {k: final[k] for k in outputs}
        return final

    fn.meta = meta
    fn.initial_state = cols0
    return fn


def entity_row(meta, component: str, entity_name: str) -> int:
    """Row index of ``entity_name`` inside ``component``'s column — for
    building override columns / reading per-entity outputs."""
    try:
        eid = meta.entity_names[entity_name]
    except KeyError:
        raise KeyError(f"entity {entity_name!r} not found") from None
    try:
        return meta.comp_index[component][eid]
    except KeyError:
        raise KeyError(
            f"entity {entity_name!r} has no component {component!r}"
        ) from None


def set_entity(column, meta, component: str, entity_name: str, value):
    """Differentiable per-entity override: ``column.at[row].set(value)``."""
    row = entity_row(meta, component, entity_name)
    value = jnp.asarray(value, dtype=column.dtype)
    return column.at[row].set(value.reshape(column.shape[1:]))
