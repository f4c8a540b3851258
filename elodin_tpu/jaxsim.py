"""Pure-JAX simulation handle: the whole world step as one jitted function.

Re-design of the reference's ``World.to_jax``/``JaxSim``
(libs/nox-py/src/world_builder.rs:1492,1765; python/elodin/jaxsim.py).  The
reference steps with a Python loop and reorders outputs on the host every
step; here the state is a dict pytree, stepping uses ``lax.fori_loop`` inside
one jit so ``sim.step(n)`` costs a single device dispatch, and the whole
object is a registered pytree so ``jax.vmap``/``jax.jit`` can batch entire
simulations (the Monte Carlo axis).  Also fixes the reference's
``set_state`` bug where the ``.at[].set()`` result was discarded
(python/elodin/jaxsim.py:207).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class JaxSim:
    def __init__(self, step_fn, state: dict, entity_dict: dict,
                 component_entity_dict: dict, tick_name: str = "tick"):
        self.py_sim = step_fn  # dict -> dict, one tick (no tick increment)
        self.state = {k: jnp.asarray(v) for k, v in state.items()}
        self.entity_dict = dict(entity_dict)
        self.component_entity_dict = dict(component_entity_dict)
        self.tick_name = tick_name if tick_name in self.state else None
        self._tick_steps = 0

    # -- stepping ----------------------------------------------------------

    def _one(self, state):
        if self.tick_name is not None:
            state = dict(state)
            state[self.tick_name] = state[self.tick_name] + 1
        return self.py_sim(state)

    def step(self, max_steps: int = 1) -> None:
        if max_steps == 1:
            self.state = self._one(self.state)
        else:
            self.state = jax.lax.fori_loop(
                0, max_steps, lambda _i, s: self._one(s), self.state
            )
        self._tick_steps += max_steps

    # -- state access ------------------------------------------------------

    def _entity_row(self, component_name: str, entity_name: str) -> int:
        try:
            eid = self.entity_dict[entity_name]
        except KeyError:
            raise Exception(f"Entity {entity_name} not found in world") from None
        try:
            ids = self.component_entity_dict[component_name]
        except KeyError:
            raise Exception(
                f"Component {component_name} not found in world"
            ) from None
        try:
            return ids.index(eid)
        except ValueError:
            raise Exception(
                f"Entity {entity_name} not found in component {component_name}"
            ) from None

    def get_state(self, component_name: str | None = None,
                  entity_name: str | None = None):
        if component_name is None:
            return self.state
        if entity_name is None:
            return self.state[component_name]
        row = self._entity_row(component_name, entity_name)
        return self.state[component_name][row]

    def set_state(self, component_name: str, entity_name: str, value) -> None:
        if component_name is None or entity_name is None:
            raise Exception("Component and entity name must be provided")
        row = self._entity_row(component_name, entity_name)
        col = self.state[component_name]
        value = jnp.asarray(value, dtype=col.dtype)
        if col[row].shape != value.shape:
            raise Exception(
                f"Value shape: {value.shape} does not match component: "
                f"{component_name}, entity: {entity_name} state shape: "
                f"{col[row].shape}"
            )
        self.state[component_name] = col.at[row].set(value)

    def get_tick_count(self) -> int:
        # derive from the tick column when the world has one: the host
        # counter can't survive pytree round-trips (jit/vmap unflatten
        # rebuilds the object, and tick count must NOT live in aux_data
        # or sims at different ticks would have unequal treedefs)
        if self.tick_name is not None:
            return int(jnp.max(self.state[self.tick_name]))
        return self._tick_steps

    def print_dictionary(self) -> None:
        for comp, ids in self.component_entity_dict.items():
            parts = []
            for name, eid in self.entity_dict.items():
                if eid in ids:
                    shape = self.state[comp][ids.index(eid)].shape
                    parts.append(f"{name} (shape: {shape})")
            print(f"{comp}: {', '.join(parts)}")

    # -- pytree ------------------------------------------------------------

    def sim_flatten(self):
        keys = sorted(self.state)
        children = [self.state[k] for k in keys]
        aux = (
            self.py_sim,
            tuple(keys),
            tuple(sorted(self.entity_dict.items())),
            tuple((k, tuple(v)) for k, v in sorted(self.component_entity_dict.items())),
            self.tick_name,
        )
        return children, aux

    @classmethod
    def sim_unflatten(cls, aux, children):
        py_sim, keys, ents, comp_ents, tick_name = aux
        obj = object.__new__(cls)
        obj.py_sim = py_sim
        obj.state = dict(zip(keys, children))
        obj.entity_dict = dict(ents)
        obj.component_entity_dict = {k: list(v) for k, v in comp_ents}
        obj.tick_name = tick_name
        obj._tick_steps = 0  # host counter; get_tick_count uses the column
        return obj


jax.tree_util.register_pytree_node(
    JaxSim, JaxSim.sim_flatten, JaxSim.sim_unflatten
)
