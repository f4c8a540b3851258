"""Entities, edges, archetypes (libs/nox-py/src/entity.rs, graph.rs,
python/elodin/__init__.py:563-670)."""

from __future__ import annotations

import re
import typing

import jax
import numpy as np

from .component import Component, component_type_of_value

_snake_case_pattern = re.compile(r"(?<!^)(?=[A-Z])")


def to_snake_case(name: str) -> str:
    return _snake_case_pattern.sub("_", name).lower()


class EntityId:
    """Opaque entity handle (libs/nox-py/src/entity.rs:5-26)."""

    __slots__ = ("inner",)

    def __init__(self, id: int):
        self.inner = int(id)

    def __index__(self):
        return self.inner

    def __int__(self):
        return self.inner

    def __eq__(self, other):
        if isinstance(other, EntityId):
            return self.inner == other.inner
        if isinstance(other, int):
            return self.inner == other
        return NotImplemented

    def __hash__(self):
        return hash(self.inner)

    def __str__(self):
        return str(self.inner)

    def __repr__(self):
        return f"EntityId({self.inner})"


class Edge:
    """Directed entity-pair component value (libs/nox-py/src/graph.rs:22-41).
    Stored as a u64[2] column; registered as a pytree whose single leaf is
    that 2-vector so `Archetype.arrays()` picks it up."""

    __slots__ = ("from_", "to")

    def __init__(self, from_, to):
        self.from_ = int(from_)
        self.to = int(to)

    def flatten(self):
        return (np.array([self.from_, self.to], dtype=np.uint64),), None

    @staticmethod
    def unflatten(_aux, children):
        arr = np.asarray(children[0])
        return Edge(int(arr[0]), int(arr[1]))

    def reverse(self) -> "Edge":
        return Edge(self.to, self.from_)

    def __repr__(self):
        return f"Edge({self.from_} -> {self.to})"


jax.tree_util.register_pytree_node(Edge, Edge.flatten, Edge.unflatten)

# default component descriptor so `Annotated[Edge, Component("name")]` (no
# explicit type) resolves shape/dtype from the origin class, mirroring
# PyEdge's classattr metadata (libs/nox-py/src/graph.rs)
from .component import ComponentType as _ComponentType  # noqa: E402

Edge.metadata = Component("edge", _ComponentType.Edge)
Edge.__metadata__ = (Edge.metadata,)


class RevEdge:
    """Marker: traverse the edge component reversed
    (python/elodin/__init__.py:411)."""


class TotalEdge:
    """Marker: a complete digraph over all entities
    (libs/nox-py/src/graph.rs:147-175)."""


class Archetype(typing.Protocol):
    """Bundle of components spawned together
    (python/elodin/__init__.py:563-576)."""

    @classmethod
    def archetype_name(cls) -> str:
        return to_snake_case(cls.__name__)

    def component_data(self) -> list[Component]:
        out = []
        hints = typing.get_type_hints(type(self), include_extras=True)
        for name, tp in hints.items():
            data = Component.of(tp)
            if data.ty is None:
                data = data._with_ty(component_type_of_value(getattr(self, name)))
            out.append(data)
        return out

    def arrays(self) -> list[np.ndarray]:
        # iterate the TYPE HINTS (the same order component_data uses), not
        # __dict__: an extra instance attribute (e.g. a cache set in
        # __post_init__) would shift the zip pairing in spawn/spawn_batch
        # and silently write values into the wrong columns
        hints = typing.get_type_hints(type(self), include_extras=True)
        return [
            np.asarray(jax.tree_util.tree_flatten(getattr(self, name))[0][0])
            for name in hints
        ]


class C:
    """Ad-hoc component bundle (python/elodin/__init__.py:643-660)."""

    def __init__(self, tys, values):
        if isinstance(tys, tuple) and isinstance(values, tuple):
            self.data = [Component.of(ty) for ty in tys]
            self.bufs = [
                np.asarray(jax.tree_util.tree_flatten(v)[0][0]) for v in values
            ]
        else:
            self.data = [Component.of(tys)]
            self.bufs = [np.asarray(jax.tree_util.tree_flatten(values)[0][0])]

    @classmethod
    def archetype_name(cls) -> str:
        return to_snake_case(cls.__name__)

    def arrays(self):
        return self.bufs

    def component_data(self):
        return self.data
