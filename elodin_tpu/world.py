"""World construction: struct-of-arrays component columns
(libs/nox-py/src/world.rs, world_builder.rs).

Columns are built on the host as numpy arrays while spawning, then moved to
device HBM once at build time.  After that the whole tick runs on-device; the
host only sees telemetry snapshots.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from .component import Component, ComponentType, component_type_of_value
from .entity import EntityId

DEFAULT_TIME_STEP = 1.0 / 120.0


def _name_to_id(name: str) -> str:
    """Entity display name -> snake_case id, mirroring the convert_case
    normalization at libs/nox-py/src/world_builder.rs:273-280."""
    import re

    parts = re.findall(r"[A-Za-z0-9]+", name)
    out: list[str] = []
    for p in parts:
        # split CamelCase boundaries within each token
        out.extend(
            s.lower() for s in re.findall(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z0-9]+|[A-Z]+", p)
        )
    return "_".join(out) if out else name.lower()


@dataclass
class EntityMetadata:
    entity_id: int
    name: str
    metadata: dict = field(default_factory=dict)


class Column:
    """One component's struct-of-arrays storage."""

    def __init__(self, component: Component):
        self.component = component
        self.entity_ids: list[int] = []
        self.values: list[np.ndarray] = []  # one (shape,) array per entity

    def push(self, entity_id: int, value: np.ndarray) -> None:
        ty = self.component.ty
        value = np.asarray(value)
        expected = int(np.prod(ty.shape)) if ty.shape else 1
        if value.size != expected:
            raise ValueError(
                f"component {self.component.name!r}: value size {value.size} "
                f"does not match declared shape {ty.shape}"
            )
        self.entity_ids.append(entity_id)
        self.values.append(
            value.astype(ty.dtype, copy=False).reshape(ty.shape)
        )

    def stacked(self) -> np.ndarray:
        ty = self.component.ty
        if not self.values:
            return np.zeros((0,) + ty.shape, dtype=ty.dtype)
        return np.stack(self.values, axis=0)


class WorldMeta:
    """Static metadata snapshot used by the trace-time SystemBuilder."""

    def __init__(self, builder: "WorldBuilder"):
        self.components: dict[str, Component] = {
            n: c.component for n, c in builder.columns.items()
        }
        self.comp_entities: dict[str, tuple[int, ...]] = {
            n: tuple(c.entity_ids) for n, c in builder.columns.items()
        }
        self.comp_index: dict[str, dict[int, int]] = {
            n: {e: i for i, e in enumerate(ids)}
            for n, ids in self.comp_entities.items()
        }
        self.entity_count: int = builder.entity_len
        self.entity_metadata: dict[int, EntityMetadata] = dict(
            builder.entity_metadata
        )
        self.entity_names: dict[str, int] = {
            m.name: eid for eid, m in builder.entity_metadata.items()
        }
        self._edge_cols: dict[str, list[tuple[int, int]]] = {
            n: [
                (int(v[0]), int(v[1]))
                for v in builder.columns[n].values
            ]
            for n in builder.columns
            if builder.columns[n].component.ty.shape == (2,)
            and builder.columns[n].component.ty.ty.value == "u64"
        }
        self.sim_time_step: float = builder.sim_time_step

    def edge_values(self, name: str) -> list[tuple[int, int]]:
        if name not in self._edge_cols:
            raise KeyError(f"edge component {name!r} not found")
        return self._edge_cols[name]


class WorldBuilder:
    """Mutable world under construction
    (libs/nox-py/src/world_builder.rs:123-343)."""

    def __init__(self):
        self.columns: dict[str, Column] = {}
        self.entity_len: int = 0
        self.entity_metadata: dict[int, EntityMetadata] = {}
        self.sim_time_step: float = DEFAULT_TIME_STEP
        self.recipes: dict[str, Any] = {}
        self.schematic_content: str | None = None
        self.schematic_path: str | None = None
        self.assets: dict[str, Any] = {}
        self._spawn_globals()

    # -- globals (libs/nox-py/src/world.rs:174-191) -----------------------

    def _spawn_globals(self) -> None:
        from .component import PrimitiveType

        gid = self.entity_len
        self.entity_len += 1
        self.entity_metadata[gid] = EntityMetadata(gid, "Globals")
        tick = Component("tick", ComponentType(PrimitiveType.U64, ()), {"priority": 7})
        ts = Component(
            "simulation_time_step",
            ComponentType(PrimitiveType.F64, ()),
            {"priority": 8},
        )
        self._push(gid, tick, np.uint64(0))
        self._push(gid, ts, np.float64(self.sim_time_step))

    def set_sim_time_step(self, dt: float) -> None:
        """set_globals equivalent (libs/nox-py/src/world.rs:185-191)."""
        self.sim_time_step = float(dt)
        col = self.columns["simulation_time_step"]
        col.values[0] = np.float64(dt).reshape(())

    # -- spawning ----------------------------------------------------------

    def _push(self, entity_id: int, component: Component, value) -> None:
        col = self.columns.get(component.name)
        if col is None:
            col = Column(component)
            self.columns[component.name] = col
        else:
            # merge metadata from later spawns (first explicit ty wins)
            if col.component.ty is None and component.ty is not None:
                col.component = component
            if component.metadata:
                col.component.metadata.update(component.metadata)
        col.push(entity_id, value)

    def spawn(self, spawnable, name: str | None = None, id: str | None = None) -> EntityId:
        entity_id = EntityId(self.entity_len)
        self.insert(entity_id, spawnable)
        self.entity_len += 1
        derived = None
        if name is not None and id is None:
            derived = _name_to_id(name)
        elif id is not None:
            derived = id
        if derived is not None:
            self.entity_metadata[entity_id.inner] = EntityMetadata(
                entity_id.inner, derived
            )
        return entity_id

    def spawn_batch(self, archetype, count: int, name_prefix: str | None = None) -> list[EntityId]:
        """TPU-first extension: spawn ``count`` entities at once from an
        archetype whose arrays carry a leading batch axis (or are broadcast).

        The reference can only spawn one entity per call
        (world_builder.rs:262); batching the spawn keeps million-entity world
        construction off the Python hot path."""
        arrays = archetype.arrays()
        data = archetype.component_data()
        first_id = self.entity_len
        ids = [EntityId(first_id + i) for i in range(count)]
        self.entity_len += count
        for arr, component in zip(arrays, data):
            if component.ty is None:
                value0 = np.asarray(arr)
                if value0.ndim == 1 and value0.shape == (count,):
                    # ambiguous: one (count,) vector could be per-entity
                    # scalars OR one count-long vector broadcast to all —
                    # silently guessing corrupts columns, so require an
                    # explicit ComponentType
                    raise ValueError(
                        f"spawn_batch: {component.name!r} value of shape "
                        f"({count},) is ambiguous with count={count} — "
                        "declare the component's ComponentType (or pass a "
                        f"({count}, 1) array for per-entity scalars)"
                    )
                shape = value0.shape[1:] if value0.shape[:1] == (count,) else value0.shape
                component = component._with_ty(
                    component_type_of_value(np.zeros(shape, dtype=value0.dtype))
                )
            ty = component.ty
            arr = np.asarray(arr)
            if arr.shape != (count,) + ty.shape:
                arr = np.broadcast_to(arr.reshape(ty.shape), (count,) + ty.shape)
            arr = arr.astype(ty.dtype, copy=False)
            col = self.columns.get(component.name)
            if col is None:
                col = Column(component)
                self.columns[component.name] = col
            col.entity_ids.extend(range(first_id, first_id + count))
            col.values.extend(arr)
        if name_prefix is not None:
            for i, eid in enumerate(ids):
                self.entity_metadata[int(eid)] = EntityMetadata(
                    int(eid), f"{name_prefix}{i}"
                )
        return ids

    def insert(self, entity_id: EntityId, spawnable) -> None:
        archetypes = spawnable if isinstance(spawnable, list) else [spawnable]
        for archetype in archetypes:
            arrays = archetype.arrays()
            data = archetype.component_data()
            if len(arrays) != len(data):
                raise ValueError(
                    f"archetype {archetype!r}: {len(arrays)} arrays vs "
                    f"{len(data)} components"
                )
            for arr, component in zip(arrays, data):
                if component.ty is None:
                    component = component._with_ty(component_type_of_value(arr))
                self._push(int(entity_id), component, arr)

    # -- editor/orchestration hooks ---------------------------------------

    def schematic(self, default_content: str | None = None, path: str | None = None) -> None:
        if default_content is not None:
            # Load-time validation against the typed panel vocabulary
            # (impeller2-kdl de.rs behavior): a malformed schematic fails
            # HERE with the offending node named, not at render time.
            from . import schematic as _schematic

            _schematic.load(default_content)
        self.schematic_content = default_content
        self.schematic_path = path

    def recipe(self, recipe_obj) -> None:
        name = getattr(recipe_obj, "name", repr(recipe_obj))
        self.recipes[name] = recipe_obj

    def glb(self, *args, **kwargs):  # editor asset hook; stored for the DB
        self.assets[f"glb_{len(self.assets)}"] = (args, kwargs)

    def spawn_camera(self, *args, **kwargs):
        self.assets[f"camera_{len(self.assets)}"] = (args, kwargs)

    def sensor_camera(self, entity=None, name: str = "cam", **config):
        """Register a sensor-camera config on an entity (parity:
        WorldBuilder.sensor_camera used by examples/ellipsoid and
        examples/sensor-camera — frustum/projection rendering is editor-side;
        the sim stores the config so DB consumers see the same asset)."""
        eid = int(getattr(entity, "inner", entity)) if entity is not None else None
        meta = self.entity_metadata.get(eid)
        prefix = meta.name if meta is not None else str(eid)
        self.assets[f"{prefix}.{name}"] = (
            ("sensor_camera",),
            {"entity": eid, "name": name, **config},
        )

    # -- snapshot ----------------------------------------------------------

    def snapshot(self) -> tuple[WorldMeta, dict[str, np.ndarray]]:
        meta = WorldMeta(self)
        cols = {n: c.stacked() for n, c in self.columns.items()}
        # Materialize columns at their policy dtype HERE so every consumer
        # (build/verify/diff/bench) carries loop-stable dtypes: under the
        # 'mixed' policy effector outputs come back f32, and a scan whose
        # carry entered f64 would fail to typecheck.  Per-component
        # precision= metadata overrides the global mapping (SURVEY 7e).
        from . import _config

        cols = _config.apply_float_policy(meta, cols)
        return meta, cols
