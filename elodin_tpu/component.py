"""Component metadata: names, primitive types, shapes, user metadata.

Mirrors the reference's pyo3 ``Component``/``ComponentType``/``PrimitiveType``
surface (libs/nox-py/src/component.rs) in pure Python.  Component identity is
the FNV-1a hash of the dotted name (libs/impeller2/src/types.rs:36) so the
telemetry plane stays wire-compatible with impeller2.
"""

from __future__ import annotations

import enum
import typing
from typing import Any

import numpy as np


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit hash (matches impeller2 ComponentId,
    libs/impeller2/src/types.rs:36)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class ComponentId:
    __slots__ = ("value",)

    def __init__(self, name_or_value):
        if isinstance(name_or_value, str):
            self.value = fnv1a_64(name_or_value.encode())
        else:
            self.value = int(name_or_value)

    def __eq__(self, other):
        return isinstance(other, ComponentId) and self.value == other.value

    def __hash__(self):
        return hash(self.value)

    def __repr__(self):
        return f"ComponentId({self.value:#x})"


class PrimitiveType(enum.Enum):
    F64 = "f64"
    F32 = "f32"
    U64 = "u64"
    U32 = "u32"
    U16 = "u16"
    U8 = "u8"
    I64 = "i64"
    I32 = "i32"
    I16 = "i16"
    I8 = "i8"
    Bool = "bool"

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(
            {
                PrimitiveType.F64: np.float64,
                PrimitiveType.F32: np.float32,
                PrimitiveType.U64: np.uint64,
                PrimitiveType.U32: np.uint32,
                PrimitiveType.U16: np.uint16,
                PrimitiveType.U8: np.uint8,
                PrimitiveType.I64: np.int64,
                PrimitiveType.I32: np.int32,
                PrimitiveType.I16: np.int16,
                PrimitiveType.I8: np.int8,
                PrimitiveType.Bool: np.bool_,
            }[self]
        )

    @property
    def size(self) -> int:
        return self.dtype.itemsize


class ComponentType:
    """Primitive type + shape of one component instance
    (libs/nox-py/src/component.rs:170-249)."""

    def __init__(self, ty: PrimitiveType, shape=()):
        self.ty = ty
        self.shape = tuple(int(s) for s in shape)

    def __repr__(self):
        return f"ComponentType({self.ty}, {self.shape})"

    def __eq__(self, other):
        return (
            isinstance(other, ComponentType)
            and self.ty == other.ty
            and self.shape == other.shape
        )

    @property
    def dtype(self) -> np.dtype:
        return self.ty.dtype

    @property
    def size(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n * self.ty.size


# Class attributes matching the reference's classattrs.
ComponentType.F64 = ComponentType(PrimitiveType.F64, ())
ComponentType.F32 = ComponentType(PrimitiveType.F32, ())
ComponentType.U64 = ComponentType(PrimitiveType.U64, ())
ComponentType.Edge = ComponentType(PrimitiveType.U64, (2,))
ComponentType.Quaternion = ComponentType(PrimitiveType.F64, (4,))
ComponentType.SpatialPosF64 = ComponentType(PrimitiveType.F64, (7,))
ComponentType.SpatialMotionF64 = ComponentType(PrimitiveType.F64, (6,))


class Component:
    """Component descriptor used inside ``typing.Annotated`` metadata
    (libs/nox-py/src/component.rs:42-166)."""

    def __init__(self, name: str, ty: ComponentType | None = None,
                 metadata: dict | None = None, precision: str | None = None):
        self.name = name
        self.ty = ty
        self.metadata = {
            k: (v if isinstance(v, str) else _stringify(v))
            for k, v in (metadata or {}).items()
        }
        if precision is not None:
            # per-component float policy override (SURVEY §7e): this column
            # keeps the declared precision under EVERY global float policy
            # (e.g. precision="f64" survives set_float_policy("mixed"))
            if precision not in ("f64", "f32"):
                raise ValueError("precision must be 'f64' or 'f32'")
            self.metadata["precision"] = precision

    def __repr__(self):
        return f"Component({self.name!r}, {self.ty!r})"

    def component_id(self) -> ComponentId:
        return ComponentId(self.name)

    def _with_ty(self, ty: ComponentType) -> "Component":
        c = Component(self.name, ty)
        c.metadata = dict(self.metadata)
        return c

    # -- static helpers matching the reference API ------------------------

    @staticmethod
    def of(component: Any) -> "Component":
        data = _metadata_component(component)
        if data is None:
            raise ValueError(f"component metadata not found for {component!r}")
        if data.ty is None:
            origin = getattr(component, "__origin__", None)
            base = _metadata_component(origin) if origin is not None else None
            if base is not None and base.ty is not None:
                data = data._with_ty(base.ty)
        if data.ty is None:
            raise ValueError(f"component type not found for {component!r}")
        return data

    @staticmethod
    def id(component: Any) -> str:
        return Component.name(component)

    @staticmethod
    def name(component: Any) -> str:
        return Component.of(component).name

    @staticmethod
    def index(component: Any) -> "ShapeIndexer":
        data = Component.of(component)
        shape = list(data.ty.shape)
        strides = []
        acc = 1
        for s in reversed(shape):
            strides.append(acc)
            acc *= s
        strides = list(reversed(strides))
        return ShapeIndexer(data.name, shape, [], strides)


def _stringify(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))  # integral floats stringify as '2', not '2.0'
    return str(v)


def _metadata_component(tp: Any):
    """Extract a Component from ``tp.__metadata__`` if present."""
    meta = getattr(tp, "__metadata__", None)
    if meta is None:
        return None
    for m in meta:
        if isinstance(m, Component):
            return m
    # classattr-style tuple from spatial classes
    if len(meta) > 0 and isinstance(meta[0], Component):
        return meta[0]
    return None


class ShapeIndexer:
    """Flat-index helper for a component's element grid
    (libs/nox-py/src/component.rs:322-419)."""

    def __init__(self, component_name: str, shape, index, strides):
        self.component_name = component_name
        self.shape = list(shape)
        self.index = list(index)
        self.strides = list(strides)
        if self.shape:
            rest = self.shape[1:]
            self.items = [
                ShapeIndexer(component_name, rest, [i] + self.index, strides)
                for i in range(self.shape[0])
            ]
        else:
            self.items = []

    def indexes(self):
        if not self.shape:
            return [
                sum(i * s for i, s in zip(self.index, reversed(self.strides)))
            ]
        out = []
        for item in self.items:
            out.extend(item.indexes())
        return out

    def __getitem__(self, index):
        return self.items[index]


def component_type_of_value(value: np.ndarray) -> ComponentType:
    """Infer a ComponentType from a concrete value (used by the ``C`` helper
    and archetype type hints that omit an explicit type)."""
    value = np.asarray(value)
    prim = {
        np.dtype(np.float64): PrimitiveType.F64,
        np.dtype(np.float32): PrimitiveType.F32,
        np.dtype(np.uint64): PrimitiveType.U64,
        np.dtype(np.int64): PrimitiveType.I64,
        np.dtype(np.int32): PrimitiveType.I32,
        np.dtype(np.bool_): PrimitiveType.Bool,
    }.get(value.dtype, PrimitiveType.F64)
    return ComponentType(prim, value.shape)


def annotated_origin(tp: Any):
    """The underlying class of an Annotated component alias (or the type
    itself)."""
    return getattr(tp, "__origin__", tp)


def get_type_args(tp: Any):
    return typing.get_args(tp)
