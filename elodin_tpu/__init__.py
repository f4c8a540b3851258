"""elodin-tpu: a TPU-native physics simulation framework.

Source-compatible with the Elodin SDK surface
(/root/reference/libs/nox-py/python/elodin/__init__.py) but built from
scratch on JAX/XLA: component columns live in device HBM, the whole system
pipeline compiles to one XLA program with ``lax.scan`` over ticks, and Monte
Carlo batches via ``vmap``/``shard_map`` over the device mesh.
"""

from __future__ import annotations

from dataclasses import dataclass  # noqa: F401  (el.dataclass)
from typing import Annotated  # noqa: F401  (el.Annotated)

import jax

from . import _config  # noqa: F401  (x64 on import, like the reference)
from ._config import set_float_policy  # noqa: F401
from .component import (  # noqa: F401
    Component,
    ComponentId,
    ComponentType,
    PrimitiveType,
    ShapeIndexer,
)
from .entity import (  # noqa: F401
    Archetype,
    C,
    Edge,
    EntityId,
    RevEdge,
    TotalEdge,
)
from .spatial import (  # noqa: F401
    MRP,
    Quaternion,
    SpatialForce,
    SpatialInertia,
    SpatialMotion,
    SpatialTransform,
)
from .system import (  # noqa: F401
    FnSystem,
    GraphQuery,
    Pipe,
    Query,
    RateGroup,
    System,
    SystemBuilder,
    every,
    map,
    map_seq,
    system,
)
from .six_dof import Integrator, six_dof  # noqa: F401
from .execimpl import Exec  # noqa: F401
from .step_context import StepContext  # noqa: F401
from .world import DEFAULT_TIME_STEP, WorldBuilder  # noqa: F401
from .jaxsim import JaxSim  # noqa: F401
from .diff import rollout  # noqa: F401
from .ops.precise import const_pin  # noqa: F401
from . import linalg as linalg  # noqa: F401
from . import monte_carlo as monte_carlo  # noqa: F401
from . import s10 as s10  # noqa: F401

__version__ = "0.1.0"


def skew(arr):
    """Skew-symmetric matrix (libs/nox-py/src/linalg.rs)."""
    from . import spatial as _spatial

    return _spatial.skew(jax.numpy.asarray(arr))


# ---------------------------------------------------------------------------
# Built-in component aliases (python/elodin/__init__.py:594-640)
# ---------------------------------------------------------------------------

WorldPos = Annotated[
    SpatialTransform,
    Component(
        "world_pos",
        ComponentType.SpatialPosF64,
        metadata={"element_names": "q0,q1,q2,q3,x,y,z", "priority": 5},
    ),
]
WorldVel = Annotated[
    SpatialMotion,
    Component(
        "world_vel",
        ComponentType.SpatialMotionF64,
        metadata={"element_names": "ωx,ωy,ωz,x,y,z", "priority": 5},
    ),
]
WorldAccel = Annotated[
    SpatialMotion,
    Component(
        "world_accel",
        ComponentType.SpatialMotionF64,
        metadata={"element_names": "αx,αy,αz,x,y,z", "priority": 5},
    ),
]
Force = Annotated[
    SpatialForce,
    Component(
        "force",
        ComponentType.SpatialMotionF64,
        metadata={"element_names": "τx,τy,τz,x,y,z", "priority": 5},
    ),
]
Inertia = Annotated[
    SpatialInertia,
    Component("inertia", ComponentType.SpatialPosF64, metadata={"priority": 5}),
]
Seed = Annotated[
    jax.Array, Component("seed", ComponentType.U64, metadata={"priority": 5})
]
SimulationTick = Annotated[
    jax.Array, Component("tick", ComponentType.U64, metadata={"priority": 7})
]
SimulationTimeStep = Annotated[
    jax.Array,
    Component("simulation_time_step", ComponentType.F64, metadata={"priority": 8}),
]
Camera = Annotated[
    jax.Array, Component("camera", ComponentType(PrimitiveType.U64, (1,)))
]


@dataclass
class Body(Archetype):
    """Standard rigid body bundle (python/elodin/__init__.py:663-669)."""

    world_pos: WorldPos = None
    world_vel: WorldVel = None
    inertia: Inertia = None
    force: Force = None
    world_accel: WorldAccel = None

    def __post_init__(self):
        if self.world_pos is None:
            self.world_pos = SpatialTransform()
        if self.world_vel is None:
            self.world_vel = SpatialMotion()
        if self.inertia is None:
            self.inertia = SpatialInertia(mass=1.0)
        if self.force is None:
            self.force = SpatialForce()
        if self.world_accel is None:
            self.world_accel = SpatialMotion()


# ---------------------------------------------------------------------------
# World
# ---------------------------------------------------------------------------


class World(WorldBuilder):
    """User-facing world (python/elodin/__init__.py:672-771)."""

    def build(
        self,
        system,
        simulation_rate: float = 120.0,
        generate_real_time: bool = False,
        telemetry_rate: float | None = None,
        default_playback_speed: float = 1.0,
        max_ticks: int | None = None,
        optimize: bool = False,
        db_path: str | None = None,
        backend: str = "tpu",
    ) -> Exec:
        self.set_sim_time_step(1.0 / simulation_rate)
        meta, cols = self.snapshot()
        exec_ = Exec(
            meta,
            cols,
            system,
            sim_time_step=1.0 / simulation_rate,
            max_ticks=max_ticks,
            telemetry_rate=telemetry_rate,
            db_path=db_path,
        )
        exec_.schematic_content = self.schematic_content
        return exec_

    def run(
        self,
        system,
        simulation_rate: float = 120.0,
        generate_real_time: bool = False,
        telemetry_rate: float | None = None,
        default_playback_speed: float = 1.0,
        max_ticks: int | None = None,
        optimize: bool = False,
        is_canceled=None,
        pre_step=None,
        post_step=None,
        db_path: str | None = None,
        interactive: bool = True,
        start_timestamp: int | None = None,
        log_level: str | None = None,
        backend: str = "tpu",
    ):
        from .cli import run_cli

        return run_cli(
            self,
            system,
            simulation_rate=simulation_rate,
            generate_real_time=generate_real_time,
            telemetry_rate=telemetry_rate,
            max_ticks=max_ticks,
            is_canceled=is_canceled,
            pre_step=pre_step,
            post_step=post_step,
            db_path=db_path,
            backend=backend,
        )

    def to_jax(
        self,
        system,
        simulation_rate: float = 120.0,
        default_playback_speed: float = 1.0,
        max_ticks: int | None = None,
    ) -> JaxSim:
        from .system import SystemBuilder as _SB
        from .system import as_system

        self.set_sim_time_step(1.0 / simulation_rate)
        meta, cols = self.snapshot()
        sys = as_system(system)

        def step_fn(state: dict) -> dict:
            b = _SB(meta, dict(state))
            sys.call(b)
            return b.cols

        step_fn = jax.jit(step_fn)

        entity_dict = {m.name: eid for eid, m in meta.entity_metadata.items()}
        component_entity_dict = {
            n: list(ids) for n, ids in meta.comp_entities.items()
        }
        return JaxSim(step_fn, cols, entity_dict, component_entity_dict)
