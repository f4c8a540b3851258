"""Batched Monte Carlo: the TPU payoff.

The reference runs one OS process per sample
(libs/monte-carlo/src/lib.rs:1193,2052-2067) because its engine is scalar in
the sample axis.  Here the whole campaign is ONE XLA program: every component
column gets a leading sample axis, per-sample parameter draws are scattered
into the initial state, the tick pipeline is vmapped over samples, and
``lax.scan`` advances all rollouts in lockstep.  Sharding the sample axis
over a ``jax.sharding.Mesh`` scales the same program across TPU chips with
zero code changes (batch parallelism needs no collectives).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..execimpl import History
from ..system import build_step


class BatchedResult:
    def __init__(self, meta, final_cols: dict, n_samples: int,
                 wall_seconds: float, ticks: int, history=None):
        self.meta = meta
        self.final = final_cols
        self.n_samples = n_samples
        self.wall_seconds = wall_seconds
        self.ticks = ticks
        self.history = history  # optional dict name -> (n_emits, n, ...) stacks
        self._resolver = History(meta)

    def component(self, qualified: str) -> np.ndarray:
        """Final values of 'entity.component' across samples: (n, *shape)."""
        comp, row = self._resolver.resolve(qualified)
        return np.asarray(self.final[comp][:, row])

    def column(self, component: str) -> np.ndarray:
        return np.asarray(self.final[component])

    @property
    def rollouts_per_second(self) -> float:
        return self.n_samples / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def entity_steps_per_second(self) -> float:
        n_ent = self.meta.entity_count
        return (
            self.n_samples * n_ent * self.ticks / self.wall_seconds
            if self.wall_seconds
            else 0.0
        )


class BatchedCampaign:
    """Compile once, run dispersed rollouts as a single device program."""

    def __init__(self, world, system, n_samples: int,
                 overrides: dict[str, np.ndarray] | None = None,
                 simulation_rate: float = 120.0,
                 mesh: Mesh | None = None, axis_name: str = "samples"):
        world.set_sim_time_step(1.0 / simulation_rate)
        self.meta, cols = world.snapshot()
        self.n = int(n_samples)
        self.mesh = mesh
        self.axis_name = axis_name
        resolver = History(self.meta)

        # broadcast template state over the sample axis
        batched: dict[str, np.ndarray] = {}
        for name, v in cols.items():
            batched[name] = np.broadcast_to(v, (self.n,) + v.shape).copy()

        for qualified, values in (overrides or {}).items():
            values = np.asarray(values)
            if "." in qualified and qualified.split(".", 1)[0] in self.meta.entity_names:
                comp, row = resolver.resolve(qualified)
                batched[comp][:, row] = values.reshape(
                    (self.n,) + batched[comp].shape[2:]
                )
            else:
                comp = qualified
                batched[comp][:] = values.reshape((self.n,) + batched[comp].shape[1:])

        if mesh is not None:
            # accept any mesh: shard samples over axis_name if present,
            # otherwise over the mesh's first axis (e.g. make_mesh's 'dp')
            if axis_name not in mesh.axis_names:
                axis_name = mesh.axis_names[0]
                self.axis_name = axis_name
            sharding = NamedSharding(mesh, P(axis_name))
            self.cols = {
                k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batched.items()
            }
        else:
            self.cols = {k: jnp.asarray(v) for k, v in batched.items()}

        self._vstep = jax.vmap(build_step(self.meta, system))
        self._jit_cache: dict[int, Callable] = {}

    def _runner(self, ticks: int) -> Callable:
        # caches the AOT-compiled executable, not just the jit wrapper:
        # run() calls lower().compile(), which bypasses jit's dispatch
        # cache and would re-trace + re-compile on every campaign.run()
        fn = self._jit_cache.get(ticks)
        if fn is None:
            vstep = self._vstep

            def run(cols):
                return jax.lax.fori_loop(
                    0, ticks, lambda _i, c: vstep(c), cols
                )

            fn = jax.jit(run, donate_argnums=0).lower(self.cols).compile()
            self._jit_cache[ticks] = fn
        return fn

    def run(self, ticks: int) -> BatchedResult:
        """Run the campaign, segmented into bounded-duration device
        launches.

        One monolithic launch of samples x ticks can run for minutes;
        runtimes commonly bound single-execution time (and preemption /
        health-checking favors shorter launches), so the tick loop is split
        into ELODIN_MC_SEGMENT_TICKS chunks (default 20000) with state
        staying on device between launches — same math, same result, one
        extra dispatch per segment."""
        import os

        seg = int(os.environ.get("ELODIN_MC_SEGMENT_TICKS", "20000"))
        seg = max(1, min(seg, ticks))
        n_full, rem = divmod(ticks, seg)
        compiled = self._runner(seg)
        compiled_rem = self._runner(rem) if rem else None
        t0 = time.perf_counter()
        cols = self.cols
        for _ in range(n_full):
            cols = dict(compiled(cols))
        if compiled_rem is not None:
            cols = dict(compiled_rem(cols))
        jax.block_until_ready(cols)
        wall = time.perf_counter() - t0
        self.cols = cols
        return BatchedResult(self.meta, self.cols, self.n, wall, ticks)


def run_batched(world, system, n_samples: int, ticks: int,
                overrides: dict[str, np.ndarray] | None = None,
                simulation_rate: float = 120.0,
                mesh: Mesh | None = None) -> BatchedResult:
    campaign = BatchedCampaign(
        world, system, n_samples, overrides, simulation_rate, mesh
    )
    return campaign.run(ticks)
