"""Compiled world execution: one jitted XLA program per tick batch.

Replaces the reference's dual backends (cranelift JIT at
libs/nox-py/src/cranelift_exec.rs, per-tick jax calls at jax_exec.rs).  On
TPU the whole system pipeline compiles to a single ``lax.scan`` over ticks,
so component state never leaves HBM between telemetry commits — this removes
the per-tick h2d/d2h round trips the reference pays on its GPU backend
(jax_exec.rs:118-186).
"""

from __future__ import annotations

import datetime
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .dataframe import DataFrame
from .six_dof import increment_sim_tick_system
from .system import Pipe, SystemBuilder, as_system
from .world import WorldMeta


class Profiler:
    """Rolling per-phase timings -> real_time_factor
    (libs/nox-py/src/profile.rs:15-60)."""

    def __init__(self, sim_time_step: float):
        self.sim_time_step = sim_time_step
        self.build_s = 0.0
        self.kernel_s = 0.0
        self.copy_s = 0.0
        self.ticks = 0

    def profile(self) -> dict[str, float]:
        per_tick = self.kernel_s / self.ticks if self.ticks else 0.0
        copy_per_tick = self.copy_s / self.ticks if self.ticks else 0.0
        total = per_tick + copy_per_tick
        rtf = self.sim_time_step / total if total > 0 else 0.0
        return {
            "build": self.build_s * 1e3,
            "kernel": per_tick * 1e3,
            "copy": copy_per_tick * 1e3,
            "tick": total * 1e3,
            "real_time_factor": rtf,
        }


class History:
    """Per-tick telemetry snapshots kept on host (numpy).

    The DB *is* the checkpoint in the reference (SURVEY §5); here the host
    history plays that role for the embedded/offline path and is exported to
    the elodin-db wire format by the telemetry plane."""

    def __init__(self, meta: WorldMeta):
        self.meta = meta
        self.times: list[float] = []  # seconds since start
        self.chunks: dict[str, list[np.ndarray]] = {c: [] for c in meta.components}
        self.start_timestamp = datetime.datetime.now(datetime.timezone.utc)

    def append_state(self, t: float, cols: dict[str, np.ndarray]) -> None:
        self.times.append(t)
        for name, value in cols.items():
            self.chunks[name].append(np.asarray(value)[None])

    def append_batch(self, ts: np.ndarray, stacked: dict[str, np.ndarray]) -> None:
        self.times.extend(ts.tolist())
        for name, value in stacked.items():
            self.chunks[name].append(np.asarray(value))

    def series(self, name: str) -> np.ndarray:
        """(n_rows, n_entities, *shape) array for one component."""
        return np.concatenate(self.chunks[name], axis=0)

    def column_names(self) -> list[str]:
        out = []
        id_to_name = {eid: m.name for eid, m in self.meta.entity_metadata.items()}
        for comp, ids in self.meta.comp_entities.items():
            for eid in ids:
                ename = id_to_name.get(eid)
                if ename is not None:
                    out.append(f"{ename}.{comp}")
        return out

    def resolve(self, qualified: str) -> tuple[str, int]:
        """'entity.component' -> (component name, row index)."""
        entity_name, _, comp = qualified.partition(".")
        if not comp:
            raise KeyError(f"expected 'entity.component', got {qualified!r}")
        eid = self.meta.entity_names.get(entity_name)
        if eid is None:
            raise KeyError(f"unknown entity {entity_name!r}")
        index = self.meta.comp_index.get(comp)
        if index is None or eid not in index:
            raise KeyError(f"entity {entity_name!r} has no component {comp!r}")
        return comp, index[eid]


def _call_canceled(is_canceled) -> bool:
    try:
        return bool(is_canceled())
    except TypeError:
        return bool(is_canceled)


class Exec:
    """Compiled world executor (libs/nox-py/src/exec.rs)."""

    def __init__(
        self,
        meta: WorldMeta,
        cols: dict[str, np.ndarray],
        system,
        sim_time_step: float,
        max_ticks: int | None = None,
        telemetry_rate: float | None = None,
        record_history: bool = True,
        db_path: str | None = None,
    ):
        self.meta = meta
        self.sim_time_step = sim_time_step
        self.max_ticks = max_ticks
        self.db_path = db_path
        # async telemetry tap: set by db.server.serve_exec; called with
        # (timestamps_us, stacked_cols) after each batch, off the device loop
        self.on_commit_batch = None
        self.profiler = Profiler(sim_time_step)
        self.record_history = record_history
        # ticks between telemetry commits (>=1)
        if telemetry_rate is not None and telemetry_rate > 0:
            self.ticks_per_telemetry = max(
                1, round((1.0 / sim_time_step) / telemetry_rate)
            )
        else:
            self.ticks_per_telemetry = 1

        full = Pipe(increment_sim_tick_system, as_system(system))

        def step(state: dict[str, jax.Array]) -> dict[str, jax.Array]:
            b = SystemBuilder(meta, dict(state))
            full.call(b)
            return b.cols

        self._step = step

        t0 = time.perf_counter()
        self._jit_cache: dict[tuple[int, bool], Callable] = {}
        self.cols = {n: jnp.asarray(v) for n, v in cols.items()}
        # warm the single-batch program so profile()'s build time means
        # something
        self._scan_fn(1, self.ticks_per_telemetry, emit=self.record_history)
        self.profiler.build_s = time.perf_counter() - t0

        self._history = History(meta)
        self._tick = 0
        if self.record_history:
            self._history.append_state(0.0, {n: np.asarray(v) for n, v in self.cols.items()})
        self._host_writes: dict[str, np.ndarray] = {}

    # -- compilation -------------------------------------------------------

    def _scan_fn(self, n: int, stride: int, emit: bool) -> Callable:
        """Jitted program running ``n`` telemetry batches of ``stride`` ticks
        each, optionally emitting the post-batch state stack."""
        key = (n, stride, emit)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        step = self._step

        def run_stride(cols):
            if stride == 1:
                return step(cols)
            return jax.lax.fori_loop(0, stride, lambda _i, c: step(c), cols)

        if emit:

            def body(carry, _):
                new = run_stride(carry)
                return new, new

            def run_n(cols):
                if n == 1:
                    new = run_stride(cols)
                    return new, jax.tree_util.tree_map(lambda x: x[None], new)
                return jax.lax.scan(body, cols, None, length=n)

            fn = jax.jit(run_n)
        else:

            def run_fast(cols):
                return jax.lax.fori_loop(
                    0, n * stride, lambda _i, c: step(c), cols
                ), None

            fn = jax.jit(run_fast, donate_argnums=0)

        # AOT-compile so per-batch timings measure the kernel, not XLA
        t0 = time.perf_counter()
        fn = fn.lower(self.cols).compile()
        self.profiler.build_s += time.perf_counter() - t0

        self._jit_cache[key] = fn
        return fn

    # -- host-side control -------------------------------------------------

    def write_component(self, qualified: str, value) -> None:
        """Host write into an external_control component, applied before the
        next batch (mirrors copy_db_to_world,
        libs/nox-py/src/impeller2_server.rs:320)."""
        comp, row = self._history.resolve(qualified)
        self._host_writes.setdefault(comp, np.asarray(self.cols[comp]).copy())
        buf = self._host_writes[comp]
        buf[row] = np.asarray(value, dtype=buf.dtype).reshape(buf.shape[1:])

    def read_component(self, qualified: str) -> np.ndarray:
        comp, row = self._history.resolve(qualified)
        if comp in self._host_writes:
            return np.atleast_1d(self._host_writes[comp][row])
        return np.atleast_1d(np.asarray(self.cols[comp][row]))

    def _apply_host_writes(self) -> None:
        for comp, buf in self._host_writes.items():
            self.cols[comp] = jnp.asarray(buf)
        self._host_writes.clear()

    # -- running -------------------------------------------------------------

    def run(self, ticks: int = 1, show_progress: bool = True, is_canceled=None):
        remaining = int(ticks)
        if self.max_ticks is not None:
            remaining = min(remaining, max(0, self.max_ticks - self._tick))
        max_batches = 4096  # cap single-program size
        stride = self.ticks_per_telemetry
        while remaining > 0:
            if remaining >= stride:
                n = min(remaining // stride, max_batches)
                self._run_batch(n, stride)
                remaining -= n * stride
            else:
                # incomplete trailing batch still commits, mirroring the
                # temporary ticks_per_telemetry override at exec.rs:133-140
                self._run_batch(1, remaining)
                remaining = 0
            if is_canceled is not None and _call_canceled(is_canceled):
                return
        return

    def _run_batch(self, n: int, stride: int) -> None:
        self._apply_host_writes()
        fn = self._scan_fn(n, stride, emit=self.record_history)
        t0 = time.perf_counter()
        if self.record_history:
            final, stacked = fn(self.cols)
            final = dict(final)
            jax.block_until_ready(final)
            self.profiler.kernel_s += time.perf_counter() - t0
            t1 = time.perf_counter()
            ts = (
                self._tick + (np.arange(1, n + 1) * stride)
            ) * self.sim_time_step
            stacked_np = {k: np.asarray(v) for k, v in stacked.items()}
            self._history.append_batch(ts, stacked_np)
            if self.on_commit_batch is not None:
                start = self._history.start_timestamp.timestamp()
                ts_us = ((start + ts) * 1e6).astype(np.int64)
                self.on_commit_batch(ts_us, stacked_np)
            self.profiler.copy_s += time.perf_counter() - t1
        else:
            final, _ = fn(self.cols)
            final = dict(final)
            jax.block_until_ready(final)
            self.profiler.kernel_s += time.perf_counter() - t0
        self.cols = final
        self._tick += n * stride
        self.profiler.ticks += n * stride

    # -- outputs ---------------------------------------------------------

    def profile(self) -> dict[str, float]:
        return self.profiler.profile()

    def tick(self) -> int:
        return self._tick

    def column_array(self, name: str) -> np.ndarray:
        """Latest values of a component column."""
        return np.asarray(self.cols[name])

    def history_frame(self, components) -> DataFrame:
        if isinstance(components, str):
            components = [components]
        times = np.asarray(self._history.times, dtype=np.float64)
        start = np.datetime64(
            self._history.start_timestamp.replace(tzinfo=None), "us"
        )
        data: dict[str, np.ndarray] = {
            "time": start + (times * 1e6).astype("timedelta64[us]")
        }
        for q in components:
            comp, row = self._history.resolve(q)
            series = self._history.series(comp)[:, row]
            data[q] = series
        return DataFrame(data)

    # -- checkpoint/resume (SURVEY §5: "the DB *is* the checkpoint") -------

    def state_at(self, tick: int) -> dict:
        """Component state snapshot at a recorded tick (0 = initial)."""
        if not self.record_history:
            raise RuntimeError("history recording is disabled")
        out = {}
        for name in self.meta.components:
            series = self._history.series(name)
            if tick >= len(series):
                raise IndexError(f"tick {tick} not recorded")
            out[name] = series[tick]
        return out

    def restore(self, tick: int) -> None:
        """Rewind device state to a recorded tick and truncate history
        after it (StepContext.truncate generalized, step_context.rs:342)."""
        snapshot = self.state_at(tick)
        self.cols = {
            k: jnp.asarray(v, dtype=self.cols[k].dtype)
            for k, v in snapshot.items()
        }
        h = self._history
        keep = tick + 1
        h.times = h.times[:keep]
        for name in h.chunks:
            series = h.series(name)[:keep]
            h.chunks[name] = [series]
        self._tick = int(np.asarray(snapshot.get("tick", tick)).max()) if "tick" in snapshot else tick
        self._host_writes.clear()

    def save_checkpoint(self, path: str) -> None:
        """Write the live device state as an npz checkpoint."""
        np.savez(
            path, **{k: np.asarray(v) for k, v in self.cols.items()}
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        self.cols = {
            k: jnp.asarray(data[k], dtype=self.cols[k].dtype)
            for k in self.cols
        }

    def history(self, components) -> DataFrame:
        df = self.history_frame(components)
        try:  # upgrade to real polars when available
            import polars  # noqa: F401

            return df.to_polars()
        except Exception:
            return df

    def save_archive(self, path: str, format: str = "parquet") -> None:
        """Export every entity.component series
        (libs/nox-py/src/exec.rs:178-187)."""
        import pathlib

        out = pathlib.Path(path)
        out.mkdir(parents=True, exist_ok=True)
        names = self._history.column_names()
        for name in names:
            df = self.history_frame([name])
            if format in ("parquet", "pq"):
                df.write_parquet(out / f"{name}.parquet")
            elif format in ("arrow", "arrow_ipc"):
                import pyarrow.ipc as ipc

                table = df._to_arrow_table()
                with ipc.new_file(str(out / f"{name}.arrow"), table.schema) as w:
                    w.write_table(table)
            elif format == "csv":
                df.write_csv(out / f"{name}.csv")
            else:
                raise ValueError(f"unknown archive format {format!r}")
