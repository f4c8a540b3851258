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
import os
import queue as _queue
import tempfile
import threading
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .dataframe import DataFrame
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
        # telemetry copy/commit runs on the writer thread (off the step
        # loop), so the real-time factor is set by the kernel alone
        rtf = self.sim_time_step / per_tick if per_tick > 0 else 0.0
        return {
            "build": self.build_s * 1e3,
            "kernel": per_tick * 1e3,
            "copy": copy_per_tick * 1e3,  # background writer-thread time
            "tick": per_tick * 1e3,
            "real_time_factor": rtf,
        }


class History:
    """Per-tick telemetry snapshots kept on host (numpy).

    The DB *is* the checkpoint in the reference (SURVEY §5); here the host
    history plays that role for the embedded/offline path and is exported to
    the elodin-db wire format by the telemetry plane.

    RAM is bounded: past ``ELODIN_HISTORY_MAX_BYTES`` (default 512 MiB) the
    oldest chunks spill to ``.npy`` files and are memory-mapped back on
    read, mirroring the reference's disk-backed sparse-mmap store
    (libs/db/src/lib.rs:240+) for long serves."""

    def __init__(self, meta: WorldMeta, spool_dir: str | None = None,
                 max_bytes: int | None = None):
        self.meta = meta
        self.times: list[float] = []  # seconds since start
        self.chunks: dict[str, list[np.ndarray]] = {c: [] for c in meta.components}
        self.start_timestamp = datetime.datetime.now(datetime.timezone.utc)
        self.max_bytes = (
            max_bytes
            if max_bytes is not None
            else int(os.environ.get("ELODIN_HISTORY_MAX_BYTES", str(512 << 20)))
        )
        self._spool_dir = spool_dir
        self._live_bytes = 0
        self._spills: dict[str, list[np.ndarray]] = {c: [] for c in meta.components}
        self._spill_count = 0

    def append_state(self, t: float, cols: dict[str, np.ndarray]) -> None:
        self.times.append(t)
        for name, value in cols.items():
            self._append_chunk(name, np.asarray(value)[None])

    def append_batch(self, ts: np.ndarray, stacked: dict[str, np.ndarray]) -> None:
        self.times.extend(ts.tolist())
        for name, value in stacked.items():
            self._append_chunk(name, np.asarray(value))

    def _append_chunk(self, name: str, value: np.ndarray) -> None:
        self.chunks[name].append(value)
        self._live_bytes += value.nbytes
        if self._live_bytes > self.max_bytes:
            self._spill()

    def _spill(self) -> None:
        if self._spool_dir is None:
            self._spool_dir = tempfile.mkdtemp(prefix="elodin-history-")
        os.makedirs(self._spool_dir, exist_ok=True)
        idx = self._spill_count
        self._spill_count += 1
        for name, chunk_list in self.chunks.items():
            if not chunk_list:
                continue
            arr = np.concatenate(chunk_list, axis=0)
            path = os.path.join(
                self._spool_dir, f"{idx:06d}_{name.replace('/', '_')}.npy"
            )
            np.save(path, arr)
            self._spills[name].append(np.load(path, mmap_mode="r"))
            chunk_list.clear()
        self._live_bytes = 0

    def series(self, name: str) -> np.ndarray:
        """(n_rows, n_entities, *shape) array for one component."""
        parts = list(self._spills[name]) + self.chunks[name]
        return np.concatenate(parts, axis=0)

    def truncate(self, keep_rows: int) -> None:
        """Drop everything past ``keep_rows`` total rows (restore path)."""
        self.times = self.times[:keep_rows]
        for name in self.chunks:
            series = self.series(name)[:keep_rows].copy()
            self.chunks[name] = [series] if len(series) else []
            self._spills[name] = []
        self._live_bytes = sum(
            c.nbytes for chunks in self.chunks.values() for c in chunks
        )

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


class _TelemetryPump:
    """Bounded-queue writer thread between the step loop and the telemetry
    sinks (History + DB commit).

    Keeps the stellarator contract (SURVEY L5: IO never blocks the step
    loop) honestly: the sim thread only enqueues device arrays; the
    device->host copy, the history append, and the DB store append all run
    here (mirrors commit_world_head_unified running on the DB executor,
    libs/nox-py/src/impeller2_server.rs:390).  Backpressure: the queue is
    bounded (ELODIN_COMMIT_QUEUE, default 64 batches); when full the
    producer blocks — lossless like the reference — and the stall is
    counted so profiles surface it."""

    def __init__(self, history: History, on_commit, profiler: Profiler):
        depth = int(os.environ.get("ELODIN_COMMIT_QUEUE", "64"))
        self.q: _queue.Queue = _queue.Queue(maxsize=depth)
        self.history = history
        self.on_commit = on_commit
        self.profiler = profiler
        # optional Log2Histogram: serve-loop tick metrics "commit" phase
        # (recorded here because the commit runs off the sim thread)
        self.commit_hist = None
        self.stalls = 0
        self.error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="elodin-telemetry"
        )
        self._thread.start()

    def submit(self, ts: np.ndarray, stacked: dict) -> None:
        try:
            self.q.put_nowait((ts, stacked))
        except _queue.Full:
            self.stalls += 1
            self.q.put((ts, stacked))
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def flush(self) -> None:
        self.q.join()
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def _run(self) -> None:
        while True:
            ts, stacked = self.q.get()
            try:
                t0 = time.perf_counter()
                stacked_np = {k: np.asarray(v) for k, v in stacked.items()}
                self.history.append_batch(ts, stacked_np)
                if self.on_commit is not None:
                    start = self.history.start_timestamp.timestamp()
                    ts_us = ((start + ts) * 1e6).astype(np.int64)
                    self.on_commit(ts_us, stacked_np)
                dt = time.perf_counter() - t0
                self.profiler.copy_s += dt
                if self.commit_hist is not None:
                    self.commit_hist.observe_us(dt * 1e6)
            except BaseException as e:  # noqa: BLE001
                self.error = e
            finally:
                self.q.task_done()


class _LockstepSession:
    """Compiled step for kHz-rate external lockstep.

    Program shape: (state_cols [donated], command_cols) -> (new state, the
    send components gathered into one flat f64 vector, optional emit stack).
    The caller owns the command buffers (numpy, written in place between
    ticks); the output vector is fetched with a single host transfer per
    tick.  Parity anchor: the reference's native betaflight-SITL lockstep
    (4-8 kHz, docs changelog / feature catalog §19).

    ``hold_ticks > 1`` is the batched (TPU-resident) mode: each exchange
    applies the commands once, advances ``hold_ticks`` plant ticks in-graph
    (``lax.scan``), and returns the send vector for EVERY intermediate tick
    as a (hold_ticks, len) stack.  Controls are zero-order-held across the
    window — the controller effectively runs at sim_rate / hold_ticks, the
    standard decimated-FSW fidelity tradeoff (SURVEY §7(d)); the per-
    round-trip tunnel latency amortizes over the window, which is what
    makes a device-resident SITL rate defensible."""

    def __init__(self, exec_: "Exec", send: list[str], recv: list[str],
                 hold_ticks: int = 1):
        if hold_ticks < 1:
            raise ValueError(f"hold_ticks must be >= 1, got {hold_ticks}")
        self.exec = exec_
        self.hold_ticks = hold_ticks
        self.send_specs = [exec_._history.resolve(q) for q in send]
        self.recv_comps = tuple(
            sorted({exec_._history.resolve(q)[0] for q in recv})
        )
        self.cmd_bufs: dict[str, np.ndarray] = {
            c: np.array(exec_.cols[c]) for c in self.recv_comps
        }
        # record_history is compiled into the program; callers check .emit
        # against exec.record_history and rebuild the session on mismatch
        self.emit = emit = exec_.record_history
        step = exec_._step
        send_specs = self.send_specs
        recv_comps = self.recv_comps

        def gather(new):
            return jnp.concatenate(
                [jnp.ravel(new[c][row]).astype(jnp.float64) for c, row in send_specs]
            )

        if hold_ticks == 1:
            def run1(cols, cmds):
                cols = dict(cols)
                for c in recv_comps:
                    cols[c] = cmds[c]
                new = step(cols)
                out = gather(new)
                if emit:
                    return new, out, jax.tree_util.tree_map(lambda x: x[None], new)
                return new, out, None
        else:
            def run1(cols, cmds):
                cols = dict(cols)
                for c in recv_comps:
                    cols[c] = cmds[c]

                def body(carry, _):
                    new = step(carry)
                    return new, (gather(new), new if emit else None)

                new, (outs, states) = jax.lax.scan(
                    body, cols, None, length=hold_ticks
                )
                return new, outs, states  # outs: (hold_ticks, send_len)

        t0 = time.perf_counter()
        fn = jax.jit(run1, donate_argnums=0)
        self._fn = fn.lower(exec_.cols, dict(self.cmd_bufs)).compile()
        exec_.profiler.build_s += time.perf_counter() - t0

    def peek(self) -> np.ndarray:
        """Current (pre-step) values of the send components, packed."""
        with self.exec._cols_lock:
            return np.concatenate(
                [
                    np.ravel(np.asarray(self.exec.cols[c], dtype=np.float64)[row])
                    for c, row in self.send_specs
                ]
            )

    def tick(self) -> np.ndarray:
        """Advance with the current command buffers; returns the packed
        post-step send vector — (len,) at hold_ticks=1, (hold_ticks, len)
        in batched mode (one row per intermediate tick)."""
        ex = self.exec
        with ex._cols_lock:
            # flush pending write_component calls first: the compiled fn
            # donates ex.cols, so a stale full-column snapshot left in
            # _host_writes would otherwise be applied by the NEXT generic
            # run() and silently revert every session-advanced value
            ex._apply_host_writes()
            final, out, stacked = self._fn(ex.cols, dict(self.cmd_bufs))
            ex.cols = dict(final)
        ex._tick += self.hold_ticks
        ex.profiler.ticks += self.hold_ticks
        if stacked is not None:
            base = (ex._tick - self.hold_ticks + 1) * ex.sim_time_step
            ts = np.asarray(
                [base + i * ex.sim_time_step for i in range(self.hold_ticks)]
            )
            ex._ensure_pump().submit(ts, dict(stacked))
        return np.asarray(out)


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

        from .system import build_step

        self._step = build_step(meta, system)

        t0 = time.perf_counter()
        self._jit_cache: dict[tuple[int, bool], Callable] = {}
        self.cols = {n: jnp.asarray(v) for n, v in cols.items()}
        # warm the single-batch program so profile()'s build time means
        # something
        self._scan_fn(1, self.ticks_per_telemetry, emit=self.record_history)
        self.profiler.build_s = time.perf_counter() - t0

        spool = os.path.join(db_path, "history_spool") if db_path else None
        self._history = History(meta, spool_dir=spool)
        self._tick = 0
        if self.record_history:
            self._history.append_state(0.0, {n: np.asarray(v) for n, v in self.cols.items()})
        self._host_writes: dict[str, np.ndarray] = {}
        # write_component may be called from the DB server's threads
        # (external_control over the wire) while the sim thread applies
        self._host_writes_lock = threading.Lock()
        # Both step programs donate their input buffers, so self.cols points
        # at DELETED jax arrays for the duration of a device launch.  Server
        # threads reading components must not observe that window: _run_batch
        # holds this lock from launch until self.cols is swapped to the
        # program's output, and every cross-thread self.cols read takes it.
        self._cols_lock = threading.Lock()
        # read_component memo: (device array identity, host COPY) per comp —
        # a column only changes when a batch rebinds it, so repeat reads
        # between batches skip the d2h transfer entirely
        self._col_read_cache: dict[str, tuple] = {}
        self._pump: _TelemetryPump | None = None

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

            # Donate the input state like the fast path: without it the
            # emit program holds input + output + the n-stack alive at once
            # and history-recording runs pay ~2x state HBM
            # (reference donate pattern, libs/nox-py/src/system.rs:944).
            fn = jax.jit(run_n, donate_argnums=0)
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
        with self._cols_lock:
            snapshot = np.asarray(self.cols[comp]).copy()
        with self._host_writes_lock:
            self._host_writes.setdefault(comp, snapshot)
            buf = self._host_writes[comp]
            buf[row] = np.asarray(value, dtype=buf.dtype).reshape(buf.shape[1:])

    def read_component(self, qualified: str) -> np.ndarray:
        comp, row = self._history.resolve(qualified)
        with self._host_writes_lock:
            if comp in self._host_writes:
                # copy: the pending-write buffer is shared with writer
                # threads and must not alias into the caller
                return np.atleast_1d(np.array(self._host_writes[comp][row]))
        # transfer the column then index on the host: jnp indexing
        # dispatches a device computation per call (~0.4 ms), which
        # dominated the UDP-lockstep tick budget.  The memo holds a host
        # COPY (np.asarray of a CPU-backend jax array can be a zero-copy
        # view of a buffer the donated batch programs later recycle),
        # keyed on the device array's identity so a batch rebinding the
        # column invalidates it automatically.
        with self._cols_lock:
            cur = self.cols[comp]
            cached = self._col_read_cache.get(comp)
            if cached is None or cached[0] is not cur:
                cached = (cur, np.array(cur))
                self._col_read_cache[comp] = cached
        return np.atleast_1d(np.array(cached[1][row]))

    def _apply_host_writes(self) -> None:
        with self._host_writes_lock:
            for comp, buf in self._host_writes.items():
                self.cols[comp] = jnp.asarray(buf)
            self._host_writes.clear()

    def lockstep_session(self, send: list[str], recv: list[str],
                         hold_ticks: int = 1):
        """One-tick fast path for external lockstep bridges (SITL co-sims).

        The generic per-tick path pays a jnp.asarray dispatch per written
        command column plus a d2h transfer per read component; at multi-kHz
        lockstep rates that overhead IS the budget.  The session compiles a
        single program taking the command columns as ARGUMENTS (donating the
        state) and returning the requested telemetry values packed into one
        flat f64 vector — one h2d and one d2h per tick, both inside the
        compiled call.  Telemetry still pumps off-thread when history
        recording is on.

        ``hold_ticks > 1`` selects the batched device-resident mode: each
        exchange zero-order-holds the commands, advances that many plant
        ticks in one compiled launch, and returns a (hold_ticks, len)
        telemetry stack — amortizing the per-round-trip device latency at
        the cost of running the external controller at sim_rate/hold_ticks
        (see _LockstepSession).

        ``record_history`` is frozen into the compiled program at session
        creation (exposed as ``session.emit``); toggle it on the exec and
        create a new session to change telemetry behavior."""
        return _LockstepSession(self, send, recv, hold_ticks)

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
            with self._cols_lock:
                final, stacked = fn(self.cols)
                final = dict(final)
                jax.block_until_ready(final)
                self.cols = final
            self.profiler.kernel_s += time.perf_counter() - t0
            ts = (
                self._tick + (np.arange(1, n + 1) * stride)
            ) * self.sim_time_step
            # hand the DEVICE arrays to the writer thread: the d2h copy,
            # history append, and DB commit all happen off the step loop
            self._ensure_pump().submit(ts, dict(stacked))
        else:
            with self._cols_lock:
                final, _ = fn(self.cols)
                final = dict(final)
                jax.block_until_ready(final)
                self.cols = final
            self.profiler.kernel_s += time.perf_counter() - t0
        self._tick += n * stride
        self.profiler.ticks += n * stride

    def _ensure_pump(self) -> "_TelemetryPump":
        if self._pump is None:
            self._pump = _TelemetryPump(
                self._history,
                lambda ts_us, cols: (
                    self.on_commit_batch(ts_us, cols)
                    if self.on_commit_batch is not None
                    else None
                ),
                self.profiler,
            )
            self._pump.commit_hist = getattr(self, "commit_hist", None)
        return self._pump

    def flush_telemetry(self) -> None:
        """Block until every submitted telemetry batch has been copied to
        host, recorded in history, and committed to the DB."""
        if self._pump is not None:
            self._pump.flush()

    # -- outputs ---------------------------------------------------------

    def profile(self) -> dict[str, float]:
        return self.profiler.profile()

    def tick(self) -> int:
        return self._tick

    def column_array(self, name: str) -> np.ndarray:
        """Latest values of a component column."""
        with self._cols_lock:
            return np.asarray(self.cols[name])

    def history_frame(self, components) -> DataFrame:
        if isinstance(components, str):
            components = [components]
        self.flush_telemetry()
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
        self.flush_telemetry()
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
        snapshot = self.state_at(tick)  # flushes telemetry first
        self.cols = {
            k: jnp.asarray(v, dtype=self.cols[k].dtype)
            for k, v in snapshot.items()
        }
        h = self._history
        # the tick counter comes from the recorded sim time of the restored
        # row, NOT from the tick column (which is per-entity in a batched
        # world and would silently pick the max across samples)
        restored_time = h.times[tick]
        h.truncate(tick + 1)
        self._tick = int(round(restored_time / self.sim_time_step))
        with self._host_writes_lock:  # racing DB-thread write_component
            self._host_writes.clear()

    def restore_from_db(self, db) -> int:
        """Resume from a telemetry database: load every component's latest
        row back into device state (the DB *is* the checkpoint — SURVEY §5;
        reference restores via copy_db_to_world at init,
        impeller2_server.rs:229,320).  Returns the number of components
        restored."""
        from .db.vtable import component_id_of

        id_to_name = {
            eid: m.name for eid, m in self.meta.entity_metadata.items()
        }
        restored = 0
        new_cols = dict(self.cols)
        for comp_name, ids in self.meta.comp_entities.items():
            col = np.asarray(new_cols[comp_name]).copy()
            hit = False
            for i, eid in enumerate(ids):
                ename = id_to_name.get(eid)
                qual = f"{ename}.{comp_name}" if ename else f"{eid}.{comp_name}"
                store = db.components.get(component_id_of(qual))
                if store is None or store.len == 0:
                    continue
                _ts, row = store.latest()
                col[i] = np.asarray(row).reshape(col.shape[1:])
                hit = True
            if hit:
                new_cols[comp_name] = jnp.asarray(col, dtype=self.cols[comp_name].dtype)
                restored += 1
        self.cols = new_cols
        if "tick" in self.cols and restored:
            # the tick column is the source of truth here: commit
            # timestamps are wall-anchored (epoch_start + sim_time in
            # _TelemetryPump), so they can't recover the tick across a
            # process restart.  .max() over entities is safe because the
            # global tick advances in lockstep for every entity
            # (increment_sim_tick) — max only matters when some entities'
            # stores are missing their newest rows.
            self._tick = int(np.asarray(self.cols["tick"]).max())
        return restored

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
