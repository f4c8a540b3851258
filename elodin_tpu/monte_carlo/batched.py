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
                 wall_seconds: float, ticks: int, history=None,
                 history_times=None):
        self.meta = meta
        self.final = final_cols
        self.n_samples = n_samples
        self.wall_seconds = wall_seconds
        self.ticks = ticks
        # Decimated in-graph trajectory emits: dict component ->
        # (n_emits, n_samples, n_entities, *shape); None when not recorded.
        self.history = history
        self.history_times = history_times  # (n_emits,) sim-time seconds
        self._resolver = History(meta)

    def component(self, qualified: str) -> np.ndarray:
        """Final values of 'entity.component' across samples: (n, *shape)."""
        comp, row = self._resolver.resolve(qualified)
        return np.asarray(self.final[comp][:, row])

    def column(self, component: str) -> np.ndarray:
        return np.asarray(self.final[component])

    def trajectory(self, qualified: str) -> np.ndarray:
        """Decimated per-sample time series of 'entity.component':
        (n_emits, n_samples, *shape).  Requires history recording
        (BatchedCampaign.run(..., history_every=K))."""
        if self.history is None:
            raise ValueError(
                "no trajectories recorded; pass history_every to run()"
            )
        comp, row = self._resolver.resolve(qualified)
        if comp not in self.history:
            raise KeyError(
                f"{comp} not in recorded history {sorted(self.history)}"
            )
        return np.asarray(self.history[comp][:, :, row])

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

        self._vstep = self._build_vstep(system)
        self._jit_cache: dict[int, Callable] = {}

    def _build_vstep(self, system) -> Callable:
        """One batched tick.  When the pipeline carries RateGroup stages
        (el.every), the rate gates are lifted OUTSIDE the sample vmap: the
        tick column is sample-uniform, so the scalar ``lax.cond`` truly
        skips the gated subsystem's compute on inactive ticks — traced
        under vmap the cond would degrade to select and run both branches,
        wasting exactly the work the schedule is meant to save."""
        from ..six_dof import increment_sim_tick_system
        from ..system import Pipe, RateGroup, SystemBuilder, as_system

        sys_ = as_system(system)
        items = sys_.systems if isinstance(sys_, Pipe) else [sys_]
        if not any(isinstance(s, RateGroup) for s in items):
            return jax.vmap(build_step(self.meta, system))

        meta = self.meta

        def stage_fn(target):
            def stepfn(state):
                b = SystemBuilder(meta, dict(state))
                target.call(b)
                return b.cols

            return jax.vmap(stepfn)

        stages: list[tuple] = [(None, stage_fn(increment_sim_tick_system))]
        for s in items:
            if isinstance(s, RateGroup) and s.every > 1:
                stages.append((s, stage_fn(s.system)))
            else:
                target = s.system if isinstance(s, RateGroup) else s
                stages.append((None, stage_fn(target)))

        def vstep(cols):
            out = dict(cols)
            for rg, f in stages:
                if rg is None:
                    out = dict(f(out))
                else:
                    tick = out["tick"].reshape(-1)[0]  # sample-uniform
                    # rg._pred any()-reduces full_rate_when over the batch,
                    # so the cond predicate stays scalar
                    out = dict(jax.lax.cond(
                        rg._pred(tick, out), f, lambda c: dict(c), out
                    ))
            return out

        return vstep

    @staticmethod
    def _until_key(until: Callable | None):
        """Cache key for an early-stop predicate.  Keyed on the CODE object
        plus (hashable) closure values, not callable identity: the natural
        usage passes a fresh lambda to every run() call, and an
        identity-keyed cache would re-lower + re-compile each time —
        exactly the cost the AOT cache exists to avoid."""
        if until is None:
            return None
        try:
            cells = tuple(c.cell_contents for c in (until.__closure__ or ()))
            hash(cells)
        except Exception:  # noqa: BLE001 — unhashable closure: identity
            return until
        return (until.__code__, cells)

    def _runner(self, ticks: int, until: Callable | None = None) -> Callable:
        # caches the AOT-compiled executable, not just the jit wrapper:
        # run() calls lower().compile(), which bypasses jit's dispatch
        # cache and would re-trace + re-compile on every campaign.run()
        key = (ticks, self._until_key(until))
        fn = self._jit_cache.get(key)
        if fn is None:
            vstep = self._vstep

            if until is None:
                def run(cols):
                    return jax.lax.fori_loop(
                        0, ticks, lambda _i, c: vstep(c), cols
                    )
            else:
                # early-stop predicate: the segment also returns one scalar
                # ("every sample terminal?") so the host loop can skip the
                # remaining segments.  Computed in-graph — costs one
                # all-reduce over the sample axis per launch, read by the
                # host as a 1-byte transfer.
                def run(cols):
                    cols = jax.lax.fori_loop(
                        0, ticks, lambda _i, c: vstep(c), cols
                    )
                    return cols, jnp.all(until(cols))

            fn = jax.jit(run, donate_argnums=0).lower(self.cols).compile()
            self._jit_cache[key] = fn
        return fn

    def _emit_runner(self, every: int, n_emits: int, selected: tuple,
                     until: Callable | None = None):
        key = ("emit", every, n_emits, selected, self._until_key(until))
        fn = self._jit_cache.get(key)
        if fn is None:
            vstep = self._vstep

            def run(cols):
                def seg(c, _):
                    c = jax.lax.fori_loop(0, every, lambda _i, cc: vstep(cc), c)
                    return c, {k: c[k] for k in selected}

                cols, hist = jax.lax.scan(seg, cols, None, length=n_emits)
                if until is None:
                    return cols, hist
                return cols, hist, jnp.all(until(cols))

            fn = jax.jit(run, donate_argnums=0).lower(self.cols).compile()
            self._jit_cache[key] = fn
        return fn

    def run(self, ticks: int, history_every: int = 0,
            history_components: list[str] | None = None,
            until: Callable | None = None) -> BatchedResult:
        """Run the campaign, segmented into bounded-duration device
        launches.

        One monolithic launch of samples x ticks can run for minutes;
        runtimes commonly bound single-execution time (and preemption /
        health-checking favors shorter launches), so the tick loop is split
        into ELODIN_MC_SEGMENT_TICKS chunks (default 20000) with state
        staying on device between launches — same math, same result, one
        extra dispatch per segment.

        ``until``: optional in-graph predicate ``cols -> bool array``; when
        EVERY sample satisfies it at a segment boundary the remaining
        segments are skipped.  Sound only when the sim latches terminal
        samples (scored state frozen once terminal, as the falcon9 DOWN
        phase does) — then the skipped ticks are exact no-ops and the
        result is bit-identical to the full run.  ``result.ticks`` reports
        the ticks actually advanced."""
        import os

        seg = int(os.environ.get("ELODIN_MC_SEGMENT_TICKS", "20000"))
        seg = max(1, min(seg, ticks))

        history = None
        history_times = None
        if history_every:
            # In-graph decimated trajectory emit: scan segments of
            # `history_every` ticks, each appending the selected columns;
            # the stacked (chunk, n, ...) history is copied to host once
            # per launch.
            if history_components:
                resolver = History(self.meta)
                selected = tuple(
                    sorted({resolver.resolve(q)[0] if "." in q else q
                            for q in history_components})
                )
            else:
                selected = tuple(sorted(self.cols))
            n_emits, tail = divmod(ticks, history_every)
            if n_emits == 0:
                raise ValueError(
                    f"history_every={history_every} exceeds ticks={ticks}: "
                    "no emit would ever fire"
                )
            # Honor the segment bound on this path too: each device launch
            # covers at most ~seg ticks (at least one emit interval), so a
            # long trajectory-recording campaign gets the same
            # bounded-duration launches as the no-history path.
            emits_per_launch = max(1, min(n_emits, seg // max(1, history_every)))
            n_full_l, rem_emits = divmod(n_emits, emits_per_launch)
            compiled = self._emit_runner(
                history_every, emits_per_launch, selected, until
            )
            compiled_rem = (
                self._emit_runner(history_every, rem_emits, selected, until)
                if rem_emits else None
            )
            compiled_tail = self._runner(tail) if tail else None
            t0 = time.perf_counter()
            cols = self.cols
            ticks_run = 0
            stopped = False
            hist_chunks: list[dict] = []
            for _ in range(n_full_l):
                out = compiled(cols)
                cols, hist = dict(out[0]), out[1]
                hist_chunks.append({k: np.asarray(v) for k, v in hist.items()})
                ticks_run += emits_per_launch * history_every
                if until is not None and bool(np.asarray(out[2])):
                    stopped = True
                    break
            if compiled_rem is not None and not stopped:
                out = compiled_rem(cols)
                cols, hist = dict(out[0]), out[1]
                hist_chunks.append({k: np.asarray(v) for k, v in hist.items()})
                ticks_run += rem_emits * history_every
            if compiled_tail is not None and not stopped:
                cols = dict(compiled_tail(cols))
                ticks_run += tail
            # host read = true sync (block_until_ready can return early
            # through the axon tunnel and under-report wall time)
            _ = np.asarray(cols[min(cols)])  # any output syncs the program
            wall = time.perf_counter() - t0
            history = {
                k: np.concatenate([h[k] for h in hist_chunks], axis=0)
                for k in selected
            }
            dt = float(np.asarray(cols["simulation_time_step"]).ravel()[0])
            emits_done = next(iter(history.values())).shape[0] if history else 0
            history_times = (
                np.arange(1, emits_done + 1, dtype=np.float64)
                * history_every * dt
            )
            self.cols = cols
            return BatchedResult(
                self.meta, self.cols, self.n, wall, ticks_run,
                history=history, history_times=history_times,
            )

        n_full, rem = divmod(ticks, seg)
        compiled = self._runner(seg, until)
        compiled_rem = self._runner(rem, until) if rem else None
        t0 = time.perf_counter()
        cols = self.cols
        ticks_run = 0
        stopped = False
        for _ in range(n_full):
            if until is None:
                cols = dict(compiled(cols))
            else:
                cols, done = compiled(cols)
                cols = dict(cols)
                if bool(np.asarray(done)):  # 1-byte d2h sync per segment
                    stopped = True
                    ticks_run += seg
                    break
            ticks_run += seg
        if compiled_rem is not None and not stopped:
            out = compiled_rem(cols)
            cols = dict(out[0] if until is not None else out)
            ticks_run += rem
        # host read = true sync (see above re: axon tunnel)
        _ = np.asarray(cols[min(cols)])  # any output syncs the program
        wall = time.perf_counter() - t0
        self.cols = cols
        return BatchedResult(self.meta, self.cols, self.n, wall, ticks_run)


def write_artifacts(result: BatchedResult, out_dir, draws=None, scores=None,
                    quality: dict | None = None) -> dict:
    """Write the process-campaign artifact set from a batched run.

    Drop-in for the reference workflow's outputs
    (libs/monte-carlo/src/lib.rs:103-117): plan.csv (the dispersion draws),
    results.csv (per-sample params + scores + validity), perf.csv
    (campaign pacing), summary.json (totals + quality gates), and — when
    the run recorded in-graph history — trajectories.npz with the decimated
    per-sample stacks, from which a dispersion plot is a two-liner.

    `scores` is a dict name -> (n,) array (floats or bools); a boolean or
    0/1 'valid' entry drives the validity counts.  `quality` supports
    {'min_rollouts_per_sec': X, 'fail_on_degraded': bool} — pacing gates
    adapted to the one-program campaign (degraded = the whole launch ran
    under the floor, mirroring the reference's pacing-integrity gates).
    """
    import csv
    import json
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = result.n_samples
    draws = {k: np.asarray(v) for k, v in (draws or {}).items()}
    scores = {k: np.asarray(v) for k, v in (scores or {}).items()}
    run_ids = [f"mc-{i:06d}" for i in range(n)]

    with open(out / "plan.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["run_id"] + [f"param.{k}" for k in draws])
        for i in range(n):
            w.writerow([run_ids[i]] + [draws[k][i] for k in draws])

    valid = scores.get("valid")
    if valid is None:
        valid = np.ones(n, dtype=bool)
    valid = np.asarray(valid).astype(bool)

    with open(out / "results.csv", "w", newline="") as f:
        w = csv.writer(f)
        header = (
            ["run_id"]
            + [f"param.{k}" for k in draws]
            + [k for k in scores if k != "valid"]
            + ["valid"]
        )
        w.writerow(header)
        for i in range(n):
            w.writerow(
                [run_ids[i]]
                + [draws[k][i] for k in draws]
                + [scores[k][i] for k in scores if k != "valid"]
                + [int(valid[i])]
            )

    rps = result.rollouts_per_second
    quality = dict(quality or {})
    floor = float(quality.get("min_rollouts_per_sec", 0.0))
    degraded = bool(floor and rps < floor)
    with open(out / "perf.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wall_s", "ticks", "n_samples", "rollouts_per_sec",
                    "entity_steps_per_sec", "degraded"])
        w.writerow([result.wall_seconds, result.ticks, n, rps,
                    result.entity_steps_per_second, int(degraded)])

    if result.history is not None:
        np.savez_compressed(
            out / "trajectories.npz",
            times=result.history_times,
            **{k: v for k, v in result.history.items()},
        )

    summary = {
        "total": n,
        "valid": int(valid.sum()),
        "invalid": int(n - valid.sum()),
        "degraded": int(degraded),
        "passed": int(valid.sum()) if not degraded else 0,
        "wall_s": result.wall_seconds,
        "ticks": result.ticks,
        "rollouts_per_sec": rps,
        "mode": "batched",
        "history_components": sorted(result.history) if result.history else [],
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    if quality.get("fail_on_degraded") and degraded:
        raise RuntimeError(
            f"campaign degraded: {rps:.1f} rollouts/s under the "
            f"{floor:.1f} floor"
        )
    return summary


def run_batched(world, system, n_samples: int, ticks: int,
                overrides: dict[str, np.ndarray] | None = None,
                simulation_rate: float = 120.0,
                mesh: Mesh | None = None) -> BatchedResult:
    campaign = BatchedCampaign(
        world, system, n_samples, overrides, simulation_rate, mesh
    )
    return campaign.run(ticks)
