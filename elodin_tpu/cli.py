"""Sim argv subcommands: run | bench | components | params | plan
(libs/nox-py/src/world_builder.rs:92-119,543-860).

Every sim built on this SDK is simultaneously a CLI: ``python main.py bench
--ticks 100`` benchmarks it headless, ``components`` dumps its schema, and
``run`` serves it (with telemetry once the DB plane is attached).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_args(argv: list[str]):
    parser = argparse.ArgumentParser(prog="elodin-sim", add_help=True)
    sub = parser.add_subparsers(dest="command")

    run_p = sub.add_parser("run")
    run_p.add_argument("addr", nargs="?", default="[::]:2240")
    run_p.add_argument("--no-s10", action="store_true")
    run_p.add_argument("--liveness-port", type=int, default=None)
    run_p.add_argument("--optimize", action="store_true")

    bench_p = sub.add_parser("bench")
    bench_p.add_argument("--ticks", type=int, default=1000)
    bench_p.add_argument("--profile", action="store_true")
    bench_p.add_argument("--detail", action="store_true")

    sub.add_parser("components")
    sub.add_parser("params")

    plan_p = sub.add_parser("plan")
    plan_p.add_argument("out_dir")
    plan_p.add_argument("addr", nargs="?", default="[::]:2240")

    if argv and argv[0] not in ("run", "bench", "components", "params", "plan"):
        if argv[0] in ("-h", "--help"):
            # show the TOP-LEVEL help (subcommand list), not run's
            return parser.parse_args(argv)
        if argv[0].startswith("-") and argv[0] not in ("-",):
            parser.error(f"unknown option {argv[0]!r}")
        # bare `python main.py <addr>` serves like `run <addr>`
        argv = ["run"] + argv
    if not argv:
        argv = ["run"]
    return parser.parse_args(argv)


def run_cli(world, system, simulation_rate=120.0, generate_real_time=False,
            telemetry_rate=None, max_ticks=None, is_canceled=None,
            pre_step=None, post_step=None, db_path=None, backend="tpu"):
    import os

    # harness hook: let tools import a sim module whose main ends in
    # w.run(...) without executing it (bench verify, docs builds)
    if os.environ.get("ELODIN_SKIP_RUN") == "1":
        return None

    args = _parse_args(sys.argv[1:])
    cmd = args.command or "run"

    if cmd == "components":
        world.set_sim_time_step(1.0 / simulation_rate)
        meta, _cols = world.snapshot()
        out = []
        for name, comp in meta.components.items():
            out.append(
                {
                    "name": name,
                    "type": comp.ty.ty.value,
                    "shape": list(comp.ty.shape),
                    "metadata": comp.metadata,
                    "entities": [
                        meta.entity_metadata[e].name
                        if e in meta.entity_metadata
                        else str(e)
                        for e in meta.comp_entities[name]
                    ],
                }
            )
        print(json.dumps(out, indent=2, ensure_ascii=False))
        return None

    if cmd == "params":
        from . import monte_carlo

        print(monte_carlo.spec_json())
        return None

    if cmd == "plan":
        from . import monte_carlo

        spec = json.loads(monte_carlo.spec_json())
        variables = {
            k: {"dist": "fixed", "value": v.get("default")}
            for k, v in spec.get("params", {}).items()
        }
        monte_carlo.materialize_plan(
            {"monte_carlo": {"n_samples": 1, "variables": variables}},
            f"{args.out_dir}/plan.csv",
        )
        return None

    if cmd == "bench":
        exec_ = world.build(
            system,
            simulation_rate=simulation_rate,
            telemetry_rate=telemetry_rate,
        )
        exec_.record_history = False
        t0 = time.perf_counter()
        exec_.run(args.ticks, show_progress=False)
        _ = time.perf_counter() - t0
        profile = exec_.profile()
        tpt = exec_.ticks_per_telemetry
        print(f"= tick time:          {profile['tick']:.3f} ms (batch of {tpt} ticks)")
        print(f"build time:           {profile['build']:.3f} ms")
        print(f"real_time_factor:     {profile['real_time_factor']:.3f}")
        if args.profile:
            import pathlib

            out_dir = pathlib.Path(sys.argv[0]).resolve().parent / "profile_output"
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / "profile-metrics.json").write_text(
                json.dumps(
                    {
                        "build_time_ms": profile["build"],
                        "real_time_factor": profile["real_time_factor"],
                        "ticks": args.ticks,
                    },
                    indent=2,
                )
            )
            # HLO/graph dumps (parity: bench --profile FLOP/HLO analysis +
            # DOT graphs, world_builder.rs:890-1010)
            import jax as _jax

            lowered = _jax.jit(exec_._step).lower(exec_.cols)
            (out_dir / "step.stablehlo.txt").write_text(lowered.as_text())
            try:
                compiled = lowered.compile()
                (out_dir / "step.optimized_hlo.txt").write_text(
                    compiled.as_text()
                )
                cost = compiled.cost_analysis()
                if cost:
                    (out_dir / "cost-analysis.json").write_text(
                        json.dumps(
                            {k: v for k, v in cost.items()
                             if isinstance(v, (int, float))},
                            indent=2, sort_keys=True,
                        )
                    )
            except Exception:
                pass
        return exec_

    # -- run ---------------------------------------------------------------
    env_max = os.environ.get("ELODIN_MAX_TICKS")
    if env_max is not None:
        max_ticks = int(env_max) if max_ticks is None else min(max_ticks, int(env_max))

    db_path = db_path or os.environ.get("ELODIN_DB_PATH")
    if db_path:
        _capture_simulation_source(db_path)
    exec_ = world.build(
        system,
        simulation_rate=simulation_rate,
        telemetry_rate=telemetry_rate,
        max_ticks=max_ticks,
        db_path=db_path,
    )

    from .step_context import StepContext
    from .tick_metrics import Liveness, TickMetrics

    ctx = StepContext(exec_)
    metrics = TickMetrics()
    exec_.commit_hist = metrics.hist["commit"]
    liveness = Liveness(getattr(args, "liveness_port", None))
    dt = 1.0 / simulation_rate
    tick = 0
    paced_ticks = 0
    behind_deadline = 0  # paced cycles that missed their deadline
    wall_start = time.perf_counter()
    server = None
    try:
        from .db.server import serve_exec

        # ELODIN_RESUME=1: the DB is the checkpoint — latest stored rows
        # are copied back into device state before serving continues
        resume = os.environ.get("ELODIN_RESUME", "0") == "1"
        server = (
            serve_exec(exec_, args.addr, resume=resume)
            if cmd == "run"
            else None
        )
    except Exception as e:  # noqa: BLE001
        # keep simulating headless, but never silently: a bound port or
        # bad addr would otherwise lose ALL telemetry with no hint
        print(
            f"warning: telemetry server failed to start on "
            f"{getattr(args, 'addr', '?')}: {e}; running headless",
            file=sys.stderr,
        )
        server = None

    try:
        while max_ticks is None or tick < max_ticks:
            if is_canceled is not None and is_canceled():
                break
            if pre_step is not None:
                with metrics.phase("pre_step"):
                    pre_step(tick, ctx)
            t0 = time.perf_counter()
            with metrics.phase("run"):
                exec_.run(1, show_progress=False)
            tick += 1
            liveness.beat()
            if post_step is not None:
                with metrics.phase("post_step"):
                    post_step(tick - 1, ctx)
            if generate_real_time:
                with metrics.phase("pacing"):
                    elapsed = time.perf_counter() - t0
                    paced_ticks += 1
                    if elapsed < dt:
                        time.sleep(dt - elapsed)
                    else:
                        behind_deadline += 1
        # the reference sim keeps serving the DB after max_ticks
        # (impeller2_server.rs tick loop parks, server stays up); opt in via
        # ELODIN_KEEP_ALIVE so scripted runs still terminate
        if (
            server is not None
            and os.environ.get("ELODIN_KEEP_ALIVE", "0") == "1"
        ):
            while True:
                time.sleep(0.5)
    except KeyboardInterrupt:
        pass
    finally:
        liveness.stop()
        try:
            exec_.flush_telemetry()
        except Exception:
            pass
        if server is not None:
            server.stop()
        metrics.print_summary()
        wall = time.perf_counter() - wall_start
        metrics.write_summary_json(
            {
                "profile": exec_.profile(),
                "max_ticks": max_ticks,
                # pacing integrity for MC quality gates
                # (libs/monte-carlo/src/lib.rs:103-117)
                "paced_ticks": paced_ticks,
                "behind_deadline": behind_deadline,
                "behind_deadline_frac": (
                    behind_deadline / paced_ticks if paced_ticks else 0.0
                ),
                "real_time_factor_run": (
                    (tick * dt) / wall if wall > 0 else 0.0
                ),
            }
        )
    return exec_


def _capture_simulation_source(db_path: str) -> None:
    """Snapshot the sim's project .py sources into the DB
    (python/elodin/__init__.py:116-157): entrypoint + any loaded module under
    the project root, with a sha256 manifest."""
    import hashlib
    import json
    import pathlib
    import shutil
    import datetime

    entry = pathlib.Path(sys.argv[0]).resolve()
    if entry.suffix != ".py" or not entry.exists():
        return
    project_root = entry.parent
    sources = {entry}
    for mod in list(sys.modules.values()):
        f = getattr(mod, "__file__", None)
        if not f or not f.endswith(".py"):
            continue
        p = pathlib.Path(f)
        try:
            p = p.resolve()
        except OSError:
            continue
        if not p.exists():
            continue
        try:
            p.relative_to(project_root)
        except ValueError:
            continue
        if "__pycache__" in p.parts or "site-packages" in str(p):
            continue
        sources.add(p)

    source_root = pathlib.Path(db_path) / "simulation_source"
    files_root = source_root / "files"
    manifest_files = []
    for src_path in sorted(sources):
        rel = src_path.relative_to(project_root)
        dest = files_root / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src_path, dest)
        data = src_path.read_bytes()
        manifest_files.append(
            {
                "path": rel.as_posix(),
                "sha256": hashlib.sha256(data).hexdigest(),
                "size": len(data),
            }
        )
    source_root.mkdir(parents=True, exist_ok=True)
    (source_root / "manifest.json").write_text(
        json.dumps(
            {
                "version": 1,
                "entrypoint": entry.name,
                "project_root": str(project_root),
                "captured_at": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(),
                "files": manifest_files,
            },
            indent=2,
            sort_keys=True,
        )
        + "\n"
    )
