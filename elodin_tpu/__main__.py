"""The `elodin` CLI (parity: apps/elodin/src/cli/mod.rs — subcommands
editor | run | monte-carlo | render-server; the editor/render-server are
GUI-side and resolve to serving the DB they would attach to).

Usage:
    python -m elodin_tpu run <sim.py> [sim args...]
    python -m elodin_tpu bench <sim.py> [--ticks N]
    python -m elodin_tpu monte-carlo run <sim.py> --campaign c.toml --out DIR
    python -m elodin_tpu db ...          (elodin-db passthrough)
    python -m elodin_tpu editor <target>  (serves the DB; GUI not included)
"""

from __future__ import annotations

import runpy
import sys


def _run_sim(path: str, extra: list[str]) -> None:
    import os

    path = os.path.abspath(path)
    sys.path.insert(0, os.path.dirname(path))
    sys.argv = [path] + extra
    runpy.run_path(path, run_name="__main__")


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return
    cmd, rest = argv[0], argv[1:]

    if cmd in ("run", "bench", "components") and not rest:
        print(f"usage: python -m elodin_tpu {cmd} <sim.py> [args...]",
              file=sys.stderr)
        sys.exit(2)
    if cmd == "run":
        _run_sim(rest[0], ["run"] + rest[1:])
    elif cmd == "bench":
        _run_sim(rest[0], ["bench"] + rest[1:])
    elif cmd == "components":
        _run_sim(rest[0], ["components"])
    elif cmd == "db":
        from .db.__main__ import main as db_main

        db_main(rest)
    elif cmd == "monte-carlo":
        _monte_carlo(rest)
    elif cmd == "render-server":
        # reference render-server is the headless Bevy renderer
        # (apps/elodin/src/cli/mod.rs:23-36); no GUI stack in this build —
        # serve the target DB so a renderer elsewhere can attach
        from .db.__main__ import main as db_main

        db_main(["run"] + rest)
    elif cmd == "editor":
        # no GUI in this build: resolve the target the way the reference
        # editor does (apps/elodin/src/cli/editor.rs:125-211 — py file,
        # s10.toml, DB address, replay dir) and serve its DB so an
        # external editor can attach
        import re as _re

        target = rest[0] if rest else None
        if target and target.endswith(".py"):
            _run_sim(target, ["run"])
        elif target and target.endswith(".toml"):
            import time as _time

            from .s10 import load_toml, run_recipes

            sup = run_recipes(load_toml(target))
            try:
                while any(rp.poll() is None for rp in sup.running):
                    sup.tick()
                    _time.sleep(0.2)
            except KeyboardInterrupt:
                pass
            finally:
                sup.stop_all()
        elif target and _re.fullmatch(r"[\w.\-\[\]:]+:\d+", target):
            host, _, port = target.rpartition(":")
            print(
                f"{target} is a live database address — its web viewer is "
                f"at http://{host}:{int(port) + 1}/ (the native editor can "
                "also attach directly)"
            )
        else:
            from .db.__main__ import main as db_main

            db_main(["run", target] if target else ["run"])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}\n{__doc__}")


def _monte_carlo(rest: list[str]) -> None:
    import argparse
    import json

    p = argparse.ArgumentParser(prog="elodin monte-carlo")
    sub = p.add_subparsers(dest="mc_cmd", required=True)
    run_p = sub.add_parser("run")
    run_p.add_argument("sim")
    run_p.add_argument("--campaign", required=True)
    run_p.add_argument("--out", required=True)
    run_p.add_argument("--workers", type=int, default=1)
    run_p.add_argument("--max-ticks", type=int, default=None)
    run_p.add_argument("--batched", action="store_true",
                       help="run on-device (vmap) instead of per-process")
    run_p.add_argument("--resume", action="store_true")
    args = p.parse_args(rest)

    config = _load_config(args.campaign)
    if args.batched:
        raise SystemExit(
            "--batched campaigns are driven from Python (see "
            "elodin_tpu.monte_carlo.BatchedCampaign and "
            "examples/monte-carlo/batched.py); the CLI path runs processes"
        )
    from .monte_carlo import run_campaign

    records = run_campaign(
        args.sim, config, args.out, workers=args.workers,
        max_ticks=args.max_ticks, resume=args.resume,
    )
    ok = sum(1 for r in records if r.get("valid"))
    print(json.dumps({"total": len(records), "valid": ok}))


def _load_config(path: str) -> dict:
    import tomllib

    with open(path, "rb") as f:
        return tomllib.load(f)


if __name__ == "__main__":
    main()
