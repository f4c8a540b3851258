"""s10-style process orchestration recipes (libs/s10/src/recipe.rs).

The reference's s10 launches sidecar processes (SITL controllers, render
servers) next to a sim and supervises them with restart policies, readiness
probes, and a liveness heartbeat.  This Python implementation keeps the
recipe model and subprocess supervision; the TPU engine itself never needs
process-per-sample (Monte Carlo batches on-device), so recipes only serve
external co-processes.
"""

from __future__ import annotations

import os
import shlex
import signal
import subprocess
import time
from dataclasses import dataclass, field


@dataclass
class ProcessRecipe:
    name: str
    cmd: str
    args: list[str] = field(default_factory=list)
    cwd: str | None = None
    env: dict[str, str] = field(default_factory=dict)
    restart_policy: str = "never"  # never | on-failure | always
    ready_timeout: float | None = None

    def spawn(self) -> "RunningProcess":
        env = dict(os.environ)
        env.update(self.env)
        proc = subprocess.Popen(
            [self.cmd, *self.args],
            cwd=self.cwd,
            env=env,
            start_new_session=True,
        )
        return RunningProcess(self, proc)


@dataclass
class SimRecipe:
    name: str
    path: str
    addr: str = "[::]:2240"
    optimize: bool = False
    env: dict[str, str] = field(default_factory=dict)

    def spawn(self) -> "RunningProcess":
        import sys

        recipe = ProcessRecipe(
            name=self.name,
            cmd=sys.executable,
            args=[self.path, "run", self.addr],
            env=self.env,
        )
        return recipe.spawn()


@dataclass
class GroupRecipe:
    name: str
    recipes: list = field(default_factory=list)


class RunningProcess:
    def __init__(self, recipe: ProcessRecipe, proc: subprocess.Popen):
        self.recipe = recipe
        self.proc = proc

    def poll(self):
        return self.proc.poll()

    def stop(self, timeout: float = 5.0) -> None:
        if self.proc.poll() is not None:
            return
        try:
            os.killpg(os.getpgid(self.proc.pid), signal.SIGTERM)
        except ProcessLookupError:
            return
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self.proc.poll() is not None:
                return
            time.sleep(0.05)
        try:
            os.killpg(os.getpgid(self.proc.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass


class PyRecipe:
    """Factory matching the reference's `el.s10.PyRecipe` bindings
    (libs/nox-py/src/s10.rs)."""

    def __init__(self, inner):
        self.inner = inner
        self.name = inner.name

    @staticmethod
    def process(name: str, cmd: str, args: list[str] | None = None,
                cwd: str | None = None, env: dict | None = None) -> "PyRecipe":
        if args is None and " " in cmd:
            parts = shlex.split(cmd)
            cmd, args = parts[0], parts[1:]
        return PyRecipe(
            ProcessRecipe(
                name=name, cmd=cmd, args=list(args or []), cwd=cwd,
                env=dict(env or {}),
            )
        )

    @staticmethod
    def sim(name: str, path: str, addr: str = "[::]:2240") -> "PyRecipe":
        return PyRecipe(SimRecipe(name=name, path=path, addr=addr))

    def to_json(self) -> str:
        import dataclasses
        import json

        return json.dumps(dataclasses.asdict(self.inner))

    def spawn(self) -> RunningProcess:
        return self.inner.spawn()


class Supervisor:
    """Minimal recipe supervisor with restart policies
    (libs/s10/src/lib.rs run loop)."""

    def __init__(self):
        self.running: list[RunningProcess] = []

    def start(self, recipes) -> None:
        for r in recipes:
            obj = r.inner if isinstance(r, PyRecipe) else r
            if hasattr(obj, "spawn"):
                self.running.append(obj.spawn())

    def tick(self) -> None:
        for i, rp in enumerate(self.running):
            code = rp.poll()
            if code is None:
                continue
            policy = getattr(rp.recipe, "restart_policy", "never")
            if policy == "always" or (policy == "on-failure" and code != 0):
                self.running[i] = rp.recipe.spawn()

    def stop_all(self) -> None:
        for rp in self.running:
            rp.stop()
        self.running.clear()


# -- TOML recipes + CLI (parity: s10 binary loading s10.toml,
# libs/s10/src/recipe.rs serde with tag = "type") ---------------------------


def load_toml(path: str) -> dict:
    """Parse an s10.toml into {name: recipe} (Recipe enum tagged by
    `type` = process | sim | group)."""
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    recipes = {}
    for name, spec in data.get("recipes", data).items():
        if not isinstance(spec, dict):
            continue
        recipes[name] = _recipe_from_dict(name, spec)
    return recipes


def _recipe_from_dict(name: str, spec: dict):
    ty = spec.get("type", "process")
    if ty == "process":
        return ProcessRecipe(
            name=name,
            cmd=spec["cmd"],
            args=[str(a) for a in spec.get("args", [])],
            cwd=spec.get("cwd"),
            env={k: str(v) for k, v in spec.get("env", {}).items()},
            restart_policy=spec.get("restart_policy", "never"),
        )
    if ty == "sim":
        return SimRecipe(
            name=name,
            path=spec["path"],
            addr=spec.get("addr", "[::]:2240"),
            env={k: str(v) for k, v in spec.get("env", {}).items()},
        )
    if ty == "group":
        return GroupRecipe(
            name=name,
            recipes=[
                _recipe_from_dict(n, s)
                for n, s in spec.get("recipes", {}).items()
            ],
        )
    raise ValueError(f"unknown recipe type {ty!r} for {name!r}")


def run_recipes(recipes, watch: bool = False, poll: float = 0.2) -> Supervisor:
    sup = Supervisor()
    flat = []
    for r in recipes.values() if isinstance(recipes, dict) else recipes:
        if isinstance(r, GroupRecipe):
            flat.extend(r.recipes)
        else:
            flat.append(r)
    sup.start(flat)
    return sup


def main(argv=None) -> None:
    import argparse
    import time as _time

    p = argparse.ArgumentParser(prog="s10")
    sub = p.add_subparsers(dest="cmd", required=True)
    run_p = sub.add_parser("run")
    run_p.add_argument("config", nargs="?", default="s10.toml")
    run_p.add_argument("--once", action="store_true",
                       help="exit when every recipe has exited")
    args = p.parse_args(argv)

    recipes = load_toml(args.config)
    sup = run_recipes(recipes)
    try:
        while True:
            sup.tick()
            if args.once and all(rp.poll() is not None for rp in sup.running):
                break
            _time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    finally:
        sup.stop_all()


if __name__ == "__main__":
    main()
