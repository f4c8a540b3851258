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
