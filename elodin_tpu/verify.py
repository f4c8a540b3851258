"""Dual-backend differential verification.

Parity: the reference's cranelift checkpoint verifier
(libs/nox-py/src/cranelift_compile.rs:70-85,127-153 and
cranelift_exec.rs:199,254): with ELODIN_CRANELIFT_DEBUG_DIR set, first-tick
inputs are checkpointed and XLA reference outputs computed for diffing.

Here the two backends are the TPU and the CPU interpreter of the SAME jax
program: ``verify_step`` runs one tick on each and reports per-component
max abs/rel error; ``checkpoint_first_tick`` saves inputs/outputs under
ELODIN_TPU_DEBUG_DIR for offline diffing.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np

from .six_dof import increment_sim_tick_system
from .system import Pipe, SystemBuilder, as_system

DEBUG_DIR_ENV = "ELODIN_TPU_DEBUG_DIR"


def _step_fn(meta, system):
    full = Pipe(increment_sim_tick_system, as_system(system))

    def step(state):
        b = SystemBuilder(meta, dict(state))
        full.call(b)
        return b.cols

    return step


def verify_step(world, system, rtol: float = 1e-6, atol: float = 1e-9,
                devices=None) -> dict:
    """Run one tick on every available backend and diff the outputs.

    Returns {component: {max_abs, max_rel}}; raises AssertionError when any
    component exceeds the tolerance."""
    meta, cols = world.snapshot()
    step = _step_fn(meta, system)

    backends = {}
    try:
        cpu = jax.devices("cpu")[0]
        backends["cpu"] = cpu
    except RuntimeError:
        pass
    for d in jax.devices():
        if d.platform != "cpu":
            backends[d.platform] = d
            break
    if len(backends) < 2:
        # single-backend environment: still verify determinism (run twice)
        out1 = jax.jit(step)(cols)
        out2 = jax.jit(step)({k: np.asarray(v) for k, v in cols.items()})
        report = _diff(out1, out2)
        _assert_tol(report, rtol, atol)
        return report

    outs = {}
    for name, dev in backends.items():
        placed = {k: jax.device_put(np.asarray(v), dev) for k, v in cols.items()}
        with jax.default_device(dev):
            outs[name] = jax.jit(step)(placed)
    names = list(outs)
    report = _diff(outs[names[0]], outs[names[1]])
    _assert_tol(report, rtol, atol)
    return report


def _diff(a: dict, b: dict) -> dict:
    report = {}
    for k in a:
        x = np.asarray(a[k], dtype=np.float64)
        y = np.asarray(b[k], dtype=np.float64)
        d = np.abs(x - y)
        scale = np.maximum(np.abs(x), np.abs(y))
        rel = np.where(scale > 0, d / np.maximum(scale, 1e-300), 0.0)
        report[k] = {
            "max_abs": float(d.max()) if d.size else 0.0,
            "max_rel": float(rel.max()) if rel.size else 0.0,
        }
    return report


def _assert_tol(report: dict, rtol: float, atol: float) -> None:
    bad = {
        k: v
        for k, v in report.items()
        if v["max_abs"] > atol and v["max_rel"] > rtol
    }
    if bad:
        raise AssertionError(f"backend mismatch beyond tolerance: {bad}")


def checkpoint_first_tick(exec_) -> str | None:
    """Save tick-0 inputs + tick-1 outputs for offline diffing when
    ELODIN_TPU_DEBUG_DIR is set (cranelift_exec.rs:199 pattern)."""
    debug_dir = os.environ.get(DEBUG_DIR_ENV)
    if not debug_dir:
        return None
    out = Path(debug_dir)
    out.mkdir(parents=True, exist_ok=True)
    inputs = {k: np.asarray(v) for k, v in exec_.cols.items()}
    np.savez(out / "tick0_inputs.npz", **inputs)
    step = exec_._step
    outputs = jax.jit(step)(exec_.cols)
    np.savez(out / "tick1_outputs.npz", **{k: np.asarray(v) for k, v in outputs.items()})
    (out / "manifest.json").write_text(
        json.dumps(
            {
                "components": sorted(inputs),
                "shapes": {k: list(v.shape) for k, v in inputs.items()},
            },
            indent=2,
        )
    )
    return str(out)
