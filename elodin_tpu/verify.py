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
import math
import os
from pathlib import Path

import jax
import numpy as np

from .system import build_step as _step_fn  # noqa: F401 (canonical step)

DEBUG_DIR_ENV = "ELODIN_TPU_DEBUG_DIR"


def verify_step(world, system, rtol: float = 1e-6, atol: float = 1e-6,
                devices=None) -> dict:
    """Run one tick on every available backend and diff the outputs.

    Backend pairing is explicit: CPU is always the reference side, and the
    accelerator side is the first device of the default (non-CPU) backend —
    pass ``devices=(ref, test)`` to override.  Returns
    {component: {max_abs, max_rel}}; raises AssertionError when any
    component exceeds ``max_abs > atol + rtol * scale`` (allclose semantics —
    a large relative error on a tiny value only passes if under atol).

    ``atol`` defaults to ``rtol``: "matching to 1e-6" is the standard ODE
    mixed-error norm (scipy ``solve_ivp`` semantics, atol == rtol) — every
    element must agree to 1e-6 absolute OR 1e-6 relative.  The absolute
    floor exists for elements passing through zero (e.g. the lateral accel
    of a rocket at liftoff is ~1e-4 of the axial ~100 m/s^2 component;
    demanding 1e-9 *absolute* of it would gate on bits that carry no
    physical information while the trajectory itself matches to 1e-12)."""
    meta, cols = world.snapshot()
    step = _step_fn(meta, system)

    backends = {}
    if devices is not None:
        ref, test = devices
        backends = {"ref": ref, "test": test}
    else:
        try:
            backends["cpu"] = jax.devices("cpu")[0]
        except RuntimeError:
            pass
        default = jax.devices()[0]
        if default.platform != "cpu":
            backends[default.platform] = default
    if len(backends) < 2:
        # single-backend environment: still verify determinism (run twice)
        out1 = jax.jit(step)(cols)
        out2 = jax.jit(step)({k: np.asarray(v) for k, v in cols.items()})
        report = _diff(out1, out2, rtol)
        _assert_tol(report, rtol, atol)
        return report

    outs = {}
    for name, dev in backends.items():
        placed = {k: jax.device_put(np.asarray(v), dev) for k, v in cols.items()}
        with jax.default_device(dev):
            outs[name] = jax.jit(step)(placed)
    names = list(outs)
    report = _diff(outs[names[0]], outs[names[1]], rtol)
    _assert_tol(report, rtol, atol)
    return report


def _diff(a: dict, b: dict, rtol: float = 1e-6) -> dict:
    report = {}
    for k in a:
        x = np.asarray(a[k], dtype=np.float64)
        y = np.asarray(b[k], dtype=np.float64)
        d = np.abs(x - y)
        scale = np.maximum(np.abs(x), np.abs(y))
        rel = np.where(scale > 0, d / np.maximum(scale, 1e-300), 0.0)
        # standard ODE-solver mixed error norm |x-y| / (1 + |y|) with
        # atol == rtol: "matching to 1e-6" means every element is within
        # 1e-6 absolute plus 1e-6 relative.  Pure max_rel is meaningless for
        # elements that sit at rounding-noise zero (a 4e-18 wobble on a
        # quat component whose true value is 0 is not a 78% error).
        metric_rel = float((d / (1.0 + scale)).max()) if d.size else 0.0
        report[k] = {
            "max_abs": float(d.max()) if d.size else 0.0,
            "max_rel": float(rel.max()) if rel.size else 0.0,
            "metric_rel": metric_rel,
            # per-element |x-y| - rtol*scale, maxed; > atol means some
            # element violates allclose(atol, rtol)
            "max_excess": float((d - rtol * scale).max()) if d.size else 0.0,
        }
    return report


def _assert_tol(report: dict, rtol: float, atol: float) -> None:
    """allclose semantics: a component fails when any element has
    ``|x - y| > atol + rtol * max(|x|, |y|)`` — a huge relative error on a
    tiny value is only excused while it stays under atol
    (scripts/ci/baseline/tolerances.json per-metric rigor).

    NaN excess (one backend NaN/Inf where the other is finite — the worst
    divergence class) FAILS: ``NaN > atol`` is False, so the naive
    comparison would wave exactly that through."""
    bad = {
        k: v for k, v in report.items()
        if v["max_excess"] > atol or math.isnan(v["max_excess"])
    }
    if bad:
        raise AssertionError(f"backend mismatch beyond tolerance: {bad}")


def verify_trajectory(world, system, ticks: int = 100, rtol: float = 1e-6,
                      atol: float = 1e-6, simulation_rate: float | None = None,
                      dynamic_trip: bool = False) -> dict:
    """Run ``ticks`` ticks of the same jitted program on the accelerator and
    on CPU f64 and diff the FINAL state — the BASELINE.json "trajectories
    matching CPU to 1e-6" gate, following the cranelift checkpoint-verifier
    pattern (libs/nox-py/src/cranelift_compile.rs:70-85).  Tolerance
    semantics are ``verify_step``'s: per-element
    ``|x - y| <= atol + rtol * max(|x|, |y|)`` with atol == rtol == 1e-6
    (the ODE mixed-error norm — see ``verify_step`` for why the absolute
    floor is 1e-6, not tighter).

    Returns the per-component report plus an overall ``max_rel`` summary; if
    no non-CPU backend exists the run degenerates to a determinism check.

    ``dynamic_trip=True`` passes the tick count as a runtime argument, so
    the loop CANNOT be unrolled by the compiler: the axon remote compiler
    unrolls static-trip fori_loops, making cold-compile time scale with
    ``ticks`` (observed ~1.3 s/tick through the tunnel) — the dynamic form
    compiles the body once (~15 s cold) regardless of ticks.  Same math,
    same gate; used by bench.py's budget-critical verify_small stage.
    """
    import jax.numpy as jnp

    if simulation_rate is not None:
        world.set_sim_time_step(1.0 / simulation_rate)
    meta, cols = world.snapshot()
    step = _step_fn(meta, system)

    if dynamic_trip:
        # the trip count must be a traced ARGUMENT at the jit boundary (a
        # closed-over or nested-jit constant would fold and unroll anyway)
        def run_n(state, n):
            return jax.lax.fori_loop(0, n, lambda _i, s: step(s), state)

        def execute(placed):
            return jax.jit(run_n)(placed, jnp.int32(ticks))
    else:
        def run(state):
            return jax.lax.fori_loop(0, ticks, lambda _i, s: step(s), state)

        def execute(placed):
            return jax.jit(run)(placed)

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    default = jax.devices()[0]
    accel = default if default.platform != "cpu" else None

    outs = {}
    for name, dev in (("cpu", cpu), ("accel", accel)):
        if dev is None:
            continue
        placed = {k: jax.device_put(np.asarray(v), dev) for k, v in cols.items()}
        with jax.default_device(dev):
            out = execute(placed)
            jax.block_until_ready(out)
        outs[name] = {k: np.asarray(v) for k, v in out.items()}
    if len(outs) < 2:  # single-backend: determinism re-run
        only = next(iter(outs.values())) if outs else None
        placed = {k: np.asarray(v) for k, v in cols.items()}
        out2 = execute(placed)
        outs = {"a": only, "b": {k: np.asarray(v) for k, v in out2.items()}}
    report = _diff(outs[next(iter(outs))], outs[list(outs)[-1]], rtol)
    report["_summary"] = {
        "max_rel": max(v["max_rel"] for k, v in report.items() if k != "_summary"),
        "metric_rel": max(v["metric_rel"] for k, v in report.items() if k != "_summary"),
        "max_excess": max(v["max_excess"] for k, v in report.items() if k != "_summary"),
        "ticks": ticks,
        "backends": list(outs),
    }
    _assert_tol({k: v for k, v in report.items() if k != "_summary"}, rtol, atol)
    return report


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
