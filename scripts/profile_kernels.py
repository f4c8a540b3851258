"""XLA-sufficiency profile for the non-pairwise hot ops (SURVEY §7.6:
"Pallas only after profiling").

Measures, on whatever backend is active, the achieved throughput and an
arithmetic-intensity-based roofline share for:

- EGM08 spherical-harmonic acceleration (deg 16/32/64 batched recursion)
- 1-D table interpolation (ops/interp.interp, aero-table shape)
- batched 6-dof RK4 step (models path, f64 and f32)

Rationale recorded alongside each number: these ops are either
bandwidth-trivial (interp), MXU-irrelevant scalar-heavy recursions whose
fusion XLA already handles (EGM08 — the scan over degrees is sequential by
construction, a Pallas kernel cannot change the dependency chain), or
already one fused XLA program (RK4).  The pairwise kernel is profiled
separately (profile_pairwise.py), where a Pallas tiling IS load-bearing.

Usage: PYTHONPATH=. python scripts/profile_kernels.py [--reps 50]
Prints one JSON object; exit 0 even if a section errors (recorded).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _backend() -> str:
    """Platform of the committed default device — jax.default_backend()
    initializes every registered plugin and hangs if the axon tunnel is
    wedged, even under JAX_PLATFORMS=cpu."""
    return next(iter(jnp.zeros(1).devices())).platform


def timed(fn, *args, reps: int):
    """One jitted program evaluating fn `reps` times with a dependency
    chain (outputs summed into the accumulator) timed around a host read —
    per-call dispatch over the axon tunnel measures RTT, not kernel time."""

    def loop(x0, *rest):
        # thread the accumulator back into the first argument: an
        # invariant fn(*xs) body is legal for XLA's while-loop invariant
        # code motion to hoist, which would time one eval + reps adds
        def body(_i, carry):
            x, acc = carry
            out = jnp.sum(fn(x, *rest))
            return x + out.astype(x.dtype) * 1e-30, acc + out

        acc0 = jnp.zeros(
            (), jax.eval_shape(lambda *a: jnp.sum(fn(*a)), x0, *rest).dtype
        )
        (_, acc), = (jax.lax.fori_loop(0, reps, body, (x0, acc0)),)
        return acc

    compiled = jax.jit(loop).lower(*args).compile()
    _ = np.asarray(compiled(*args))  # warm + sync
    t0 = time.perf_counter()
    _ = np.asarray(compiled(*args))
    return (time.perf_counter() - t0) / reps


def profile_egm08(out: dict, reps: int) -> None:
    from elodin_tpu.gravity.egm08 import EGM08

    # the degree recursion is brutally serial on a 1-core CPU host; size
    # the batch by backend so the profile finishes everywhere
    n = 16_384 if _backend() != "cpu" else 1_024
    rng = np.random.default_rng(0)
    r = rng.normal(size=(n, 3))
    r = r / np.linalg.norm(r, axis=1, keepdims=True) * 6.778e6  # ~400 km
    r = jnp.asarray(r)
    for deg in (16, 32, 64):
        try:
            field = EGM08(max_degree=deg)
            fn = jax.vmap(field.acceleration)
            dt = timed(fn, r, reps=reps)
            # recursion flop estimate: ~30 flops per (l, m) pair per point
            flops = 30.0 * (deg * (deg + 1) / 2) * n
            out[f"egm08_deg{deg}_evals_per_sec"] = round(n / dt, 1)
            out[f"egm08_deg{deg}_gflops"] = round(flops / dt / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            out[f"egm08_deg{deg}_error"] = str(e)


def profile_interp(out: dict, reps: int) -> None:
    from elodin_tpu.ops.interp import interp

    n = 65_536 if _backend() != "cpu" else 8_192
    xp = jnp.linspace(0.0, 10.0, 64)  # aero-table scale
    fp = jnp.sin(xp)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 10, n))
    try:
        fn = lambda q: interp(q, xp, fp)  # noqa: E731
        dt = timed(fn, x, reps=reps)
        # bandwidth-bound: 1 read + 1 write of n elements per eval
        bytes_moved = 2 * n * x.dtype.itemsize
        out["interp1d_lookups_per_sec"] = round(n / dt, 1)
        out["interp1d_gbps"] = round(bytes_moved / dt / 1e9, 2)
    except Exception as e:  # noqa: BLE001
        out["interp1d_error"] = str(e)


def profile_rk4(out: dict, reps: int) -> None:
    from elodin_tpu.models import build_batched_sixdof
    from elodin_tpu.six_dof import increment_sim_tick_system
    from elodin_tpu.system import Pipe, SystemBuilder, as_system

    n = 8_192 if _backend() != "cpu" else 512
    world, system = build_batched_sixdof(n)
    meta, cols0 = world.snapshot()
    full = Pipe(increment_sim_tick_system, as_system(system))

    for dtype_name in ("f64", "f32"):
        try:
            cols = (
                cols0
                if dtype_name == "f64"
                else {
                    k: v.astype("float32") if v.dtype.kind == "f" else v
                    for k, v in cols0.items()
                }
            )

            def step(state):
                b = SystemBuilder(meta, dict(state))
                full.call(b)
                return b.cols

            def chained(state):
                def body(_i, s):
                    return step(s)

                return jax.lax.fori_loop(0, reps, body, dict(state))["world_pos"]

            compiled = jax.jit(chained).lower(cols).compile()
            _ = np.asarray(compiled(cols))
            t0 = time.perf_counter()
            _ = np.asarray(compiled(cols))
            dt = (time.perf_counter() - t0) / reps
            out[f"rk4_{dtype_name}_entity_steps_per_sec"] = round(n / dt, 1)
        except Exception as e:  # noqa: BLE001
            out[f"rk4_{dtype_name}_error"] = str(e)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()
    # derive backend identity from a committed array: jax.default_backend()
    # eagerly initializes EVERY registered plugin, and a wedged axon tunnel
    # hangs that enumeration even under JAX_PLATFORMS=cpu
    dev = next(iter(jnp.zeros(1).devices()))
    out: dict = {
        "backend": dev.platform,
        "device": str(dev),
        "verdict": (
            "EGM08 is a sequential degree recursion (Pallas cannot shorten "
            "the dependency chain), interp is bandwidth-trivial at aero-"
            "table sizes, RK4 is one fused XLA program - no Pallas kernel "
            "is load-bearing here; pairwise (profile_pairwise.py) is."
        ),
    }
    import sys

    for stage in (profile_egm08, profile_interp, profile_rk4):
        stage(out, args.reps)
        print(f"# {stage.__name__} done", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
