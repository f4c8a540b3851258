"""Profile the three all-pairs gravity formulations on the current backend.

VERDICT-r2 asked for the MXU (matmul-form) distance computation to be tried
and measured against the Pallas displacement kernel and the XLA broadcast
form — this script is that measurement: throughput (pairs/s, in-graph loop
with host-read sync — block_until_ready is unreliable through the axon
tunnel) and accuracy vs the f64 broadcast reference on two scenes:

  - "cloud":  positions ~ O(1) extent at O(1) coordinates — the regime
              where the Gram expansion is numerically benign;
  - "orbit":  a thin shell at |x| ~ 7e6 m with ~km separations — the
              framework's real workload, where |x|^2 + |y|^2 - 2 x.y
              cancels catastrophically in f32.

Usage: python scripts/profile_pairwise.py [--sizes 4096,16384] [--reps 20]
Prints one JSON document; exit code 0 even when a variant fails (recorded
as an error string) so the profile is runnable on any backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from elodin_tpu.ops.pairwise import (
    pairwise_gravity_mxu,
    pairwise_gravity_reference,
    _pairwise_gravity_pallas,
)

G = 6.6743e-11


def make_scene(kind: str, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    if kind == "cloud":
        pos = rng.normal(0.0, 1.0, (n, 3))
        mass = rng.uniform(0.5, 2.0, n) * 1e10
    else:  # orbit: thin LEO-ish shell, km-scale separations at Mm coords
        r = 7.0e6 + rng.normal(0.0, 2e3, n)
        theta = rng.uniform(0, 2 * np.pi, n)
        phi = np.arccos(rng.uniform(-0.3, 0.3, n))
        pos = np.stack(
            [r * np.sin(phi) * np.cos(theta),
             r * np.sin(phi) * np.sin(theta),
             r * np.cos(phi)], axis=-1)
        mass = rng.uniform(0.5, 2.0, n) * 1e10
    return pos, mass


def timed_pairs_per_sec(fn, pos, mass, reps: int) -> float:
    """One jitted program evaluating the op `reps` times (summing outputs so
    nothing is dead-code-eliminated), timed by wall clock around a host read."""

    def loop(p, m):
        # thread the output back into the positions: an invariant fn(p, m)
        # body is legal for XLA while-loop invariant code motion to hoist,
        # which would time one eval + reps adds
        def body(_i, carry):
            pp, acc = carry
            out = fn(pp, m)
            return pp + out * 1e-30, acc + out

        _, acc = jax.lax.fori_loop(0, reps, body, (p, jnp.zeros_like(p)))
        return acc

    compiled = jax.jit(loop).lower(pos, mass).compile()
    out = compiled(pos, mass)
    _ = np.asarray(out)  # warm-up + true sync
    t0 = time.perf_counter()
    out = compiled(pos, mass)
    _ = np.asarray(out)
    wall = time.perf_counter() - t0
    n = pos.shape[0]
    return n * n * reps / wall


def max_rel_err(a, ref) -> float:
    a = np.asarray(a, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    scale = np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True), 1e-300)
    return float(np.max(np.linalg.norm(a - ref, axis=-1, keepdims=True) / scale))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,16384")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    variants = {
        "broadcast_xla": lambda p, m: pairwise_gravity_reference(p, m, G),
        "pallas_tiled": lambda p, m: _pairwise_gravity_pallas(p, m, G, 0.0),
        "mxu_matmul": lambda p, m: pairwise_gravity_mxu(p, m, G),
        "mxu_matmul_hi": lambda p, m: pairwise_gravity_mxu(
            p, m, G, precision=jax.lax.Precision.HIGHEST),
    }

    # committed-array probe: jax.default_backend() initializes every
    # registered plugin and hangs when the axon tunnel is wedged
    dev = next(iter(jnp.zeros(1).devices()))
    out: dict = {"backend": dev.platform,
                 "device": str(dev), "throughput": {}, "accuracy": {}}

    # throughput on the larger scene sizes, f32
    for n in sizes:
        pos_np, mass_np = make_scene("cloud", n)
        pos = jnp.asarray(pos_np, dtype=jnp.float32)
        mass = jnp.asarray(mass_np, dtype=jnp.float32)
        row = {}
        for name, fn in variants.items():
            try:
                row[name] = round(timed_pairs_per_sec(fn, pos, mass, args.reps), 1)
            except Exception as e:  # noqa: BLE001
                row[name] = f"error: {e}"
        out["throughput"][str(n)] = row

    # accuracy vs f64 broadcast at a fixed moderate size
    n = 2048
    for scene in ("cloud", "orbit"):
        pos_np, mass_np = make_scene(scene, n, seed=1)
        try:
            # the f64 reference itself can fail on backends without f64
            # (Mosaic/TPU); record it so throughput results still print
            ref = pairwise_gravity_reference(
                jnp.asarray(pos_np, dtype=jnp.float64),
                jnp.asarray(mass_np, dtype=jnp.float64), G)
        except Exception as e:  # noqa: BLE001
            out["accuracy"][scene + "_f32_max_rel_vs_f64"] = f"ref error: {e}"
            continue
        pos = jnp.asarray(pos_np, dtype=jnp.float32)
        mass = jnp.asarray(mass_np, dtype=jnp.float32)
        row = {}
        for name, fn in variants.items():
            try:
                row[name] = float(f"{max_rel_err(fn(pos, mass), ref):.3g}")
            except Exception as e:  # noqa: BLE001
                row[name] = f"error: {e}"
        out["accuracy"][scene + "_f32_max_rel_vs_f64"] = row

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
