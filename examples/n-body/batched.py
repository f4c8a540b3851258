"""N-body at TPU scale: thousands of gravitating bodies in one world.

The reference's n-body example folds a complete digraph per entity —
fine at a dozen bodies, impossible at thousands (process-bound, O(N^2)
scalar work).  Here the same world runs with the entity axis batched in
HBM and all-pairs gravity computed by the tiled Pallas sweep
(elodin_tpu.ops.pairwise), optionally sharded over a device mesh.

Usage:  python batched.py [n_bodies] [ticks]
"""

import json
import sys

import numpy as np

import jax

from elodin_tpu.models.nbody import build_nbody, build_system
from elodin_tpu.system import build_step


def run(n_bodies: int, ticks: int, use_kernel: bool = True,
        dtype=np.float32) -> dict:
    import jax.numpy as jnp
    import time

    world = build_nbody(n_bodies, seed=2, dtype=dtype)
    world.set_sim_time_step(60.0)
    meta, cols = world.snapshot()
    # THE canonical tick composition (system.py build_step) — hand-rolling
    # it here could silently diverge from every other runner
    step = build_step(meta, build_system(60.0, use_kernel=use_kernel))

    def prog(state):
        return jax.lax.fori_loop(0, ticks, lambda _i, s: step(s), state)

    state = {
        k: jnp.asarray(v if v.dtype.kind != "f" else v.astype(dtype))
        for k, v in cols.items()
    }
    mass = np.asarray(state["inertia"])[:, 6]
    p0 = (mass[:, None] * np.asarray(state["world_vel"])[:, 3:]).sum(axis=0)
    fn = jax.jit(prog, donate_argnums=0).lower(state).compile()
    state = fn(state)
    _ = np.asarray(state["world_pos"])  # warm + sync
    t0 = time.perf_counter()
    state = fn(state)
    pos = np.asarray(state["world_pos"])
    wall = time.perf_counter() - t0
    assert np.isfinite(pos).all()

    # physics sanity: total momentum is conserved by pair-force symmetry
    # (drift measured against the initial total, which is itself nonzero)
    vel = np.asarray(state["world_vel"])[:, 3:]
    p = (mass[:, None] * vel).sum(axis=0) - p0
    p_scale = float(np.abs(mass[:, None] * vel).sum())
    return {
        "n_bodies": n_bodies,
        "ticks": ticks,
        "wall_s": round(wall, 4),
        "pairs_per_sec": round(n_bodies * n_bodies * ticks / wall, 1),
        "entity_steps_per_sec": round(n_bodies * ticks / wall, 1),
        "momentum_drift_rel": float(np.abs(p).max() / max(p_scale, 1e-30)),
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(json.dumps(run(n, ticks)))
