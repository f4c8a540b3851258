"""Pure-JAX cube-sat stepping via World.to_jax / JaxSim
(parity: examples/cube-sat-pysim/main.py — the reference steps the cube-sat
world from Python for RL-style analysis workflows; this version uses the
JaxSim surface: functional state dict, fori_loop-batched stepping, direct
column reads — no DB, no serve loop).

Run: python main.py   (prints the detumble trace; no GUI)
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "cube-sat")
)

import numpy as np
from main import build_system, build_world  # cube-sat example

CHUNK = 400
CHUNKS = 6


def run():
    sim = build_world().to_jax(build_system())
    omegas = []
    for _ in range(CHUNKS):
        sim.step(CHUNK)  # one device dispatch per chunk (lax.fori_loop)
        vel = np.asarray(sim.get_state("world_vel", "ore_sat"))
        omegas.append(float(np.linalg.norm(vel[:3])))
    print("angular speed trace (rad/s):", [f"{o:.4f}" for o in omegas])
    assert omegas[-1] < omegas[0] * 0.9, "cube-sat should be detumbling"
    return omegas


if __name__ == "__main__":
    run()
