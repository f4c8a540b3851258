"""Runs the op-coverage sim through the full JAX -> XLA pipeline
(reference: examples/stablehlo/main.py bench mode for CI)."""

from sim import SIMULATION_RATE, system, world

w = world()
w.run(system(), simulation_rate=SIMULATION_RATE, max_ticks=100)
