"""Falcon 9 RTLS mission: serve/bench/run entry
(reference: examples/falcon9/main.py — see sim.py for the mission model).

    python main.py bench --ticks 52000      # full mission, headless
    python main.py run --db-path out/db     # serve telemetry to elodin-db
    python batched.py 1024                  # dispersed campaign, on-device
"""

from sim import SIM_RATE_HZ, build

w, sys_ = build()
w.schematic(
    """
    coordinate frame=ENU lat=28.60839 lon=-80.60433 alt=3.0
    hsplit {
        viewport name=Viewport look_at="booster.world_pos" show_grid=#true
        vsplit {
            graph name="Altitude" eql="booster.world_pos"
            graph name="Phase" eql="booster.phase"
            graph name="Propellant" eql="booster.prop_kg"
        }
    }
    """
)
w.run(sys_, simulation_rate=SIM_RATE_HZ)
