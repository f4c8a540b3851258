from sim import SIM_RATE_HZ, system, world

world().run(system(), simulation_rate=SIM_RATE_HZ)
