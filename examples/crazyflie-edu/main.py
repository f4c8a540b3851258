from sim import SIM_TIME_STEP, system, world

world().run(system(), simulation_rate=1.0 / SIM_TIME_STEP)
