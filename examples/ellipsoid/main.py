from sim import SIM_TIME_STEP, system, world

w, _body = world()
w.run(system(), simulation_rate=1.0 / SIM_TIME_STEP)
