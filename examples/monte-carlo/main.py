"""Process-mode entry for the landing campaign (the fallback path when a
sample needs external co-processes; parity: reference
examples/monte-carlo/main.py).  Reads dispersed parameters from the campaign
context, runs headless, and reports a score via el.monte_carlo.result."""

import elodin as el

from sim import DEFAULT_MAX_TICKS, PARAMS, SIMULATION_RATE_HZ, build

params = el.monte_carlo.params(el.monte_carlo.params_spec(**PARAMS))
world, system = build(params.as_overrides_dict())


def post_step(tick: int, ctx: el.StepContext) -> None:
    if tick >= DEFAULT_MAX_TICKS - 1:
        import numpy as np

        td = float(ctx.read_component("booster.touchdown_vz")[0])
        pos = np.asarray(ctx.read_component("booster.world_pos"))
        el.monte_carlo.result(
            touchdown_vz=td,
            landing_offset=float(np.linalg.norm(pos[4:6])),
            soft=bool(-5.0 < td < 0.0),
        )


world.run(
    system,
    simulation_rate=SIMULATION_RATE_HZ,
    max_ticks=DEFAULT_MAX_TICKS,
    post_step=post_step,
)
