"""Dispersed landing campaign, batched on-device.

The TPU replacement for the reference's process-per-sample campaign runner
(libs/monte-carlo/src/lib.rs:1193): N rollouts = ONE vmapped XLA program.
Usage:  python batched.py [n_samples] [ticks]
"""

import json
import sys

import numpy as np

from elodin_tpu.monte_carlo import BatchedCampaign, sample_plan

from sim import (DEFAULT_MAX_TICKS, PARAMS, PROPELLANT0_KG,
                 SIMULATION_RATE_HZ, build)


def run_campaign(n_samples: int, ticks: int = DEFAULT_MAX_TICKS, seed: int = 0,
                 mesh=None):
    variables = {
        name: {"dist": "uniform", "min": p.min, "max": p.max}
        for name, p in PARAMS.items()
        if p.min is not None
    }
    draws = sample_plan(variables, n_samples, method="lhs", seed=seed)

    world, system = build(None)  # template world with default params
    wet_extra = PROPELLANT0_KG  # initial propellant load
    overrides = {
        "booster.world_pos": np.concatenate(
            [
                np.tile([0.0, 0.0, 0.0, 1.0, 0.0, 0.0], (n_samples, 1)),
                draws["start_altitude"][:, None],
            ],
            axis=1,
        ),
        "booster.world_vel": np.concatenate(
            [
                np.tile([0.0, 0.0, 0.0, 3.0, 0.0], (n_samples, 1)),
                draws["start_vz"][:, None],
            ],
            axis=1,
        ),
        "booster.wind": np.stack(
            [draws["wind_x"], np.zeros(n_samples), np.zeros(n_samples)], axis=1
        ),
        "booster.thrust_eff": draws["thrust_eff"],
        "booster.inertia": np.concatenate(
            [
                np.tile(draws["dry_mass"][:, None] + wet_extra, (1, 3)),
                np.zeros((n_samples, 3)),
                draws["dry_mass"][:, None] + wet_extra,
            ],
            axis=1,
        ),
    }
    campaign = BatchedCampaign(
        world, system, n_samples, overrides,
        simulation_rate=SIMULATION_RATE_HZ, mesh=mesh,
    )
    result = campaign.run(ticks)

    touchdown_vz = result.component("booster.touchdown_vz")
    final_pos = result.component("booster.world_pos")[:, 4:]
    landed = touchdown_vz < 0.0
    soft = np.logical_and(landed, touchdown_vz > -5.0)
    return {
        "n_samples": n_samples,
        "ticks": ticks,
        "wall_s": result.wall_seconds,
        "rollouts_per_s": result.rollouts_per_second,
        "landed_frac": float(landed.mean()),
        "soft_landing_frac": float(soft.mean()),
        "mean_touchdown_vz": float(touchdown_vz[landed].mean()) if landed.any() else None,
        "mean_landing_offset_m": float(
            np.linalg.norm(final_pos[landed][:, :2], axis=1).mean()
        )
        if landed.any()
        else None,
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_MAX_TICKS
    out = run_campaign(n, ticks)
    print(json.dumps(out, indent=2))
