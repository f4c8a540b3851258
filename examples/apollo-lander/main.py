"""Apollo-style lunar powered descent with ZEM/ZEV guidance.

Parity target: reference examples/apollo-lander (host-side guidance via
post_step callbacks).  TPU-first difference: the guidance law runs
*in-graph* — zero-effort-miss/zero-effort-velocity terms are computed inside
the jitted tick, so a dispersed Monte Carlo over initial conditions batches
the whole guided descent on device."""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
from jax.numpy import linalg as la

SIM_RATE = 50.0
DT = 1.0 / SIM_RATE

G_MOON = 1.62
DRY_MASS = 4_700.0
FUEL0 = 8_200.0
MAX_THRUST = 45_000.0  # descent engine, N
ISP = 311.0
G0 = 9.81

TARGET = jnp.array([0.0, 0.0, 0.0])
T_GO_MIN = 2.0

Fuel = ty.Annotated[jax.Array, el.Component("fuel", el.ComponentType.F64)]
Throttle = ty.Annotated[jax.Array, el.Component("throttle", el.ComponentType.F64)]
TGo = ty.Annotated[jax.Array, el.Component("t_go", el.ComponentType.F64)]
Landed = ty.Annotated[jax.Array, el.Component("landed_vz", el.ComponentType.F64)]
LandedVlat = ty.Annotated[
    jax.Array, el.Component("landed_vlat", el.ComponentType.F64)
]


@el.dataclass
class Lander(el.Archetype):
    fuel: Fuel = field(default_factory=lambda: jnp.float64(FUEL0))
    throttle: Throttle = field(default_factory=lambda: jnp.float64(0.0))
    t_go: TGo = field(default_factory=lambda: jnp.float64(110.0))
    landed_vz: Landed = field(default_factory=lambda: jnp.float64(0.0))
    landed_vlat: LandedVlat = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def zem_zev_guidance(
    pos: el.WorldPos, vel: el.WorldVel, inertia: el.Inertia, fuel: Fuel,
    t_go_state: TGo,
) -> tuple[Throttle, TGo, el.Force]:
    """ZEM/ZEV guidance: a = 6*ZEM/t_go^2 - 2*ZEV/t_go - g with the classic
    counting-down time-to-go (fixed-final-time formulation)."""
    r = pos.linear()
    v = vel.linear()
    m = inertia.mass()
    g = jnp.array([0.0, 0.0, -G_MOON])

    t_go = jnp.maximum(t_go_state, T_GO_MIN)

    zem = TARGET - (r + v * t_go + 0.5 * g * t_go**2)
    zev = jnp.array([0.0, 0.0, -1.0]) - (v + g * t_go)
    # optimal thrust acceleration is exactly 6 ZEM/t^2 - 2 ZEV/t: gravity
    # is already inside the ZEM/ZEV drift prediction AND applied as its
    # own force below — subtracting g here double-compensated it, flying
    # a biased-high trajectory that wasted fuel
    a_cmd = 6.0 * zem / t_go**2 - 2.0 * zev / t_go

    # terminal phase: below 300 m track a feasibility-limited velocity
    # funnel vz = -0.09 z (decel demand k^2 z stays under the lunar T/W)
    z = r[2]
    # lateral-cleanup hold (the falcon9 lesson): while the horizontal
    # offset is still large below 80 m, slow the funnel so the lateral
    # loop finishes closing before the fade levels the lander — fuel is
    # plentiful, time near the deck is the scarce resource
    hold = jnp.clip(1.0 - (la.norm(r[:2]) - 3.0) / 40.0, 0.25, 1.0)
    # blend the hold in over 80->60 m: a hard step in vz_target saturates
    # the engine vertically and collapses the lateral budget to ~0 for the
    # catch-up second, exactly on the high-offset samples the hold saves
    funnel_scale = 1.0 + (hold - 1.0) * jnp.clip((80.0 - z) / 20.0, 0.0, 1.0)
    vz_target = -jnp.maximum(1.0, 0.09 * z * funnel_scale)
    # Position-chase fades out below ~60 m: a first-order chase of k_p*r
    # commands v_lat ~ (k_p/k_d)*r all the way down and lands carrying it
    # (the falcon9 lesson) — near the deck only the damping term remains,
    # so lateral velocity decays to ~0 before the legs touch.  Vertical
    # gets thrust PRIORITY: the lateral demand is clipped to the budget
    # left after the sink-rate loop, otherwise a large residual offset
    # saturates the engine sideways and the vehicle falls through the
    # funnel.
    k_pos = 0.10 * jnp.clip((z - 4.0) / 45.0, 0.0, 1.0)
    a_vert = G_MOON + 1.5 * (vz_target - v[2])
    a_max = MAX_THRUST / m
    lat_budget = 0.9 * jnp.sqrt(
        jnp.maximum(a_max**2 - a_vert**2, 1e-6)
    )
    a_lat = -k_pos * r[:2] - 0.5 * v[:2]
    lat_mag = la.norm(a_lat)
    a_lat = a_lat * jnp.minimum(1.0, lat_budget / jnp.maximum(lat_mag, 1e-9))
    a_term = jnp.concatenate([a_lat, a_vert[None]])
    terminal = z < 400.0
    a_total = jnp.where(terminal, a_term, a_cmd)

    f_cmd = a_total * m
    f_mag = la.norm(f_cmd)
    throttle = jnp.clip(f_mag / MAX_THRUST, 0.0, 1.0)
    throttle = jnp.where(fuel <= 0.0, 0.0, throttle)
    # thrust only when above ground
    throttle = jnp.where(z > 0.05, throttle, 0.0)
    direction = f_cmd / jnp.maximum(f_mag, 1.0)
    force = el.SpatialForce(
        linear=direction * throttle * MAX_THRUST + g * m
    )
    return throttle, jnp.maximum(t_go_state - DT, T_GO_MIN), force


@el.map
def burn_fuel(throttle: Throttle, fuel: Fuel, inertia: el.Inertia) -> tuple[Fuel, el.Inertia]:
    mdot = MAX_THRUST * throttle / (ISP * G0)
    new_fuel = jnp.maximum(fuel - mdot * DT, 0.0)
    m = DRY_MASS + new_fuel
    return new_fuel, el.SpatialInertia.from_array(
        jnp.concatenate([m * jnp.ones(3), jnp.zeros(3), m[None]])
    )


@el.map
def ground(
    pos: el.WorldPos, vel: el.WorldVel, landed: Landed, vlat: LandedVlat
) -> tuple[el.WorldPos, el.WorldVel, Landed, LandedVlat]:
    z = pos.linear()[2]
    hit = z <= 0.0
    first = jnp.logical_and(hit, landed == 0.0)
    landed2 = jnp.where(first, vel.linear()[2], landed)
    vlat2 = jnp.where(first, la.norm(vel.linear()[:2]), vlat)
    new_pos = el.SpatialTransform(
        angular=pos.angular(),
        linear=jnp.where(hit, pos.linear() * jnp.array([1.0, 1.0, 0.0]), pos.linear()),
    )
    new_vel = el.SpatialMotion(
        angular=vel.angular(),
        linear=jnp.where(hit, jnp.zeros(3), vel.linear()),
    )
    return new_pos, new_vel, landed2, vlat2


def build_world(offset=(-450.0, 200.0), altitude=2_000.0, vel0=(60.0, -15.0, -35.0)):
    w = el.World()
    m0 = DRY_MASS + FUEL0
    w.spawn(
        [
            el.Body(
                world_pos=el.WorldPos(
                    linear=jnp.array([offset[0], offset[1], altitude])
                ),
                world_vel=el.WorldVel(linear=jnp.array(vel0)),
                inertia=el.Inertia(m0),
            ),
            Lander(),
        ],
        name="eagle",
    )
    return w


def build_system() -> el.System:
    # guidance is the six_dof effector (runs after clear_forces); gravity is
    # folded into the guidance force so the chain stays one fused map
    return el.six_dof(
        sys=zem_zev_guidance, integrator=el.Integrator.SemiImplicit
    ) | burn_fuel | ground


if __name__ == "__main__":
    w = build_world()
    exec_ = w.build(build_system(), simulation_rate=SIM_RATE)
    exec_.run(int(180 * SIM_RATE))
    import numpy as np

    df = exec_.history(["eagle.world_pos", "eagle.landed_vz", "eagle.fuel"])
    pos = df["eagle.world_pos"][-1].to_numpy()
    td = float(df["eagle.landed_vz"][-1])
    fuel = float(df["eagle.fuel"][-1])
    miss = np.linalg.norm(pos[4:6])
    print(f"touchdown: vz={td:.2f} m/s, miss={miss:.1f} m, fuel left {fuel:.0f} kg")
    assert td < 0.0, "never landed"
    assert td > -3.0, f"hard landing {td}"
    assert miss < 10.0, f"missed the target by {miss} m"


def run_dispersed(n_samples: int = 1024, seed: int = 0, ticks=int(180 * SIM_RATE)):
    """Batched Monte Carlo over dispersed approach states — the guided
    descent (guidance in-graph) vmaps over the sample axis as one XLA
    program."""
    import numpy as np

    from elodin_tpu.monte_carlo import BatchedCampaign

    rng = np.random.default_rng(seed)
    n = n_samples
    offsets = rng.uniform([-700, -300], [-200, 300], (n, 2))
    alts = rng.uniform(1700, 2300, n)
    vels = rng.uniform([40, -25, -45], [80, -5, -25], (n, 3))

    w = build_world()
    pos0 = np.concatenate(
        [np.tile([0.0, 0.0, 0.0, 1.0], (n, 1)), offsets, alts[:, None]], axis=1
    )
    vel0 = np.concatenate([np.zeros((n, 3)), vels], axis=1)
    campaign = BatchedCampaign(
        w, build_system(), n,
        overrides={"eagle.world_pos": pos0, "eagle.world_vel": vel0},
        simulation_rate=SIM_RATE,
    )
    result = campaign.run(ticks)
    td = result.component("eagle.landed_vz")
    vlat = result.component("eagle.landed_vlat")
    final = result.component("eagle.world_pos")[:, 4:]
    fuel = result.component("eagle.fuel")
    landed = td < 0.0
    # the reference's full envelope (sim.py:35-37 + propellant > 0):
    # vertical <= 3, horizontal <= 1, fuel remaining; upright is trivially
    # satisfied in this translation-only model
    soft = landed & (td > -3.0) & (vlat < 1.0) & (fuel > 0.0)
    miss = np.linalg.norm(final[:, :2], axis=1)
    return {
        "n_samples": n,
        "wall_s": result.wall_seconds,
        "landed_frac": float(landed.mean()),
        "soft_frac": float(soft.mean()),
        "mean_td_vz": float(td[landed].mean()) if landed.any() else None,
        "p95_miss_m": float(np.percentile(miss[landed], 95)) if landed.any() else None,
        "min_fuel_kg": float(fuel.min()),
    }


