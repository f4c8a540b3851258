"""Booster landing-burn sim for dispersed Monte Carlo campaigns.

Parity target: the reference's falcon9 Monte Carlo flow
(examples/monte-carlo, scripts/test-falcon9-monte-carlo.sh): a vehicle under
gravity + drag + a thrust controller, with campaign parameters dispersing
initial conditions and vehicle properties.  Runs equally as a single sim
(process path, `python main.py run`) or as a vmap-batched on-device campaign
(the TPU path, examples/monte-carlo/batched.py)."""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
from jax.numpy import linalg as la

PROPELLANT0_KG = 6000.0  # initial propellant load (single source of truth)

SIMULATION_RATE_HZ = 120.0
SIM_TIME_STEP = 1.0 / SIMULATION_RATE_HZ
DEFAULT_MAX_TICKS = 2400  # 20 s

G0 = 9.81

PARAMS = dict(
    start_altitude=el.monte_carlo.Param(float, default=2000.0, min=1500.0, max=2500.0),
    start_vz=el.monte_carlo.Param(float, default=-150.0, min=-200.0, max=-120.0),
    wind_x=el.monte_carlo.Param(float, default=0.0, min=-15.0, max=15.0),
    thrust_eff=el.monte_carlo.Param(float, default=1.0, min=0.92, max=1.05),
    dry_mass=el.monte_carlo.Param(float, default=25_000.0, min=24_000.0, max=27_000.0),
)

Wind = ty.Annotated[
    jax.Array,
    el.Component("wind", el.ComponentType(el.PrimitiveType.F64, (3,)),
                 metadata={"element_names": "x,y,z"}),
]
Propellant = ty.Annotated[jax.Array, el.Component("propellant", el.ComponentType.F64)]
ThrustCmd = ty.Annotated[jax.Array, el.Component("thrust_cmd", el.ComponentType.F64)]
ThrustEff = ty.Annotated[jax.Array, el.Component("thrust_eff", el.ComponentType.F64)]
Touchdown = ty.Annotated[jax.Array, el.Component("touchdown_vz", el.ComponentType.F64)]

MAX_THRUST = 845_000.0  # single Merlin-class engine, N
ISP = 282.0
CD_A = 10.0  # drag area * coefficient


@el.dataclass
class Booster(el.Archetype):
    wind: Wind = field(default_factory=lambda: jnp.zeros(3))
    propellant: Propellant = field(default_factory=lambda: jnp.float64(PROPELLANT0_KG))
    thrust_cmd: ThrustCmd = field(default_factory=lambda: jnp.float64(0.0))
    thrust_eff: ThrustEff = field(default_factory=lambda: jnp.float64(1.0))
    touchdown_vz: Touchdown = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def landing_guidance(
    pos: el.WorldPos, vel: el.WorldVel, inertia: el.Inertia, prop: Propellant
) -> ThrustCmd:
    """Suicide-burn trigger: full throttle when stopping distance matches
    altitude; proportional braking below."""
    z = pos.linear()[2]
    vz = vel.linear()[2]
    m = inertia.mass()
    a_net = MAX_THRUST / m - G0
    stop_dist = vz * vz / (2.0 * jnp.maximum(a_net, 1.0))
    # required deceleration to null vz exactly at the pad (+2m margin)
    a_req = vz * vz / (2.0 * jnp.maximum(z - 2.0, 1.0)) + G0
    burn = jnp.logical_and(vz < -2.0, z < stop_dist * 1.15)
    throttle = jnp.where(burn, jnp.clip(m * a_req / MAX_THRUST, 0.0, 1.0), 0.0)
    throttle = jnp.where(prop <= 0.0, 0.0, throttle)
    return throttle


@el.map
def forces(
    pos: el.WorldPos,
    vel: el.WorldVel,
    inertia: el.Inertia,
    wind: Wind,
    throttle: ThrustCmd,
    eff: ThrustEff,
    f: el.Force,
) -> el.Force:
    m = inertia.mass()
    gravity = jnp.array([0.0, 0.0, -G0]) * m
    rel = vel.linear() - wind
    speed = la.norm(rel)
    rho = 1.225 * jnp.exp(-pos.linear()[2] / 8500.0)
    drag = -0.5 * rho * CD_A * speed * rel
    thrust = jnp.array([0.0, 0.0, 1.0]) * MAX_THRUST * throttle * eff
    above_ground = pos.linear()[2] > 0.0
    total = jnp.where(above_ground, gravity + drag + thrust, jnp.zeros(3))
    return el.SpatialForce(linear=f.force() + total)


@el.map
def burn_propellant(
    throttle: ThrustCmd, prop: Propellant, inertia: el.Inertia, eff: ThrustEff
) -> tuple[Propellant, el.Inertia]:
    mdot = MAX_THRUST * throttle * eff / (ISP * G0)
    new_prop = jnp.maximum(prop - mdot * SIM_TIME_STEP, 0.0)
    dm = prop - new_prop
    m = inertia.mass() - dm
    return new_prop, el.SpatialInertia.from_array(
        jnp.concatenate([inertia.inertia_diag(), jnp.zeros(3), m[None]])
    )


@el.map
def ground_clamp(pos: el.WorldPos, vel: el.WorldVel, td: Touchdown) -> tuple[el.WorldPos, el.WorldVel, Touchdown]:
    """Clamp at the pad and latch touchdown velocity."""
    z = pos.linear()[2]
    landed = z <= 0.0
    td_new = jnp.where(jnp.logical_and(landed, td == 0.0), vel.linear()[2], td)
    new_pos = el.SpatialTransform(
        angular=pos.angular(),
        linear=jnp.where(landed, pos.linear() * jnp.array([1.0, 1.0, 0.0]), pos.linear()),
    )
    new_vel = el.SpatialMotion(
        angular=vel.angular(),
        linear=jnp.where(landed, jnp.zeros(3), vel.linear()),
    )
    return new_pos, new_vel, td_new


def build(params=None) -> tuple[el.World, el.System]:
    p = {k: (params.get(k, v.default) if params else v.default) for k, v in PARAMS.items()}
    w = el.World()
    wet_mass = p["dry_mass"] + PROPELLANT0_KG
    w.spawn(
        [
            el.Body(
                world_pos=el.WorldPos(linear=jnp.array([0.0, 0.0, p["start_altitude"]])),
                world_vel=el.WorldVel(linear=jnp.array([3.0, 0.0, p["start_vz"]])),
                inertia=el.Inertia(wet_mass),
            ),
            Booster(
                wind=jnp.array([p["wind_x"], 0.0, 0.0]),
                thrust_eff=jnp.float64(p["thrust_eff"]),
            ),
        ],
        name="booster",
    )
    sys = landing_guidance | el.six_dof(
        sys=forces, integrator=el.Integrator.SemiImplicit
    ) | burn_propellant | ground_clamp
    return w, sys
