"""Geo-frames showcase (parity: examples/geo-frames/main.py): ENU-anchored
world with ECEF landmark markers and a circularly orbiting body, exercising
the geodetic<->ECEF<->ENU transforms in elodin_tpu.frames against the editor's
frame-aware object_3d rendering."""

import elodin as el
import jax.numpy as jnp
import numpy as np
from elodin_tpu import frames

SIM_TIME_STEP = 1.0 / 60.0

LAT_DEG, LON_DEG, ALT_M = 34.72, -86.64, 180.5
WGS84_A_M = 6_378_137.0
WGS84_B_M = 6_356_752.314245
CUBE_SEPARATION_M = 1_500_000.0
ORBIT_RADIUS_M = WGS84_A_M + 1_200_000.0
ORBIT_PERIOD_S = 20.0
SPIN_RATE_RAD_S = float(np.radians(10.0))

ECEF_MARKERS = (
    ("ecef_equator_x_pos", (WGS84_A_M, 0.0, 0.0)),
    ("ecef_equator_y_pos", (0.0, WGS84_A_M, 0.0)),
    ("ecef_equator_x_neg", (-WGS84_A_M, 0.0, 0.0)),
    ("ecef_equator_y_neg", (0.0, -WGS84_A_M, 0.0)),
    ("ecef_north_pole", (0.0, 0.0, WGS84_B_M)),
    ("ecef_south_pole", (0.0, 0.0, -WGS84_B_M)),
)


def ecef_from_enu(east: float, north: float, up: float) -> np.ndarray:
    """ENU offset at the schematic origin -> ECEF, via the frames module
    (geodetic origin + R_ecef_ned rotation; NED = (n, e, -u))."""
    origin = frames.geodetic_to_ecef(
        np.radians(LAT_DEG), np.radians(LON_DEG), ALT_M
    )
    r = frames.ecef_to_ned(np.radians(LAT_DEG), np.radians(LON_DEG))
    ned = np.array([north, east, -up])
    return np.asarray(origin) + np.asarray(r).T @ ned


def _body(pos, angular_vel=None) -> el.Body:
    if angular_vel is None:
        angular_vel = jnp.zeros(3)
    return el.Body(
        world_pos=el.SpatialTransform(linear=jnp.asarray(pos)),
        world_vel=el.SpatialMotion(angular=jnp.asarray(angular_vel)),
        inertia=el.SpatialInertia(mass=1.0),
    )


@el.system
def orbit(tick: el.Query[el.SimulationTick],
          ts: el.Query[el.SimulationTimeStep],
          q: el.Query[el.WorldPos]) -> el.Query[el.WorldPos]:
    """Kinematic circular equatorial orbit (unused by default system();
    compose ``orbit | el.six_dof(sys=())`` to animate every body)."""
    theta = 2.0 * jnp.pi * (tick[0] * ts[0]) / ORBIT_PERIOD_S

    def pose(pos):
        linear = ORBIT_RADIUS_M * jnp.array(
            [jnp.cos(theta), jnp.sin(theta), 0.0 * theta]
        )
        return el.SpatialTransform(angular=pos.angular(), linear=linear)

    return q.map(el.WorldPos, pose)


def world() -> el.World:
    w = el.World()
    spin = jnp.array([0.0, SPIN_RATE_RAD_S, 0.0])
    w.spawn(_body(jnp.zeros(3), spin), name="ned_origin")
    w.spawn(_body(jnp.array([CUBE_SEPARATION_M, 0.0, 0.0]), spin),
            name="enu_far_east")
    w.spawn(_body(ecef_from_enu(0.0, 0.0, CUBE_SEPARATION_M), spin),
            name="ecef_far_up")
    for name, pos in ECEF_MARKERS:
        w.spawn(
            el.Body(
                world_pos=el.SpatialTransform(linear=jnp.asarray(pos)),
                inertia=el.SpatialInertia(mass=1.0),
            ),
            name=name,
        )
    w.schematic(
        f"""
        coordinate frame=ENU lat={LAT_DEG} lon={LON_DEG} alt={ALT_M}
        viewport name=Viewport look_at="ned_origin.world_pos" show_grid=#true
        """
    )
    return w


def system() -> el.System:
    return el.six_dof(sys=())
