"""Sensor-camera bouncing-balls room
(parity: examples/sensor-camera/main.py — balls bounce in a walled room; two
carry sensor cameras at different FPS whose frames the headless render
server pushes to the DB; the sim reads frames back with a latency offset).

GPU frame rendering is editor-side; the TPU rebuild keeps the sim +
camera-config contract: cameras are registered with
``world.sensor_camera`` and stored as DB assets a render server would
read.  The frame-message data plane itself (opaque frames through the
MsgLog path, timestamped readback) is exercised by
``examples/video-stream``.
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

SIM_TIME_STEP = 1.0 / 120.0
BALL_RADIUS = 0.3
BOUNDARY = 5.0
BOUNCINESS = 0.95
FRICTION = 0.05

SCENE_FPS = 60.0
THERMAL_FPS = 30.0
SCENE_LATENCY_US = 16_667
THERMAL_LATENCY_US = 33_333

BallSeed = ty.Annotated[jax.Array, el.Component("ball_seed", el.ComponentType.F64)]


@el.dataclass
class BallTag(el.Archetype):
    ball_seed: BallSeed = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def gravity(f: el.Force, inertia: el.Inertia) -> el.Force:
    return f + el.SpatialForce(linear=inertia.mass() * jnp.array([0.0, 0.0, -9.81]))


@el.map
def bounce_walls(pos: el.WorldPos, vel: el.WorldVel) -> tuple[el.WorldPos, el.WorldVel]:
    """Reflect off the six room walls with restitution and tangential
    friction (reference bounce system)."""
    p = pos.linear()
    v = vel.linear()
    lo = jnp.array([-BOUNDARY, -BOUNDARY, BALL_RADIUS])
    hi = jnp.array([BOUNDARY, BOUNDARY, 2.0 * BOUNDARY])
    hit_lo = p < lo
    hit_hi = p > hi
    hit = hit_lo | hit_hi
    v_new = jnp.where(hit, -v * BOUNCINESS, v * (1.0 - FRICTION * SIM_TIME_STEP))
    p_new = jnp.clip(p, lo, hi)
    return (
        el.SpatialTransform(angular=pos.angular(), linear=p_new),
        el.SpatialMotion(angular=vel.angular(), linear=v_new),
    )


def world(n_balls: int = 8) -> el.World:
    import numpy as np

    rng = np.random.default_rng(12)
    w = el.World()
    cam_entities = {}
    for i in range(n_balls):
        p0 = rng.uniform([-3, -3, 2], [3, 3, 8])
        v0 = rng.uniform(-3, 3, 3)
        eid = w.spawn(
            [
                el.Body(
                    world_pos=el.SpatialTransform(linear=jnp.asarray(p0)),
                    world_vel=el.SpatialMotion(linear=jnp.asarray(v0)),
                    inertia=el.SpatialInertia(mass=1.0),
                ),
                BallTag(ball_seed=jnp.float64(i)),
            ],
            name=f"Ball {i}",
        )
        cam_entities[i] = eid
    w.sensor_camera(
        entity=cam_entities[0], name="scene_cam", width=256, height=256,
        fov=90.0, format="rgba", fps=SCENE_FPS,
        latency_us=SCENE_LATENCY_US,
    )
    w.sensor_camera(
        entity=cam_entities[1], name="thermal_cam", width=128, height=128,
        fov=90.0, format="thermal", fps=THERMAL_FPS,
        latency_us=THERMAL_LATENCY_US,
    )
    w.schematic(
        """
        hsplit {
            viewport name=Viewport look_at="(0,0,0,0, 0,0,2)" show_grid=#true
            vsplit {
                sensor_view "ball_0.scene_cam" name="RGB Camera"
                sensor_view "ball_1.thermal_cam" name="Thermal Camera"
            }
        }
        """
    )
    return w


def system() -> el.System:
    return el.six_dof(sys=gravity) | bounce_walls


if __name__ == "__main__":
    world().run(system(), simulation_rate=1.0 / SIM_TIME_STEP)
