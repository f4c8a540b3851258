"""Rotating cube: minimal attitude propagation + geo-referenced schematic
(parity: examples/rotating-cube/main.py — constant spin about world +X with
an ENU geodetic origin so editor gauges map world_pos to lat/lon/alt)."""

import elodin as el
import jax.numpy as jnp

SIM_TIME_STEP = 1.0 / 120.0
SPIN_RATE_RAD_S = float(jnp.pi / 2.0)  # quarter turn per second about +X

SCHEMATIC = """
coordinate frame=ENU lat=28.6084 lon=-80.6043 alt=3.0
hsplit {
    vsplit share=0.32 {
        geo_position_gauge name="GEO NED" eql="cube.world_pos" source="ENU" display="NED"
        component_monitor name="MONITOR world_pos" component_name="cube.world_pos"
    }
    tabs share=0.44 {
        viewport name=Viewport look_at="cube.world_pos" show_grid=#true
    }
    vsplit share=0.24 {
        orientation_gauge name="ATT NED" eql="cube.world_pos" source="ENU" display="NED"
        orientation_gauge name="ATT ECEF" eql="cube.world_pos" source="ENU" display="ECEF"
    }
}
object_3d eql="cube.world_pos" {
    cube size=0.5
}
"""


def world() -> el.World:
    w = el.World()
    w.spawn(
        el.Body(
            world_pos=el.SpatialTransform(
                angular=el.Quaternion.identity(),
                linear=jnp.array([0.0, 0.0, 1.0]),
            ),
            world_vel=el.SpatialMotion(
                angular=jnp.array([SPIN_RATE_RAD_S, 0.0, 0.0])
            ),
            inertia=el.SpatialInertia(1.0),
        ),
        name="Cube",
        id="cube",
    )
    w.schematic(SCHEMATIC)
    return w


def system() -> el.System:
    return el.six_dof(sys=())
