"""EDU-450 quad-X drone with the full sensor -> MEKF -> control loop.

Parity target: reference examples/drone (main.py/sim.py/config.py) — a
300 Hz control loop over a 900 Hz plant fast loop (3 six-dof substeps per
control tick, exactly the reference's INNER_RUN_COUNT = 3), flying an
attitude test-point plan.  The FSW sees only its sensors: the rate PID
consumes the biquad-filtered, bias-drifting gyro and the angle loop closes
on the MEKF attitude estimate.

Modules are loaded under prefixed sys.modules keys so the reference-parity
filenames (sensors.py, mekf.py, control.py, ...) cannot collide with other
examples' modules in one test process.
"""

import importlib.util as _ilu
import os as _os
import sys as _sys
import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

_DIR = _os.path.dirname(_os.path.abspath(__file__))


def _local(name: str):
    key = f"drone_{name}"
    if key not in _sys.modules:
        spec = _ilu.spec_from_file_location(key, _os.path.join(_DIR, f"{name}.py"))
        mod = _ilu.module_from_spec(spec)
        _sys.modules[key] = mod
        spec.loader.exec_module(mod)
    return _sys.modules[key]


filt = _local("filter")
sn = _local("sensors")
mekf = _local("mekf")
motors = _local("motors")
shaping = _local("shaping")
params = _local("params")
ctl = _local("control")

SIMULATION_RATE = 300.0  # control rate; the plant substeps at 900 Hz
FAST_DT = 1.0 / 900.0
INNER_RUN_COUNT = 3
SIM_SECONDS = 30.0

MASS_KG = 1.0
INERTIA_DIAG = jnp.asarray([0.1, 0.1, 0.2])
DRAG_COEF = 0.2 * 0.5

# Attitude test points (t_s, roll, pitch, yaw_rate) — the reference's
# attitude_flight_plan shape: hover, pitch step, roll step, mixed, hover.
PLAN = (
    (0.0, 0.0, 0.0, 0.0),
    (6.0, 0.0, 0.3, 0.0),
    (12.0, 0.3, 0.0, 0.0),
    (18.0, -0.2, -0.2, 0.3),
    (24.0, 0.0, 0.0, 0.0),
)


@el.map
def gravity(inertia: el.Inertia, f: el.Force) -> el.Force:
    return f + el.SpatialForce(linear=jnp.asarray([0.0, 0.0, -9.81]) * inertia.mass())


@el.map
def drag(v: el.WorldVel, f: el.Force) -> el.Force:
    rel = -v.linear()
    return f + el.SpatialForce(linear=DRAG_COEF * rel * jnp.linalg.norm(rel))


def make_flight_plan():
    ts = jnp.asarray([p[0] for p in PLAN])
    vals = jnp.asarray([[p[1], p[2], p[3]] for p in PLAN])

    @el.system
    def flight_plan(
        tick: el.Query[el.SimulationTick],
        dt: el.Query[el.SimulationTimeStep],
        q: el.Query[ctl.AngleDesired],
    ) -> el.Query[ctl.AngleDesired]:
        t = tick[0] * dt[0]
        idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, len(PLAN) - 1)
        return q.map(ctl.AngleDesired, lambda _a: vals[idx])

    return flight_plan


def build_world(tilt_deg: float = 0.0, alt_m: float = 2.0) -> el.World:
    w = el.World()
    w.spawn(
        [
            el.Body(
                world_pos=el.SpatialTransform(
                    angular=el.Quaternion.from_axis_angle(
                        jnp.asarray([1.0, 0.0, 0.0]), jnp.radians(tilt_deg)
                    ),
                    linear=jnp.asarray([0.0, 0.0, alt_m]),
                ),
                inertia=el.SpatialInertia(MASS_KG, INERTIA_DIAG),
            ),
            motors.Motors(),
            sn.IMU(),
            mekf.MEKF(),
            ctl.AttitudeController(),
        ],
        name="drone",
    )
    w.schematic(
        """
        hsplit {
            viewport name=Viewport look_at="drone.world_pos" show_grid=#true
            vsplit {
                graph name="Attitude estimate" eql="drone.attitude_estimate"
                graph name="Estimate error" eql="drone.attitude_estimate_error"
                graph name="Gyro" eql="drone.gyro"
                graph name="Motors" eql="drone.motor_pwm"
            }
        }
        """
    )
    return w


def build_system(noise: bool = True, flight_plan: bool = False) -> el.System:
    """FSW at the control rate, then 3 fast-loop substeps of plant+sensors,
    then the MEKF measurement update (reference sim.py:179-208)."""
    sensor_sys = sn.make_systems(filt, noise=noise)
    fsw = ctl.make_systems(sn, mekf, motors, filt, shaping, params)
    effectors = gravity | drag | motors.wrench
    inner = (
        el.six_dof(FAST_DT, motors.response | effectors, integrator=el.Integrator.SemiImplicit)
        | sensor_sys
    )
    stack = fsw
    for _ in range(INNER_RUN_COUNT):
        stack = stack | inner
    stack = stack | mekf.make_update(sn)
    if flight_plan:
        stack = make_flight_plan() | stack
    return stack


if __name__ == "__main__":
    w = build_world()
    w.run(
        build_system(flight_plan=True),
        simulation_rate=SIMULATION_RATE,
        max_ticks=int(SIM_SECONDS * SIMULATION_RATE),
    )
