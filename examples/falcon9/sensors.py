"""Falcon 9 sensor suite: IMU, GPS (with retropropulsion blackout), radar
altimeter, tank/inlet pressure transducers, webcast display model.

Parity target: reference examples/falcon9/sensors.py (WHITEPAPER §12).
Patterns kept from the proven architecture: IMU at the physics rate; slower
sensors on timer-accumulator + hold with sample counters (freshness = counter
change); deterministic noise via fold_in(key, sample_count) so a batched
campaign stays bitwise reproducible under vmap.

NOTE: no `from __future__ import annotations` — el.map reads live annotation
objects.
"""

import math
import typing as ty
from dataclasses import field as _dc_field

import elodin as el
import jax
import jax.numpy as jnp
import jax.random as jr


def _field(factory):
    return _dc_field(default_factory=factory)

GPS_RATE_HZ = 25.0
RADAR_RATE_HZ = 40.0

IMU_ACCEL_SIGMA = 0.02  # m/s^2
IMU_GYRO_SIGMA = 1.0e-3  # rad/s
GPS_POS_SIGMA = 1.5  # m
GPS_VEL_SIGMA = 0.05  # m/s
PRESSURE_SIGMA_PA = 1.0e3
RADAR_MAX_RANGE_M = 500.0
RADAR_FOV_COS = math.cos(math.radians(35.0))
RADAR_SIGMA_M = 0.15
# GPS drops out in the retropropulsion plasma sheath.
BLACKOUT_MACH_MIN = 2.5
BLACKOUT_THRUST_MIN_N = 1.0e5

DISPLAY_SPEED_STEP = 1000.0 / 3600.0  # 1 km/h
DISPLAY_ALT_STEP = 100.0  # 0.1 km

_KEY = jr.key(20170814)

_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))
ImuAccel = ty.Annotated[jax.Array, el.Component("imu_accel", _F3)]
ImuGyro = ty.Annotated[jax.Array, el.Component("imu_gyro", _F3)]
GpsTimer = ty.Annotated[jax.Array, el.Component("gps_timer", el.ComponentType.F64)]
GpsPos = ty.Annotated[jax.Array, el.Component("gps_pos", _F3)]
GpsVel = ty.Annotated[jax.Array, el.Component("gps_vel", _F3)]
GpsCount = ty.Annotated[jax.Array, el.Component("gps_count", el.ComponentType.F64)]
RadarTimer = ty.Annotated[jax.Array, el.Component("radar_timer", el.ComponentType.F64)]
RadarRange = ty.Annotated[jax.Array, el.Component("radar_range", el.ComponentType.F64)]
RadarCount = ty.Annotated[jax.Array, el.Component("radar_count", el.ComponentType.F64)]
PressureMeas = ty.Annotated[
    jax.Array, el.Component("pressure_meas", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
DisplaySpeed = ty.Annotated[jax.Array, el.Component("display_speed", el.ComponentType.F64)]
DisplayAlt = ty.Annotated[jax.Array, el.Component("display_alt", el.ComponentType.F64)]


def noise(count, salt: int, shape, sigma):
    """Deterministic N(0, sigma) draw keyed by (stream salt, sample count)."""
    key = jr.fold_in(jr.fold_in(_KEY, salt), count.astype(jnp.int32))
    return sigma * jr.normal(key, shape=shape, dtype=jnp.float64)


@el.dataclass
class SensorSuite(el.Archetype):
    imu_accel: ImuAccel = _field(lambda: jnp.zeros(3))
    imu_gyro: ImuGyro = _field(lambda: jnp.zeros(3))
    gps_timer: GpsTimer = _field(lambda: jnp.float64(0.0))
    gps_pos: GpsPos = _field(lambda: jnp.zeros(3))
    gps_vel: GpsVel = _field(lambda: jnp.zeros(3))
    gps_count: GpsCount = _field(lambda: jnp.float64(0.0))
    radar_timer: RadarTimer = _field(lambda: jnp.float64(0.0))
    radar_range: RadarRange = _field(lambda: jnp.float64(-1.0))
    radar_count: RadarCount = _field(lambda: jnp.float64(0.0))
    pressure_meas: PressureMeas = _field(lambda: jnp.zeros(4))
    display_speed: DisplaySpeed = _field(lambda: jnp.float64(0.0))
    display_alt: DisplayAlt = _field(lambda: jnp.float64(0.0))
