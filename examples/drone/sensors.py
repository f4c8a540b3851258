"""Drone IMU suite: gyro (drifting bias), accelerometer, magnetometer.

Parity target: reference examples/drone/sensors.py — the FSW's only view of
the world.  Gyro and accel sample at the 900 Hz fast-loop rate through a
biquad anti-alias LPF; the magnetometer holds at 100 Hz; accel health folds
specific-force deviation and rotation rate into a [0,1] trust score the MEKF
uses to de-weight the gravity observation during maneuvers.  Deterministic
noise via fold_in(key, sensor_tick) keeps batched campaigns reproducible.

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
import jax.random as jr

FAST_DT = 1.0 / 900.0
GYRO_LPF_HZ = 40.0
ACCEL_LPF_HZ = 20.0
MAG_RATE_HZ = 100.0

GYRO_NOISE_COV = 0.001
GYRO_BIAS_DRIFT_COV = 0.001
ACCEL_NOISE_COV = 0.001
MAG_NOISE_COV = 0.0001
INIT_GYRO_BIAS = (0.0025, 0.0001, 0.0005)
MAG_REF_WORLD = (0.0, 1.0, 0.0)  # unit field, points north-ish

_F3 = el.ComponentType(el.PrimitiveType.F64, (3,))
_D43 = el.ComponentType(el.PrimitiveType.F64, (4, 3))

SensorTick = ty.Annotated[jax.Array, el.Component("sensor_tick", el.ComponentType.F64)]
Gyro = ty.Annotated[
    jax.Array, el.Component("gyro", _F3, metadata={"element_names": "x,y,z"})
]
GyroBias = ty.Annotated[jax.Array, el.Component("gyro_bias", _F3)]
GyroDelay = ty.Annotated[jax.Array, el.Component("gyro_lpf_delay", _D43)]
Accel = ty.Annotated[
    jax.Array, el.Component("accel", _F3, metadata={"element_names": "x,y,z"})
]
AccelBias = ty.Annotated[jax.Array, el.Component("accel_bias", _F3)]
AccelDelay = ty.Annotated[jax.Array, el.Component("accel_lpf_delay", _D43)]
AccelHealth = ty.Annotated[jax.Array, el.Component("accel_health", el.ComponentType.F64)]
Magnetometer = ty.Annotated[
    jax.Array, el.Component("magnetometer", _F3, metadata={"element_names": "x,y,z"})
]
MagBias = ty.Annotated[jax.Array, el.Component("magnetometer_bias", _F3)]

_KEY = jr.key(450)


def _draw(salt: int, tick, shape, cov):
    key = jr.fold_in(jr.fold_in(_KEY, salt), tick.astype(jnp.int32))
    return jnp.sqrt(cov) * jr.normal(key, shape=shape, dtype=jnp.float64)


@el.dataclass
class IMU(el.Archetype):
    sensor_tick: SensorTick = field(default_factory=lambda: jnp.float64(0.0))
    gyro: Gyro = field(default_factory=lambda: jnp.zeros(3))
    gyro_bias: GyroBias = field(default_factory=lambda: jnp.asarray(INIT_GYRO_BIAS))
    gyro_lpf_delay: GyroDelay = field(default_factory=lambda: jnp.zeros((4, 3)))
    accel: Accel = field(default_factory=lambda: jnp.zeros(3))
    accel_bias: AccelBias = field(default_factory=lambda: jnp.zeros(3))
    accel_lpf_delay: AccelDelay = field(default_factory=lambda: jnp.zeros((4, 3)))
    accel_health: AccelHealth = field(default_factory=lambda: jnp.float64(1.0))
    magnetometer: Magnetometer = field(default_factory=lambda: jnp.asarray(MAG_REF_WORLD))
    magnetometer_bias: MagBias = field(default_factory=lambda: jnp.zeros(3))


def make_systems(filter_mod, noise: bool = True):
    """Sensor pipeline factory (runs at the 900 Hz fast-loop rate)."""
    gyro_lpf = filter_mod.BiquadLPF(GYRO_LPF_HZ, 1.0 / FAST_DT)
    accel_lpf = filter_mod.BiquadLPF(ACCEL_LPF_HZ, 1.0 / FAST_DT)
    mag_hold = round((1.0 / MAG_RATE_HZ) / FAST_DT)

    @el.map
    def advance_tick(t: SensorTick) -> SensorTick:
        return t + 1.0

    @el.map
    def gyro_bias_walk(t: SensorTick, bias: GyroBias) -> GyroBias:
        if not noise:
            return bias
        return bias + _draw(1, t, (3,), GYRO_BIAS_DRIFT_COV) * FAST_DT

    @el.map
    def gyro_sample(
        t: SensorTick, p: el.WorldPos, v: el.WorldVel, delay: GyroDelay, bias: GyroBias
    ) -> tuple[GyroDelay, Gyro]:
        w_body = p.angular().inverse() @ v.angular()
        if noise:
            w_body = w_body + bias + _draw(2, t, (3,), GYRO_NOISE_COV)
        new = gyro_lpf.apply(delay, w_body)
        return new, new[2]

    @el.map
    def accel_sample(
        t: SensorTick, p: el.WorldPos, a: el.WorldAccel, delay: AccelDelay, bias: AccelBias
    ) -> tuple[AccelDelay, Accel]:
        # Specific force in g units: proper acceleration minus gravity.
        f_body = p.angular().inverse() @ (a.linear() / 9.81 + jnp.asarray([0.0, 0.0, 1.0]))
        if noise:
            f_body = f_body + bias + _draw(3, t, (3,), ACCEL_NOISE_COV)
        new = accel_lpf.apply(delay, f_body)
        return new, new[2]

    @el.map
    def mag_sample(
        t: SensorTick, p: el.WorldPos, bias: MagBias, prev: Magnetometer
    ) -> Magnetometer:
        m_body = p.angular().inverse() @ jnp.asarray(MAG_REF_WORLD)
        if noise:
            m_body = m_body + bias + _draw(4, t, (3,), MAG_NOISE_COV)
        return jnp.where(jnp.mod(t, mag_hold) < 0.5, m_body, prev)

    @el.map
    def health(acc: Accel, gyro: Gyro) -> AccelHealth:
        h = 1.0 - jnp.clip(jnp.abs(jnp.linalg.norm(acc) - 1.0) / 0.5, 0.0, 1.0)
        return h * (1.0 - jnp.clip(jnp.linalg.norm(gyro) / 0.5, 0.0, 1.0))

    return advance_tick | gyro_bias_walk | gyro_sample | accel_sample | mag_sample | health
