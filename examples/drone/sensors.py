"""Drone IMU suite: gyro (drifting bias), accelerometer, magnetometer.

Parity target: reference examples/drone/sensors.py — the FSW's only view of
the world.  Gyro and accel sample at the 900 Hz fast-loop rate through a
biquad anti-alias LPF; the magnetometer holds at 100 Hz; accel health folds
specific-force deviation and rotation rate into a [0,1] trust score the MEKF
uses to de-weight the gravity observation during maneuvers.  Deterministic noise via a counter hash keyed on the sensor tick
(elodin_tpu.ops.fastrand) keeps batched campaigns reproducible at ~6x
fewer HLO ops than a threefry chain — the interactive 1-entity regime is
dispatch-bound (docs/PERFORMANCE.md).

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp

from elodin_tpu.ops import fastrand

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
    """Sensor pipeline factory (runs at the 900 Hz fast-loop rate).

    The whole IMU suite samples in ONE fused map with ONE PRNG draw: the
    interactive (1-entity, CPU-backend) regime is bound by per-op dispatch,
    and the original five-system pipeline spent most of its tick on 12
    separate threefry chains (4 draws x fold_in each).  A single
    counter-hash normal((4, 3)) draw keyed on the sensor tick
    (elodin_tpu.ops.fastrand) feeds bias walk, gyro, accel and mag noise;
    behavior (rates, filters, hold, health) is unchanged.
    """
    gyro_lpf = filter_mod.BiquadLPF(GYRO_LPF_HZ, 1.0 / FAST_DT)
    accel_lpf = filter_mod.BiquadLPF(ACCEL_LPF_HZ, 1.0 / FAST_DT)
    mag_hold = round((1.0 / MAG_RATE_HZ) / FAST_DT)
    # Per-row noise scale: [gyro bias drift*dt, gyro, accel, mag].
    scale = jnp.sqrt(
        jnp.asarray(
            [GYRO_BIAS_DRIFT_COV, GYRO_NOISE_COV, ACCEL_NOISE_COV, MAG_NOISE_COV]
        )
    )[:, None] * jnp.asarray([FAST_DT, 1.0, 1.0, 1.0])[:, None]

    @el.map
    def imu_sample(
        t: SensorTick,
        p: el.WorldPos,
        v: el.WorldVel,
        a: el.WorldAccel,
        gbias: GyroBias,
        gdelay: GyroDelay,
        abias: AccelBias,
        adelay: AccelDelay,
        mbias: MagBias,
        mprev: Magnetometer,
    ) -> tuple[
        SensorTick, GyroBias, GyroDelay, Gyro, AccelDelay, Accel, Magnetometer, AccelHealth
    ]:
        t = t + 1.0
        if noise:
            z = scale * fastrand.normal(t, 450, (4, 3), dtype=jnp.float64)
            gbias = gbias + z[0]
        rot_inv = p.angular().inverse()

        w_body = rot_inv @ v.angular()
        if noise:
            w_body = w_body + gbias + z[1]
        gdelay = gyro_lpf.apply(gdelay, w_body)
        gyro = gdelay[2]

        # Specific force in g units: proper acceleration minus gravity.
        f_body = rot_inv @ (a.linear() / 9.81 + jnp.asarray([0.0, 0.0, 1.0]))
        if noise:
            f_body = f_body + abias + z[2]
        adelay = accel_lpf.apply(adelay, f_body)
        accel = adelay[2]

        m_body = rot_inv @ jnp.asarray(MAG_REF_WORLD)
        if noise:
            m_body = m_body + mbias + z[3]
        mag = jnp.where(jnp.mod(t, mag_hold) < 0.5, m_body, mprev)

        h = 1.0 - jnp.clip(jnp.abs(jnp.linalg.norm(accel) - 1.0) / 0.5, 0.0, 1.0)
        health = h * (1.0 - jnp.clip(jnp.linalg.norm(gyro) / 0.5, 0.0, 1.0))
        return t, gbias, gdelay, gyro, adelay, accel, mag, health

    return imu_sample
