"""Sensor models and IMU pre-integration as JAX functions.

Parity targets:

* coning/sculling pre-integration from the reference's STM32 firmware
  (fsw/sensor-fw/src/coning_sculling.rs — 2-sample Bortz integrator per
  Savage's strapdown algorithm design), reimplemented as a windowed
  ``lax.scan`` so whole sample batches decimate in one fused program;
* the noisy sensor components the sim examples build inline (gyro/
  accelerometer/magnetometer/GPS with bias random-walk + white noise,
  e.g. examples/drone/sensors.py, examples/cube-sat sensors).

Everything is batched and jit-friendly; use inside systems or standalone.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


# -- coning / sculling -------------------------------------------------------


def coning_sculling_window(gyro: jnp.ndarray, accel: jnp.ndarray, dt):
    """Integrate one window of raw IMU samples into corrected averages.

    gyro, accel: (n, 3) raw samples; dt: scalar or (n,) sample intervals.
    Returns (gyro_avg, accel_avg) corrected for coning (2-sample Bortz) and
    sculling (rotation-acceleration coupling), matching
    fsw/sensor-fw/src/coning_sculling.rs push/emit semantics."""
    gyro = jnp.asarray(gyro)
    accel = jnp.asarray(accel)
    n = gyro.shape[0]
    dt_arr = jnp.broadcast_to(jnp.asarray(dt), (n,))

    d_angle = gyro * dt_arr[:, None]
    d_vel = accel * dt_arr[:, None]

    def body(carry, xs):
        accum_angle, accum_vel, prev_angle, coning, first = carry
        da, dv = xs
        coning_term = jnp.where(
            # dtype must follow the samples or the f32 scan carry promotes
            # to f64 and lax.scan rejects the carry type mismatch
            first, jnp.zeros(3, dtype=da.dtype),
            (2.0 / 3.0) * jnp.cross(prev_angle, da),
        )
        coning = coning + coning_term
        sculling = 0.5 * jnp.cross(accum_angle, dv)
        accum_vel = accum_vel + dv + sculling
        accum_angle = accum_angle + da
        return (accum_angle, accum_vel, da, coning, jnp.asarray(False)), None

    zero = jnp.zeros(3, dtype=gyro.dtype)
    (accum_angle, accum_vel, _prev, coning, _), _ = jax.lax.scan(
        body, (zero, zero, zero, zero, jnp.asarray(True)), (d_angle, d_vel)
    )
    total_dt = jnp.sum(dt_arr)
    return (accum_angle + coning) / total_dt, accum_vel / total_dt


class ConingScullingIntegrator:
    """Streaming wrapper with the firmware's push/emit API."""

    def __init__(self, decimation: int):
        self.decimation = int(decimation)
        self._gyro: list = []
        self._accel: list = []
        self._dt: list = []

    def push(self, gyro, accel, dt: float):
        if dt <= 0.0 or dt > 0.1:
            return None
        self._gyro.append(jnp.asarray(gyro))
        self._accel.append(jnp.asarray(accel))
        self._dt.append(dt)
        if len(self._gyro) >= self.decimation:
            g, a = coning_sculling_window(
                jnp.stack(self._gyro), jnp.stack(self._accel),
                jnp.asarray(self._dt),
            )
            self._gyro.clear()
            self._accel.clear()
            self._dt.clear()
            return g, a
        return None


# -- noisy sensor models -----------------------------------------------------


@dataclass(frozen=True)
class ImuSpec:
    gyro_noise: float = 1e-3  # rad/s/sqrt(Hz) white
    gyro_bias_walk: float = 1e-5  # rad/s^2/sqrt(Hz)
    accel_noise: float = 5e-3
    accel_bias_walk: float = 1e-4


def imu_measure(key, spec: ImuSpec, omega_body, accel_body, gyro_bias,
                accel_bias, dt):
    """One IMU sample: true body rates/specific force -> noisy measurement
    plus the propagated biases.  Returns (gyro_meas, accel_meas,
    gyro_bias', accel_bias')."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sq = jnp.sqrt(1.0 / dt)
    gyro = omega_body + gyro_bias + spec.gyro_noise * sq * jax.random.normal(k1, omega_body.shape)
    accel = accel_body + accel_bias + spec.accel_noise * sq * jax.random.normal(k2, accel_body.shape)
    gyro_bias = gyro_bias + spec.gyro_bias_walk * jnp.sqrt(dt) * jax.random.normal(k3, gyro_bias.shape)
    accel_bias = accel_bias + spec.accel_bias_walk * jnp.sqrt(dt) * jax.random.normal(k4, accel_bias.shape)
    return gyro, accel, gyro_bias, accel_bias


def magnetometer_measure(key, field_body, noise_nt: float = 100.0,
                         hard_iron=None, soft_iron=None):
    """Noisy magnetometer with optional hard/soft-iron distortion."""
    out = field_body
    if soft_iron is not None:
        out = (jnp.asarray(soft_iron) @ out[..., None])[..., 0]
    if hard_iron is not None:
        out = out + jnp.asarray(hard_iron)
    return out + noise_nt * jax.random.normal(key, out.shape)


def gps_measure(key, pos_ecef, vel_ecef, pos_sigma: float = 1.5,
                vel_sigma: float = 0.05):
    k1, k2 = jax.random.split(key)
    return (
        pos_ecef + pos_sigma * jax.random.normal(k1, pos_ecef.shape),
        vel_ecef + vel_sigma * jax.random.normal(k2, vel_ecef.shape),
    )


def barometer_measure(key, alt_m, sigma_m: float = 0.5, bias_m: float = 0.0):
    return alt_m + bias_m + sigma_m * jax.random.normal(key, jnp.shape(alt_m))
