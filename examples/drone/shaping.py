"""ArduPilot-style setpoint shaping + attitude-error decomposition.

Parity target: reference examples/drone/control.py:53-162 (shape_angle /
shape_euler_rate / angular_to_euler_accel_limit /
thrust_vector_rotation_angles) and util.py's quaternion helpers — the
public ArduPilot "sqrt controller" input-shaping stack.  Everything here is
branchless (jnp.where instead of lax.cond) so the whole shaping pipeline
vectorizes across axes in one fused XLA op and vmaps cleanly over batched
Monte-Carlo worlds.

NOTE: no `from __future__ import annotations` (el.map reads live annotations).
"""

import jax.numpy as jnp

import elodin as el

# --- quaternion / euler utilities -------------------------------------------


def quat_to_euler(q: el.Quaternion) -> jnp.ndarray:
    """3-2-1 (roll, pitch, yaw) from a quaternion, singularity-clamped."""
    x, y, z, w = q.vector()
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - x * z), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])


def euler_to_quat(angles: jnp.ndarray) -> el.Quaternion:
    return el.Quaternion.from_euler(angles)


def quat_to_axis_angle(q: el.Quaternion) -> jnp.ndarray:
    """Rotation vector (axis * angle); smooth near identity."""
    v = q.vector()
    xyz, w = v[:3], v[3]
    # sign-normalize to the short arc
    s = jnp.where(w < 0.0, -1.0, 1.0)
    xyz, w = xyz * s, w * s
    sin_half = jnp.linalg.norm(xyz)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # angle/sin(angle/2) -> 2 as angle -> 0
    scale = jnp.where(sin_half > 1e-9, angle / jnp.maximum(sin_half, 1e-30), 2.0)
    return xyz * scale


def normalize_angle(a):
    """Wrap to (-pi, pi] (odd multiples of pi map to +pi)."""
    return jnp.pi - jnp.mod(jnp.pi - a, 2.0 * jnp.pi)


def quat_dist(q1: el.Quaternion, q2: el.Quaternion) -> jnp.ndarray:
    """Huynh inner-product rotation distance (rad)."""
    d = jnp.abs(jnp.dot(q1.vector(), q2.vector()))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


def angular_to_euler_rate(att: el.Quaternion, omega_body: jnp.ndarray) -> jnp.ndarray:
    """euler_rate = T(roll, pitch) @ omega_body for the 3-2-1 sequence,
    written component-wise: building the 3x3 then dotting costs a concat +
    a standalone dot thunk on the CPU backend, and the interactive drone
    tick is bound by per-thunk dispatch (docs/PERFORMANCE.md)."""
    roll, pitch, _ = quat_to_euler(att)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp = jnp.clip(jnp.cos(pitch), 1e-6, None)
    tp = jnp.sin(pitch) / cp
    w0, w1, w2 = omega_body[0], omega_body[1], omega_body[2]
    return jnp.stack([
        w0 + sr * tp * w1 + cr * tp * w2,
        cr * w1 - sr * w2,
        (sr * w1 + cr * w2) / cp,
    ])


def euler_to_angular_rate(att: el.Quaternion, euler_rate: jnp.ndarray) -> jnp.ndarray:
    """Inverse of angular_to_euler_rate, same component-wise form."""
    roll, pitch, _ = quat_to_euler(att)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    r, p, y = euler_rate[0], euler_rate[1], euler_rate[2]
    return jnp.stack([
        r - sp * y,
        cr * p + sr * cp * y,
        -sr * p + cr * cp * y,
    ])


# --- sqrt-controller input shaping -------------------------------------------


def sqrt_controller(error, p, accel_max, dt):
    """Second-order-limited proportional law (the ArduPilot sqrt controller).

    Linear (P * error) near zero, crossing over to the constant-deceleration
    curve sign(e) * sqrt(2 a (|e| - d/2)) beyond the linear distance
    d = a / p^2, so a step command never demands more than `accel_max` to
    stop.  The |error|/dt clip keeps the final step from overshooting.
    """
    err_abs = jnp.abs(error)
    linear_dist = accel_max / jnp.maximum(p, 1e-9) ** 2
    sqrt_out = jnp.sign(error) * jnp.sqrt(
        2.0 * accel_max * jnp.maximum(err_abs - 0.5 * linear_dist, 0.0)
    )
    out = jnp.where(err_abs > linear_dist, sqrt_out, error * p)
    return jnp.clip(out, -err_abs / dt, err_abs / dt)


def shape_rate(target_rate, desired_rate, accel_max, dt, time_constant):
    """Slew `target_rate` toward `desired_rate` under an acceleration cap.

    The first-order pull (1/tc) is clipped so one step never overshoots the
    desired rate; the accel cap bounds the per-step change.
    """
    err = desired_rate - target_rate
    p = 1.0 / jnp.maximum(time_constant, 0.01)
    correction = jnp.clip(err * p, -jnp.abs(err) / dt, jnp.abs(err) / dt)
    new = target_rate + correction * dt
    step = accel_max * dt
    return jnp.clip(new, target_rate - step, target_rate + step)


def shape_angle(error_angle, target_rate, accel_max, dt, time_constant):
    """Angle error -> shaped rate target: sqrt-controller demand, then the
    same accel-limited rate slew as shape_rate."""
    p = 1.0 / jnp.maximum(time_constant, 0.01)
    desired_rate = sqrt_controller(error_angle, p, accel_max, dt)
    return shape_rate(target_rate, desired_rate, accel_max, dt, 0.0)


def angular_to_euler_accel_limit(att: el.Quaternion, accel_body: jnp.ndarray) -> jnp.ndarray:
    """Conservative per-euler-axis acceleration budget from body-axis limits.

    Each euler acceleration drives a mix of body axes; dividing each body
    budget by its (trig-clipped) projection and taking the min guarantees no
    body limit is exceeded at any attitude in the clip band.
    """
    roll, pitch, _ = quat_to_euler(att)
    sin_phi = jnp.clip(jnp.abs(jnp.sin(roll)), 0.1, 1.0)
    cos_phi = jnp.clip(jnp.abs(jnp.cos(roll)), 0.1, 1.0)
    sin_theta = jnp.clip(jnp.abs(jnp.sin(pitch)), 0.1, 1.0)
    cos_theta = jnp.clip(jnp.abs(jnp.cos(pitch)), 0.1, 1.0)
    ax, ay, az = accel_body
    roll_lim = ax
    pitch_lim = jnp.minimum(ay / cos_phi, az / sin_phi)
    yaw_lim = jnp.minimum(
        jnp.minimum(ax / sin_theta, ay / (sin_phi * cos_theta)),
        az / (cos_phi * cos_theta),
    )
    return jnp.stack([roll_lim, pitch_lim, yaw_lim])


# --- tilt-priority attitude error --------------------------------------------


def tilt_heading_error(q_target: el.Quaternion, q_body: el.Quaternion):
    """Decompose body->target into tilt (thrust-vector) then heading twist.

    Returns (att_error_body 3-vec, thrust_error_angle).  The tilt rotation
    aligns the body thrust axis (+Z) with the target's; what remains is a
    pure rotation about the (corrected) thrust axis — the heading error.
    Correcting tilt before heading is what keeps a quad from trading lift
    for yaw during large maneuvers.
    """
    up = jnp.asarray([0.0, 0.0, 1.0])
    z_body = q_body @ up
    z_tgt = q_target @ up
    cosang = jnp.clip(jnp.dot(z_body, z_tgt), -1.0, 1.0)
    tilt_angle = jnp.arccos(cosang)
    axis_w = jnp.cross(z_body, z_tgt)
    axis_norm = jnp.linalg.norm(axis_w)
    ok = jnp.minimum(axis_norm, tilt_angle) > 1e-6
    axis_w = jnp.where(ok, axis_w / jnp.maximum(axis_norm, 1e-30), up)
    # express the tilt axis in the body frame, where the rate loop acts
    axis_b = q_body.inverse() @ axis_w
    q_tilt = el.Quaternion.from_axis_angle(axis_b, jnp.where(ok, tilt_angle, 0.0))
    tilt_vec = quat_to_axis_angle(q_tilt)
    # residual after tilt correction is the heading twist
    q_head = q_tilt.inverse() * (q_body.inverse() * q_target)
    head_vec = quat_to_axis_angle(q_head)
    err = jnp.stack([tilt_vec[0], tilt_vec[1], head_vec[2]])
    return err, tilt_angle
