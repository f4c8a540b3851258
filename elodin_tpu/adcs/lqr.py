"""Yang analytic quaternion LQR
(parity: fsw/roci/adcs/src/yang_lqr.rs; paper: Yang, "Analytic LQR Design for
Spacecraft Control System Based on Quaternion Model")."""

from __future__ import annotations

import jax.numpy as jnp

from ..spatial import quat_inverse, quat_mul


def lqr_control_mats(j, q_ang_vel, q_pos, r):
    """(yang_lqr.rs:16-26): diagonal D and K gains."""
    j = jnp.asarray(j)
    q_ang_vel = jnp.asarray(q_ang_vel)
    q_pos = jnp.asarray(q_pos)
    r = jnp.asarray(r)
    k_diag = jnp.sqrt(q_pos / r)
    d_diag = jnp.sqrt(q_ang_vel / r + j * k_diag)
    return d_diag, k_diag


def yang_lqr_control(att_est, ang_vel, goal, d, k):
    """Control torque in body frame (yang_lqr.rs:39-55); batched."""
    att_est = jnp.asarray(att_est)
    goal = jnp.asarray(goal)
    error = quat_mul(quat_inverse(att_est), goal)
    # signum of the scalar part (yang_lqr.rs uses .signum()): using the
    # raw w value would scale torque by cos(theta/2), collapsing control
    # authority ~1000x near a 180-degree slew
    w = error[..., 3:4]
    sign = jnp.where(w >= 0, 1.0, -1.0)
    error_vec = error[..., :3]
    return -(jnp.asarray(ang_vel) * d) + sign * (error_vec * k)


class YangLQR:
    def __init__(self, j, q_ang_vel, q_pos, r):
        self.d, self.k = lqr_control_mats(j, q_ang_vel, q_pos, r)

    def control(self, att_est, ang_vel, goal):
        return yang_lqr_control(att_est, ang_vel, goal, self.d, self.k)
