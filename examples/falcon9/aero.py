"""All-attitude booster aerodynamics: Mach tables, config blend, plume
dominance, grid fins.

Parity target: reference examples/falcon9/aero.py (WHITEPAPER §8) — the same
physical model re-expressed for batched in-graph use: every path is pure
jnp on static-shape arrays so a 10k-sample campaign vmaps through it.

Model summary (body frame, +X nose, engines thrust along +X):
* one Mach-indexed coefficient bank (axial ascent/descent, cross-flow,
  fin effectiveness) blended between nose-first and engines-first flow by a
  smooth tanh of the axial air-relative velocity;
* force applied at the blended center-of-pressure station with pitch/yaw
  rate damping Cmq nondimensionalized on body length;
* plume dominance kappa = C_T/(C_T + C_T0) erases aero during retro burns;
* four X-configured grid fins mix (pitch, yaw, roll) commands into
  deflections and produce tangential forces at the fin station.

Coefficient values are EST calibration data (campaign priors), carried over
verbatim — the code is the rebuild, the numbers are the model.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from constants import S_REF_M2, STAGE1_LENGTH_M, STAGE1_RADIUS_M

# One Mach grid for every table in the bank.
MACH_PTS = jnp.asarray([0.0, 0.6, 0.9, 1.1, 1.5, 2.0, 3.0, 5.0, 10.0])

# Coefficient bank rows (EST priors; descent CA anchored to the recorded
# CRS-12 descent q-bar peak of ~60 kPa).
CA_ASCENT = jnp.asarray([0.30, 0.32, 0.45, 0.55, 0.50, 0.42, 0.35, 0.30, 0.28])
CA_DESCENT = jnp.asarray([1.90, 1.95, 2.10, 2.40, 2.30, 2.20, 2.10, 2.00, 1.90])
CN_CROSS = jnp.asarray([1.20, 1.20, 1.25, 1.35, 1.30, 1.25, 1.20, 1.15, 1.10])
CN_DELTA_FIN = jnp.asarray([1.2, 1.2, 0.9, 0.8, 1.1, 1.3, 1.25, 1.2, 1.1])

# Center-of-pressure stations (m above the engine plane).  Bare-body
# nose-first CP sits ahead of the CG (TVC holds the instability); fins-out
# engines-first CP sits behind it (statically stable).
X_CP_ASCENT_M = 28.0
X_CP_DESCENT_M = 26.0

# Pitch/yaw damping derivatives on body length (negative = stable).
CMQ_ASCENT = -2.5
CMQ_DESCENT = -12.0

# Plume-dominance scale: kappa = C_T / (C_T + CT0).
PLUME_CT0 = 1.0

# --- grid fins (X configuration at the interstage) ---------------------------
FIN_STATION_M = 44.0
S_FIN_M2 = 1.5
_AZ = np.deg2rad([45.0, 135.0, 225.0, 315.0])
# Tangential force direction for + deflection, and hinge positions.
FIN_FORCE_DIR = jnp.asarray(
    np.column_stack([np.zeros(4), -np.sin(_AZ), np.cos(_AZ)])
)
FIN_POS = jnp.asarray(
    np.column_stack(
        [np.full(4, FIN_STATION_M), STAGE1_RADIUS_M * np.cos(_AZ), STAGE1_RADIUS_M * np.sin(_AZ)]
    )
)
# (4,3) mixer columns = (pitch, yaw, roll), chosen so a positive command
# yields positive body torque about that axis.  The fins sit AHEAD of the CG
# (station 44 m vs CG ~20 m), so for +pitch torque (about +Y) the net fin
# force must point along -Z: tau_y = -arm_x * F_z with arm_x > 0.  For +yaw
# torque (about +Z) the force points along +Y: tau_z = +arm_x * F_y.  Roll
# deflects all fins together (tangential forces cancel, torques add about +X).
FIN_MIX = jnp.concatenate(
    [-FIN_FORCE_DIR[:, 2:3], FIN_FORCE_DIR[:, 1:2], jnp.ones((4, 1))], axis=1
)

_X_HAT = jnp.asarray([1.0, 0.0, 0.0])


def mach_lookup(table, mach):
    """Linear interpolation of one coefficient row at `mach`."""
    return jnp.interp(mach, MACH_PTS, table)


def config_blend(v_axial_body):
    """1 = nose-first (ascent tables), 0 = engines-first (descent tables);
    smooth over +-~100 m/s of axial air-relative velocity."""
    return 0.5 * (1.0 + jnp.tanh(v_axial_body / 50.0))


def plume_dominance(thrust_n, qbar_pa):
    """Fraction of aerodynamic force erased by the engine plume, in [0, 1)."""
    ct = thrust_n / jnp.maximum(qbar_pa * S_REF_M2, 1.0)
    return ct / (ct + PLUME_CT0)


def body_aero_wrench(
    v_air_body,
    mach,
    qbar_pa,
    cg_station_m,
    omega_body=None,
    ca_scale=1.0,
    cn_scale=1.0,
):
    """Continuous all-attitude aero (force, torque) in the body frame.

    Axial + cross-flow decomposition of the air-relative unit vector keeps
    the model continuous through the 90-deg flip; the wrench acts at the
    blended CP, and Cmq damps the perpendicular body rates.
    """
    speed = jnp.linalg.norm(v_air_body)
    v_hat = v_air_body / jnp.maximum(speed, 1e-6)
    w = config_blend(v_air_body[0])
    ca = ca_scale * (
        w * mach_lookup(CA_ASCENT, mach) + (1.0 - w) * mach_lookup(CA_DESCENT, mach)
    )
    cn = cn_scale * mach_lookup(CN_CROSS, mach)
    axial = v_hat[0]
    cross = v_hat - axial * _X_HAT
    force = -qbar_pa * S_REF_M2 * (ca * axial * _X_HAT + cn * cross)
    station = w * X_CP_ASCENT_M + (1.0 - w) * X_CP_DESCENT_M
    torque = jnp.cross((station - cg_station_m) * _X_HAT, force)
    omega = jnp.zeros(3) if omega_body is None else omega_body
    cmq = w * CMQ_ASCENT + (1.0 - w) * CMQ_DESCENT
    damp_gain = (
        qbar_pa * S_REF_M2 * STAGE1_LENGTH_M**2 / (2.0 * jnp.maximum(speed, 1.0)) * cmq
    )
    torque = torque + damp_gain * omega * jnp.asarray([0.0, 1.0, 1.0])
    return force, torque


def fin_wrench(deltas_rad, mach, qbar_pa, cg_station_m, eff_scale=1.0):
    """(force, torque) from the four grid-fin deflections, body frame."""
    cnd = eff_scale * mach_lookup(CN_DELTA_FIN, mach)
    f_each = (qbar_pa * S_FIN_M2 * cnd * deltas_rad)[:, None] * FIN_FORCE_DIR
    arm = FIN_POS - jnp.asarray([1.0, 0.0, 0.0]) * cg_station_m
    return jnp.sum(f_each, axis=0), jnp.sum(jnp.cross(arm, f_each), axis=0)


def fin_mix(pitch_yaw_roll):
    """(pitch, yaw, roll) command (rad) -> four deflections (rad)."""
    return FIN_MIX @ pitch_yaw_roll


def fin_torque_authority(mach, qbar_pa, cg_station_m):
    """Per-axis |torque| per radian of (pitch, yaw, roll) command — the
    attitude controller's deflection scaling."""
    eye = jnp.eye(3)

    def one(cmd):
        _, t = fin_wrench(fin_mix(cmd), mach, qbar_pa, cg_station_m)
        return jnp.abs(t)

    per = jnp.stack([one(eye[i]) for i in range(3)])  # (cmd_axis, torque_axis)
    return jnp.asarray([per[2, 0], per[0, 1], per[1, 2]])  # roll, pitch, yaw -> x,y,z
