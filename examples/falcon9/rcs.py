"""Cold-gas RCS: interstage thruster geometry, wrench, torque allocation.

Parity target: reference examples/falcon9/rcs.py (WHITEPAPER §10.3).  Eight
nitrogen thrusters in two pods on the +/-Y sides of the interstage; four
fire +/-Z (pitch pairs across pods, roll pairs same-side), four fire +/-Y
(yaw via the long station lever).  Pure-torque pairs exist for every axis,
so the allocator can be a per-axis table lookup instead of an optimization.

The pair tables and their torque signs are derived numerically from the
effectiveness matrix at import (numpy), so a geometry edit cannot silently
flip an axis; the runtime `allocate_torque` is a fully vectorized jnp map —
no Python branching on traced values.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from constants import RCS_STATION_M, RCS_THRUST_PER_THRUSTER_N, STAGE1_RADIUS_M

N_RCS = 8

# Geometry: (pod side sign, exhaust-opposite force direction).
_SIDE = np.array([+1, +1, -1, -1, +1, +1, -1, -1], dtype=float)
_FORCE = np.array(
    [
        [0.0, 0.0, +1.0],
        [0.0, 0.0, -1.0],
        [0.0, 0.0, +1.0],
        [0.0, 0.0, -1.0],
        [0.0, +1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, +1.0, 0.0],
    ]
)
_POS = np.column_stack(
    [np.full(N_RCS, RCS_STATION_M), _SIDE * STAGE1_RADIUS_M, np.zeros(N_RCS)]
)

RCS_POS = jnp.asarray(_POS)
RCS_FORCE_DIR = jnp.asarray(_FORCE)

# Thruster pairs per torque axis whose off-axis wrench components cancel.
_AXIS_PAIRS = {
    0: ((0, 3), (1, 2)),  # roll: same-side Z pairs
    1: ((1, 3), (0, 2)),  # pitch: cross-pod Z pairs
    2: ((4, 7), (5, 6)),  # yaw: Y pairs
}


def rcs_wrench(levels, cg_station_m, thrust_n=RCS_THRUST_PER_THRUSTER_N):
    """Summed body-frame (force, torque) for thruster levels in [0, 1]."""
    f_each = (thrust_n * levels)[:, None] * RCS_FORCE_DIR
    arm = RCS_POS - jnp.asarray([1.0, 0.0, 0.0]) * cg_station_m
    return jnp.sum(f_each, axis=0), jnp.sum(jnp.cross(arm, f_each), axis=0)


def effectiveness_matrix(cg_station_m, thrust_n=RCS_THRUST_PER_THRUSTER_N):
    """B (6 x N): [force; torque] per unit level, all thrusters at once."""
    f_each = thrust_n * RCS_FORCE_DIR
    arm = RCS_POS - jnp.asarray([1.0, 0.0, 0.0]) * cg_station_m
    t_each = jnp.cross(arm, f_each)
    return jnp.concatenate([f_each.T, t_each.T], axis=0)


def _pair_tables(cg_station_m: float):
    """(masks (3,2,N), signed authorities (3,2)) for the torque-pair groups.
    Group order along dim 1: [positive-torque group, negative-torque group]."""
    b = np.asarray(effectiveness_matrix(jnp.asarray(float(cg_station_m))))[3:6]
    masks = np.zeros((3, 2, N_RCS))
    auth = np.zeros((3, 2))
    for axis, groups in _AXIS_PAIRS.items():
        for g in groups:
            torque = b[axis, g[0]] + b[axis, g[1]]
            slot = 0 if torque > 0 else 1
            masks[axis, slot, list(g)] = 1.0
            auth[axis, slot] = abs(torque)
    return masks, auth


# Authority per unit level depends on the CG station only through the yaw/
# pitch lever; derive the group structure once at a nominal CG and rescale
# the authority at the actual CG inside allocate_torque.
_MASKS_NOM, _ = _pair_tables(20.0)
_MASKS = jnp.asarray(_MASKS_NOM)
MIN_IMPULSE_FRAC = 0.02


def allocate_torque(torque_cmd_body, cg_station_m, thrust_n=RCS_THRUST_PER_THRUSTER_N):
    """Desired body torque -> thruster levels in [0, 1].

    Per axis: pick the pair group whose torque sign matches the command,
    command level = |tau| / group authority (clipped), and drop demands under
    the minimum-impulse floor (2% of authority) to protect the cold-gas
    budget.  Fully vectorized; safe under vmap.
    """
    b_t = effectiveness_matrix(cg_station_m, thrust_n)[3:6]  # (3, N)
    group_auth = _MASKS @ b_t.T  # (3, 2, 3): torque of each group per axis
    axis_auth = jnp.stack(
        [group_auth[a, :, a] for a in range(3)]
    )  # (3, 2) signed authority of [pos, neg] groups
    cmd = torque_cmd_body  # (3,)
    pick_pos = cmd >= 0.0
    auth = jnp.where(pick_pos, jnp.abs(axis_auth[:, 0]), jnp.abs(axis_auth[:, 1]))
    level = jnp.clip(jnp.abs(cmd) / jnp.maximum(auth, 1e-9), 0.0, 1.0)
    level = jnp.where(jnp.abs(cmd) > MIN_IMPULSE_FRAC * auth, level, 0.0)
    chosen = jnp.where(pick_pos[:, None], _MASKS[:, 0, :], _MASKS[:, 1, :])  # (3, N)
    return jnp.clip(jnp.sum(level[:, None] * chosen, axis=0), 0.0, 1.0)
