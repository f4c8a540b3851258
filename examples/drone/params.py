"""ArduPilot-convention tuning parameters for the EDU-450 class quad.

Parity target: reference examples/drone/params.py — the public ArduPilot
parameter vocabulary (https://ardupilot.org/copter/docs/parameters.html).
Acceleration limits are centi-degrees/s^2 and filter cutoffs Hz, exactly as
ArduPilot documents them; `as_rad_s2` converts to the SI units the shaping
pipeline works in.
"""

import jax.numpy as jnp

# Angular acceleration limits (centi-deg/s^2): 10-inch-prop class defaults.
ATC_ACCEL_R_MAX = 110000.0
ATC_ACCEL_P_MAX = 110000.0
ATC_ACCEL_Y_MAX = 27000.0

# Input shaping time constants (s).
ATC_INPUT_TC = 0.15
PILOT_Y_RATE_TC = 0.0

# Rate-PID term filters (Hz): target / error / derivative per axis.
ATC_RAT_RLL_FLTT, ATC_RAT_RLL_FLTE, ATC_RAT_RLL_FLTD = 20.0, 0.0, 10.0
ATC_RAT_PIT_FLTT, ATC_RAT_PIT_FLTE, ATC_RAT_PIT_FLTD = 20.0, 0.0, 10.0
ATC_RAT_YAW_FLTT, ATC_RAT_YAW_FLTE, ATC_RAT_YAW_FLTD = 20.0, 2.5, 0.0

FLTT = jnp.asarray([ATC_RAT_RLL_FLTT, ATC_RAT_PIT_FLTT, ATC_RAT_YAW_FLTT])
FLTE = jnp.asarray([ATC_RAT_RLL_FLTE, ATC_RAT_PIT_FLTE, ATC_RAT_YAW_FLTE])
FLTD = jnp.asarray([ATC_RAT_RLL_FLTD, ATC_RAT_PIT_FLTD, ATC_RAT_YAW_FLTD])


def accel_limits_rad_s2() -> jnp.ndarray:
    """Body-axis (roll, pitch, yaw) angular-acceleration caps in rad/s^2."""
    cdeg = jnp.asarray([ATC_ACCEL_R_MAX, ATC_ACCEL_P_MAX, ATC_ACCEL_Y_MAX])
    return cdeg * 0.01 * jnp.pi / 180.0
