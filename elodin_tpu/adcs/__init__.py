"""Attitude determination & control algorithms as JAX functions.

Parity target: the reference's roci-adcs crate (fsw/roci/adcs) — TRIAD,
multiplicative EKF, Merwe-sigma-point UKF, MAG.I.CAL + UKF magnetometer
calibration, and the Yang quaternion LQR.  The reference implements these in
``no_std`` Rust for the flight computer AND re-derives them in sim examples;
here one JAX implementation serves both simulation content and (jit-compiled)
softwware-in-the-loop, and everything is batched/vmap-able for Monte Carlo
dispersal of estimator behavior.
"""

from .triad import triad  # noqa: F401
from .mekf import Mekf, calculate_covariance  # noqa: F401
from .ukf import (  # noqa: F401
    MerweConfig,
    UkfState,
    cross_covar,
    innovate,
    predict,
    unscented_transform,
)
from .lqr import YangLQR, lqr_control_mats, yang_lqr_control  # noqa: F401
from .magical import magical_calibrate  # noqa: F401
from .magkal import MagKal  # noqa: F401
