"""Source-compatibility alias: ``import elodin as el`` resolves to the
TPU-native implementation in ``elodin_tpu``."""

from elodin_tpu import *  # noqa: F401,F403
from elodin_tpu import (  # noqa: F401
    __version__,
    monte_carlo,
    s10,
)
import elodin_tpu as _impl
import sys as _sys

# expose submodules under the elodin.* namespace too
for _name in (
    "spatial", "component", "entity", "system", "six_dof", "world",
    "execimpl", "jaxsim", "dataframe", "cli", "step_context",
):
    _sys.modules[f"elodin.{_name}"] = getattr(_impl, _name, None) or __import__(
        f"elodin_tpu.{_name}", fromlist=["_"]
    )
del _name, _sys, _impl
