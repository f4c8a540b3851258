"""Source-compatibility alias: ``import elodin as el`` resolves to the
TPU-native implementation in ``elodin_tpu``."""

import sys as _sys

import elodin_tpu as _impl
from elodin_tpu import *  # noqa: F401,F403
from elodin_tpu import (  # noqa: F401
    __version__,
    monte_carlo,
    s10,
)
from elodin_tpu import db as db  # noqa: F401
from elodin_tpu.gravity import egm08 as egm08, j2 as j2  # noqa: F401
from elodin_tpu import frames as frames, wmm as wmm  # noqa: F401
from elodin_tpu import linalg as linalg  # noqa: F401
from elodin_tpu import adcs as adcs  # noqa: F401
from elodin_tpu._config import _get_cache_dir  # noqa: F401

# `from elodin.elodin import X` — the reference's native extension module
# path (libs/nox-py/src/lib.rs pymodule); everything lives in elodin_tpu here
_sys.modules["elodin.elodin"] = _impl
_sys.modules["elodin.egm08"] = egm08
_sys.modules["elodin.j2"] = j2
_sys.modules["elodin.db"] = db
_sys.modules["elodin.frames"] = frames
_sys.modules["elodin.wmm"] = wmm
_sys.modules["elodin.adcs"] = adcs
_sys.modules["elodin.monte_carlo"] = monte_carlo
_sys.modules["elodin.s10"] = s10
_sys.modules["elodin.jaxsim"] = _impl.jaxsim

for _name in (
    "spatial", "component", "entity", "system", "six_dof", "world",
    "execimpl", "dataframe", "cli", "step_context",
):
    _sys.modules[f"elodin.{_name}"] = __import__(
        f"elodin_tpu.{_name}", fromlist=["_"]
    )
del _name, _sys, _impl
