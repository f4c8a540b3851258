from .j2 import J2  # noqa: F401
from .egm08 import EGM08  # noqa: F401
