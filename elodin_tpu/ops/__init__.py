from .pairwise import pairwise_gravity, pairwise_gravity_reference  # noqa: F401
from .precise import const_pin  # noqa: F401
