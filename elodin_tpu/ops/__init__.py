from .pairwise import pairwise_gravity, pairwise_gravity_reference  # noqa: F401
