from .sixdof_batch import build_batched_sixdof  # noqa: F401
