from .mesh import (  # noqa: F401
    make_mesh,
    shard_cols,
    sharded_step,
    entity_sharding,
)
