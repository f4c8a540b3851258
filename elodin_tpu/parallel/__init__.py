from .mesh import (  # noqa: F401
    init_multihost,
    make_mesh,
    put_global,
    shard_cols,
    sharded_step,
    entity_sharding,
)
