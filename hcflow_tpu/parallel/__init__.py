from .mesh import (  # noqa: F401
    batch_sharding,
    init_distributed,
    is_main_process,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    spatial_sharding,
)
