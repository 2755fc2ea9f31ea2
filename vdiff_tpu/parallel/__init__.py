from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    sync_global_devices,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "sync_global_devices",
]
