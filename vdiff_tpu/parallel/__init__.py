from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    create_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    sync_global_devices,
)
from .fsdp import (
    leaf_partition_spec,
    resolve_fsdp_axis,
    shard_state,
    state_bytes_per_device,
    state_shardings,
)

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "batch_sharding",
    "create_mesh",
    "leaf_partition_spec",
    "replicate_tree",
    "replicated",
    "resolve_fsdp_axis",
    "shard_batch",
    "shard_state",
    "state_bytes_per_device",
    "state_shardings",
    "sync_global_devices",
]
