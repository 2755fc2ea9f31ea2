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
from .tp import MODEL_AXIS, create_tp_mesh, tp_param_shardings, tp_shard_params
from .spatial import spatial_constraint, spatial_sharding

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_tp_mesh",
    "spatial_constraint",
    "spatial_sharding",
    "tp_param_shardings",
    "tp_shard_params",
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
