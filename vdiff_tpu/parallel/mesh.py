"""Device-mesh utilities — the TPU-native communication layer.

Replaces the reference's NCCL/DDP surface (SURVEY.md §2.3; train.py:129-156,
train_utils.py:157,181-183,293-294) with XLA compiled collectives over ICI:

* process-group init            → implicit TPU runtime / ``jax.distributed``
* DDP gradient all-reduce       → automatic psum inserted by jit when the batch
                                  is sharded over the 'data' axis and params
                                  are replicated
* loss reduce / sample gather   → outputs of the jitted step are produced with
                                  replicated sharding (an ICI all-gather XLA
                                  schedules itself)
* barrier                       → ``multihost_utils.sync_global_devices``
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS,
                fsdp_size: int = 1) -> Mesh:
    """Data-parallel mesh over all local+global devices.

    ``fsdp_size > 1`` builds a 2-D (data, fsdp) hybrid mesh instead: the batch
    still splits over every device, but FSDP state sharding is confined to the
    size-``fsdp_size`` minor axis — on a pod slice that keeps the per-step
    param all-gathers inside a small ICI neighborhood while gradients cross the
    ``data`` axis once per step (HSDP).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if fsdp_size and fsdp_size > 1:
        if devices.size % fsdp_size:
            raise ValueError(f"fsdp_size {fsdp_size} must divide device count {devices.size}")
        return Mesh(devices.reshape(-1, fsdp_size), (axis_name, FSDP_AXIS))
    return Mesh(devices, (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over EVERY mesh axis; replicate the rest.

    Under a hybrid (data, fsdp) mesh both axes split the batch — they differ
    only in where the state lives, not in how data parallelism divides work.
    """
    return NamedSharding(mesh, P(tuple(mesh.axis_names), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Assemble host arrays into batch-sharded global arrays.

    Single-process: a plain device_put with the batch sharding. Multi-process:
    each host holds only its loader shard (data.py shards the permutation per
    process), so the global array is assembled from process-local data —
    the jax analogue of DistributedSampler feeding per-rank DataLoaders.
    """

    def _put(a):
        if a is None:
            return None
        sharding = batch_sharding(mesh, np.ndim(a))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(a))
        return jax.device_put(a, sharding)

    out = tuple(_put(a) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def sync_global_devices(name: str = "barrier"):
    """Cross-host barrier (reference dist.barrier, train_utils.py:294)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
