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


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all local+global devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


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
