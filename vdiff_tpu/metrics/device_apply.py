"""Device-parallel batched application for the metric hot loops.

The reference metric stack streams 50k generated images through one GPU —
the InceptionV3 forward per batch (fid_score.py:106-125), the VGG16 feature
extraction (precision_recall.py:100-116) and the blocked cdist calls
(precision_recall.py:120-174) are its eval-time hot paths (SURVEY.md §3.4).
Here the same loops optionally take a data ``Mesh``: sub-batches are padded
to one fixed tile size and batch-sharded over every mesh axis, so XLA
partitions the network forward / distance matmul across chips with no model
changes and a single compiled shape (``eval.py --dp``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def apply_batched(jit_fn: Callable, x, batch_size: int, mesh=None) -> np.ndarray:
    """Run a jitted per-batch fn over ``x`` in chunks; returns stacked rows.

    Without a mesh this is the plain numpy chunking loop every metric loader
    used before. With a mesh, each chunk is edge-padded to ``batch_size``
    (itself rounded up to a device-count multiple) and sharded over the batch
    axis — padded rows are computed redundantly and sliced off, keeping one
    compiled shape for the whole stream.
    """
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    n = len(x)
    if n == 0:
        # shared across three metric loaders: an empty stream must yield an
        # empty (0, ...) result, not a np.concatenate([]) crash; a zero-batch
        # trace gives the correct output feature shape. Requires the empty
        # to still carry its item shape — np.asarray([]) collapses to rank 1,
        # which jit_fn would reject with an opaque NHWC shape error.
        if x.ndim < 2:
            raise ValueError(
                "apply_batched: empty input must keep its item shape, e.g. "
                f"np.zeros((0, H, W, C)) — got shape {x.shape}"
            )
        return np.asarray(jit_fn(jnp.zeros((0,) + x.shape[1:], x.dtype)))
    outs = []
    if mesh is not None:
        from ..parallel import batch_sharding

        n_dev = mesh.devices.size
        tile = -(-batch_size // n_dev) * n_dev
        sharding = batch_sharding(mesh, x.ndim)
        for s in range(0, n, tile):
            chunk = x[s : s + tile]
            k = len(chunk)
            if k < tile:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], tile - k, axis=0)])
            outs.append(np.asarray(jit_fn(jax.device_put(chunk, sharding)))[:k])
    else:
        for s in range(0, n, batch_size):
            outs.append(np.asarray(jit_fn(jnp.asarray(x[s : s + batch_size]))))
    return np.concatenate(outs)


def resolve_eval_mesh(dp: bool):
    """The eval CLI's mesh gate: a data mesh when ``--dp`` is set and more
    than one device exists, else None (single-device loops unchanged).

    Metric loops hold the full image batch on every host (the samples are
    gathered, not sharded), so under multi-process the mesh covers only this
    host's addressable devices — each host runs the replicated metric pass
    local-device-parallel instead of crashing device_put on remote shards."""
    if not dp:
        return None
    import jax

    devices = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    if len(devices) < 2:
        return None
    from ..parallel import create_mesh

    return create_mesh(devices)
