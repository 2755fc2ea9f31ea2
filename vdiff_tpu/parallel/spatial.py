"""Spatial partitioning — shard the image height across chips.

The third serving axis after data and tensor parallelism: one *image* split
across devices. XLA's SPMD partitioner natively supports spatially-partitioned
convolutions (halo exchange for the 3x3 receptive fields rides ICI), GroupNorm
statistics turn into a psum over the spatial shards, and attention gathers the
full token axis where it needs it — all derived from one sharding constraint
on the activations; the model code does not change.

This is the image-model analogue of sequence parallelism, and something the
reference's single-GPU forward cannot express at all: sampling at resolutions
whose activations exceed one chip's HBM (e.g. 1024x1024 with the celeba
architecture) just works by adding devices.

Usage (generate.py ``--spatial-shard``, tests/test_tp.py):

    mesh = create_tp_mesh()          # 1-D mesh, any axis name
    def denoise_fn(x_t, t, y):
        x_t = spatial_constraint(x_t, mesh)
        return model.apply({"params": params}, x_t, t, y, train=False)

The constraint inside the (scanned) denoise step re-anchors the placement
every diffusion step, so the whole trajectory stays height-sharded.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import MODEL_AXIS


def spatial_sharding(mesh: Mesh, axis_name: str = None, ndim: int = 4) -> NamedSharding:
    """NHWC activations sharded on H over the mesh's (single) axis."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    spec = [None] * ndim
    spec[1] = axis_name  # H of NHWC
    return NamedSharding(mesh, P(*spec))


def spatial_constraint(x, mesh: Mesh, axis_name: str = None):
    """Constrain an NHWC activation to be height-sharded."""
    return jax.lax.with_sharding_constraint(x, spatial_sharding(mesh, axis_name, x.ndim))
