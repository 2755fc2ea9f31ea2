"""Tensor parallelism for serving — split one forward pass across chips.

The reference has no model-parallel story at all: a model must fit one GPU and
a batch element is computed by exactly one device. On TPU the 1-D
weight-stationary recipe (scaling-book) is a pure annotation: every kernel
with an output-features dim divisible by the mesh is stored sharded on that
dim, so each chip computes its slice of every layer's output channels and the
SPMD partitioner inserts the activation collectives between layers. Batch
REPLICATED + params sharded — the complement of data parallelism — is the
right placement for low-latency sampling of a model too large (or a batch too
small) for one chip.

Usage (generate.py ``--tp``, tests/test_tp.py):

    mesh = create_tp_mesh()
    params = jax.device_put(params, tp_param_shardings(mesh, params))
    # ... jit the same denoise_fn; nothing else changes.

Numerics are unchanged (same reduction shapes — test_tp.py pins equality with
the single-device forward); per-device param bytes drop ~1/N.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# TP shards smaller leaves than FSDP does (2^12 elements): with the batch
# replicated every unsharded kernel is redundant *compute*, not just memory.
TP_MIN_SHARD_SIZE = 2**12


def create_tp_mesh(devices=None, axis_name: str = MODEL_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def tp_param_shardings(mesh: Mesh, params, axis_name: str = MODEL_AXIS,
                       min_size: int = TP_MIN_SHARD_SIZE):
    """Output-features sharding for every rank>=2 kernel that divides the mesh.

    Covers Flax Conv (H, W, I, O) and Dense (i, o) kernels uniformly — the
    trailing dim is the output-features dim in both layouts. Biases and GN
    scale/bias stay replicated (sub-lane vectors; the partitioner fuses their
    add into the sharded conv epilogue either way). The fused qkv projection
    (1, 1, C, 3C) shards its packed trailing dim too — attention then gathers
    the full q/k/v it needs; correctness is unaffected.
    """
    size = mesh.shape[axis_name]

    def spec(leaf):
        shape = np.shape(leaf)
        if (
            len(shape) >= 2
            and shape[-1] % size == 0
            and math.prod(shape) >= min_size
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis_name))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def tp_shard_params(mesh: Mesh, params, axis_name: str = MODEL_AXIS):
    """Place a param tree tensor-parallel over the mesh."""
    return jax.device_put(params, tp_param_shardings(mesh, params, axis_name))
