"""Improved Precision & Recall (Kynkäänniemi et al.) — re-design of reference
``v_diffusion/metrics/precision_recall.py`` (stylegan2-ada recipe).

* Feature extractor: Flax VGG16 (see vgg.py) replacing NVIDIA's TorchScript
  VGG16 download (precision_recall.py:23-47); any callable (N,H,W,C)→(N,D)
  works, enabling tests without pretrained weights.
* k-th-NN radii and precision/recall membership tests run as **blocked pairwise
  squared distances on the accelerator** (jit over (row_batch × col_batch)
  tiles — the MXU-friendly ‖a‖²+‖b‖²−2a·bᵀ form), mirroring the reference's
  blocked torch.cdist (precision_recall.py:69-174) without materializing the
  full 50k×50k matrix.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Manifold = namedtuple("Manifold", ["features", "kth"])


@jax.jit
def _sq_dists(a, b):
    """(m, d), (n, d) → (m, n) squared euclidean distances via the dot-product
    expansion (runs on the MXU; f32 accumulate)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    d2 = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)


def _sq_dists_np(ri, cj, mesh=None) -> np.ndarray:
    """One distance tile on device. With a mesh, the row block is edge-padded
    to a device multiple and sharded over the batch axis while the column
    block replicates — jit partitions the MXU matmul across chips and the
    host gathers the (rows, cols) tile (eval.py --dp)."""
    if mesh is None:
        return np.asarray(_sq_dists(jnp.asarray(ri), jnp.asarray(cj)))
    from ..parallel import batch_sharding, replicated

    ri = np.asarray(ri)
    n = len(ri)
    pad = (-n) % mesh.devices.size
    if pad:
        ri = np.concatenate([ri, np.repeat(ri[-1:], pad, axis=0)])
    a = jax.device_put(ri, batch_sharding(mesh, 2))
    b = jax.device_put(np.asarray(cj), replicated(mesh))
    return np.asarray(_sq_dists(a, b))[:n]


def compute_distance(row_features, col_features, row_batch_size=10000, col_batch_size=10000,
                     mesh=None):
    """Blocked full distance matrix (host-assembled, device-computed)."""
    m = len(row_features)
    n = len(col_features)
    out = np.empty((m, n), np.float32)
    for i in range(0, m, row_batch_size):
        ri = np.asarray(row_features[i : i + row_batch_size])
        for j in range(0, n, col_batch_size):
            cj = np.asarray(col_features[j : j + col_batch_size])
            out[i : i + row_batch_size, j : j + col_batch_size] = np.sqrt(
                _sq_dists_np(ri, cj, mesh=mesh)
            )
    return out


def _kth_radii(features: np.ndarray, k: int, row_batch_size: int, col_batch_size: int,
               mesh=None):
    """k-th nearest-neighbour distance per point (self excluded via k+1)."""
    n = len(features)
    kth = np.empty((n,), np.float32)
    for i in range(0, n, row_batch_size):
        ri = features[i : i + row_batch_size]
        # running top-(k+1) smallest distances across column blocks
        best = np.full((len(ri), k + 1), np.inf, np.float32)
        for j in range(0, n, col_batch_size):
            d2 = _sq_dists_np(ri, features[j : j + col_batch_size], mesh=mesh)
            merged = np.concatenate([best, d2], axis=1)
            best = np.partition(merged, k, axis=1)[:, : k + 1]
        kth[i : i + row_batch_size] = np.sqrt(np.sort(best, axis=1)[:, k])
    return kth


class ManifoldBuilder:
    """Extract features and k-NN radii for a dataset or image folder
    (reference ManifoldBuilder, precision_recall.py:50-174)."""

    def __init__(
        self,
        data=None,
        features: Optional[np.ndarray] = None,
        feature_fn: Optional[Callable] = None,
        extr_batch_size: int = 128,
        max_sample_size: int = 50000,
        nhood_size: int = 3,
        row_batch_size: int = 10000,
        col_batch_size: int = 10000,
        random_state: int = 1234,
        mesh=None,
        **_ignored,
    ):
        if features is None:
            if feature_fn is None:
                from .vgg import load_vgg_features

                feature_fn = load_vgg_features(mesh=mesh)
            n = len(data)
            idx = np.arange(n)
            if n > max_sample_size:
                idx = np.random.RandomState(random_state).choice(
                    n, size=max_sample_size, replace=False
                )
                idx.sort()
            feats = []
            for s in range(0, len(idx), extr_batch_size):
                batch_idx = idx[s : s + extr_batch_size]
                x = self._load(data, batch_idx)
                feats.append(np.asarray(feature_fn(x), np.float16))
            features = np.concatenate(feats)
        self.features = features
        self.kth = _kth_radii(
            features.astype(np.float32), nhood_size, row_batch_size, col_batch_size,
            mesh=mesh,
        )

    @staticmethod
    def _load(data, indices):
        if hasattr(data, "load_batch"):
            return data.load_batch(indices)
        if hasattr(data, "images"):
            return data.images[indices]
        return np.stack([np.asarray(data[i]) for i in indices])

    @property
    def manifold(self) -> Manifold:
        return Manifold(self.features, self.kth)

    def save(self, path: str):
        np.savez(path, features=self.features, kth=self.kth)


def calc_pr(manifold_1: Manifold, manifold_2: Manifold, row_batch_size=10000, col_batch_size=10000, mesh=None, **_ignored):
    """precision = frac of gen features within any real k-NN ball; recall
    symmetric (reference calc_pr, precision_recall.py:177-206).

    Args follow the reference convention: manifold_1 = generated,
    manifold_2 = real. Returns (precision, recall).
    """

    def membership(probe: Manifold, ref: Manifold):
        hits = np.zeros((len(probe.features),), bool)
        pf = probe.features.astype(np.float32)
        rf = ref.features.astype(np.float32)
        for i in range(0, len(pf), row_batch_size):
            ri = pf[i : i + row_batch_size]
            inside = np.zeros((len(ri),), bool)
            for j in range(0, len(rf), col_batch_size):
                d2 = _sq_dists_np(ri, rf[j : j + col_batch_size], mesh=mesh)
                inside |= (d2 <= (ref.kth[j : j + col_batch_size] ** 2)[None, :]).any(axis=1)
            hits[i : i + row_batch_size] = inside
        return hits.mean()

    precision = membership(manifold_1, manifold_2)
    recall = membership(manifold_2, manifold_1)
    return float(precision), float(recall)
