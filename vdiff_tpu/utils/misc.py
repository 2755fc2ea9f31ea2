"""Misc utilities: seeding, sample-grid image saving, running statistics.

Replaces reference utils.py:28-39 (save_image via torchvision make_grid +
matplotlib) and train_utils.py:30-59 (RunningStatistics) without any torch
dependency: the grid is assembled in numpy, saved with PIL.
"""

from __future__ import annotations

import math
import random

import numpy as np


def seed_all(seed: int) -> None:
    """Seed python + numpy global RNGs (reference utils.py:34-39). JAX RNG is
    explicit-key based and derived separately from the same seed."""
    random.seed(seed)
    np.random.seed(seed)


def make_grid(x: np.ndarray, nrow: int = 8, padding: int = 2, value_range=(-1.0, 1.0)):
    """Assemble an (N, H, W, C) batch into one grid image in [0, 1]."""
    n, h, w, c = x.shape
    lo, hi = value_range
    x = np.clip((x.astype(np.float32) - lo) / (hi - lo), 0.0, 1.0)
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c), np.float32
    )
    for idx in range(n):
        r, cidx = divmod(idx, ncol)
        top = r * (h + padding) + padding
        left = cidx * (w + padding) + padding
        grid[top : top + h, left : left + w] = x[idx]
    return grid


def save_image(x, path: str, nrow: int = 8, value_range=(-1.0, 1.0)) -> None:
    """Save a sample batch (N, H, W, C) in value_range as a PNG grid
    (reference utils.py:28-31)."""
    from PIL import Image

    x = np.asarray(x)
    grid = make_grid(x, nrow=nrow, value_range=value_range)
    arr = (grid * 255.0 + 0.5).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def split_squeeze(data):
    """(N, 2) → (x, y) vectors (reference utils.py:117-120)."""
    x, y = np.split(np.asarray(data), 2, axis=1)
    return x.squeeze(1), y.squeeze(1)


def infer_range(dataset, precision: int = 2):
    """Infer x/y axis limits over batches of 2-D points (utils.py:87-97)."""
    p = precision
    xlim = np.array([-np.inf, np.inf])
    ylim = np.array([-np.inf, np.inf])
    clip = lambda lo, hi, lim: np.clip([math.floor(p * lo), math.ceil(p * hi)], *lim)
    for bch in dataset:
        bch = np.asarray(bch)
        xlim = clip(bch[:, 0].min(), bch[:, 0].max(), xlim)
        ylim = clip(bch[:, 1].min(), bch[:, 1].max(), ylim)
    return xlim / p, ylim / p


def save_scatterplot(fpath, x, y=None, xlim=None, ylim=None):
    """Toy-data scatterplot (reference utils.py:100-114)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    if x.ndim == 2:
        x, y = split_squeeze(x)
    elif y is None:
        x, y = np.arange(len(x)), x
    plt.figure(figsize=(6, 6))
    plt.scatter(x, y, s=0.5, alpha=0.7)
    if xlim is not None:
        plt.xlim(*xlim)
    if ylim is not None:
        plt.ylim(*ylim)
    plt.tight_layout()
    plt.savefig(fpath)
    plt.close()


class RunningStatistics:
    """Streaming per-epoch averages (reference train_utils.py:30-59)."""

    def __init__(self, **kwargs):
        self.count = 0
        self.stats = {k: (v or 0) for k, v in kwargs.items()}

    def reset(self):
        self.count = 0
        for k in self.stats:
            self.stats[k] = 0

    def update(self, n, **kwargs):
        self.count += n
        for k, v in kwargs.items():
            self.stats[k] = self.stats.get(k, 0) + v

    def extract(self):
        if self.count == 0:
            return {k: 0.0 for k in self.stats}
        return {k: v / self.count for k, v in self.stats.items()}

    def __repr__(self):
        out = f"Count(s): {self.count}\nStatistics:\n"
        for k, v in self.stats.items():
            out += f"\t{k} = {v}\n"
        return out
