"""L3 data layer — TPU-native input pipeline.

Re-designs reference ``v_diffusion/datasets.py`` without torch/torchvision:
raw-format parsers (MNIST idx, CIFAR-10 pickle batches, CelebA CSV + JPEG) feed
numpy arrays in **NHWC**, transforms run host-side in numpy/PIL with matching
semantics (MNIST resize→32, CIFAR random h-flip, CelebA crop(40,15,148,148)→
resize 64→flip; all normalized to [-1, 1]), and sharding is per-host: each JAX
process loads only its slice of every epoch-shuffled permutation (the analogue
of ``DistributedSampler``, datasets.py:233-234, with ``set_epoch`` semantics).

A ``synthetic`` dataset (deterministic, seeded) backs tests and smoke runs on
machines without the real datasets (this environment has no network egress).
"""

from __future__ import annotations

import csv
import gzip
import os
import pickle
import struct
import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Optional

from . import native

import numpy as np

# ---------------------------------------------------------------------------
# raw parsers
# ---------------------------------------------------------------------------


def _open_maybe_gz(path):
    if os.path.exists(path):
        return open(path, "rb")
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    raise FileNotFoundError(path)


def load_mnist(root: str, train: bool = True):
    """Parse MNIST idx files from ``root/MNIST/raw`` (torchvision layout)."""
    prefix = "train" if train else "t10k"
    base = None
    for cand in (os.path.join(root, "MNIST", "raw"), os.path.join(root, "mnist"), root):
        if os.path.exists(os.path.join(cand, f"{prefix}-images-idx3-ubyte")) or os.path.exists(
            os.path.join(cand, f"{prefix}-images-idx3-ubyte.gz")
        ):
            base = cand
            break
    if base is None:
        raise FileNotFoundError(f"MNIST not found under {root}")
    with _open_maybe_gz(os.path.join(base, f"{prefix}-images-idx3-ubyte")) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051
        images = np.frombuffer(f.read(), np.uint8).reshape(n, rows, cols, 1)
    with _open_maybe_gz(os.path.join(base, f"{prefix}-labels-idx1-ubyte")) as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049
        labels = np.frombuffer(f.read(), np.uint8).astype(np.int64)
    return images, labels


def load_cifar10(root: str, train: bool = True):
    """Parse CIFAR-10 python pickle batches from ``root/cifar-10-batches-py``."""
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.exists(base):
        raise FileNotFoundError(f"CIFAR-10 not found under {root}")
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for fname in files:
        with open(os.path.join(base, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
    return np.ascontiguousarray(x), np.asarray(ys, np.int64)


def load_celeba_index(root: str, split: str = "all"):
    """Parse CelebA CSVs (reference datasets.py:57-72): returns (filenames,
    attrs in {0,1} float32 (N, 40), attr_names)."""
    base = os.path.join(root, "celeba")
    with open(os.path.join(base, "list_eval_partition.txt")) as f:
        rows = [r for r in csv.reader(f, delimiter=" ", skipinitialspace=True) if r]
    with open(os.path.join(base, "list_attr_celeba.txt")) as f:
        attr_rows = [r for r in csv.reader(f, delimiter=" ", skipinitialspace=True) if r]
    attr_names, attr_rows = attr_rows[1], attr_rows[2:]
    filenames = [r[0] for r in rows]
    partition = np.asarray([int(r[1]) for r in rows])
    attr = np.asarray([[int(v) for v in r[1:]] for r in attr_rows], np.float32)
    attr = 0.5 * (attr + 1.0)  # {-1,1} -> {0,1}
    split_map = {"train": 0, "valid": 1, "test": 2, "all": None}
    part = split_map[split.lower()]
    if part is not None:
        mask = partition == part
        filenames = [f for f, m in zip(filenames, mask) if m]
        attr = attr[mask]
    return filenames, attr, attr_names


def _celeba_decode_image(root: str, filename: str) -> np.ndarray:
    """Decode one aligned CelebA JPEG to its raw (218, 178, 3) uint8 array."""
    from PIL import Image

    with Image.open(os.path.join(root, "celeba", "img_align_celeba", filename)) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _celeba_load_image(root: str, filename: str) -> np.ndarray:
    """crop(top=40, left=15, 148x148) → resize 64 bilinear (datasets.py:13-14,133-136).

    Per-image path (kept as the parity reference for the batched native
    kernel); the DataLoader path goes through CelebADataset.load_batch."""
    raw = _celeba_decode_image(root, filename)[None]
    return native.crop_resize_bilinear(raw, 40, 15, 148, 148, 64, 64)[0]


def _resize_batch_bilinear(x: np.ndarray, size: int) -> np.ndarray:
    """Resize (N, H, W, C) uint8, PIL-BILINEAR semantics (torchvision Resize
    parity) via the native antialiased resampler."""
    return native.resize_bilinear(np.ascontiguousarray(x), size, size)


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


@dataclass
class ArrayDataset:
    """In-memory uint8 NHWC images + integer/multi-hot labels."""

    images: np.ndarray  # (N, H, W, C) uint8
    targets: np.ndarray  # (N,) int64 or (N, K) float32
    random_flip: bool = False

    def __len__(self):
        return len(self.images)


class CelebADataset:
    """Lazy-decoding CelebA with reference transform semantics.

    JPEG decode fans out over ``num_workers`` threads (PIL releases the GIL in
    its decoder — the reference's subprocess ``num_workers``, datasets.py:198,
    maps to a thread pool here since the transform math is native C++); the
    crop+resize runs as ONE fused native call over the stacked batch.
    """

    def __init__(self, root: str, split: str = "all", num_workers: int = 0):
        self.root = root
        self.filenames, self.attr, self.attr_names = load_celeba_index(root, split)
        self.random_flip = True
        self.num_workers = num_workers
        self._pool = None

    @property
    def targets(self):
        return self.attr

    def __len__(self):
        return len(self.filenames)

    def _decode(self, indices: np.ndarray) -> np.ndarray:
        names = [self.filenames[i] for i in indices]
        if self.num_workers > 1 and len(names) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            raws = list(self._pool.map(lambda f: _celeba_decode_image(self.root, f), names))
        else:
            raws = [_celeba_decode_image(self.root, f) for f in names]
        return np.stack(raws)

    def load_batch(self, indices: np.ndarray) -> np.ndarray:
        raw = self._decode(indices)  # (B, 218, 178, 3)
        return native.crop_resize_bilinear(raw, 40, 15, 148, 148, 64, 64)


class ImageFolder:
    """Flat directory of generated images (the eval CLI's input), lazily
    decoded batch-wise like the other datasets."""

    EXTS = {"jpg", "jpeg", "png", "bmp", "webp", "tiff"}

    def __init__(self, img_dir: str):
        self.img_dir = img_dir
        self.img_list = [
            f for f in os.listdir(img_dir) if f.split(".")[-1].lower() in self.EXTS
        ]

    def __len__(self):
        return len(self.img_list)

    def load_batch(self, indices: np.ndarray) -> np.ndarray:
        from PIL import Image

        out = []
        for i in indices:
            with Image.open(os.path.join(self.img_dir, self.img_list[i])) as im:
                out.append(np.asarray(im.convert("RGB"), np.uint8))
        return np.stack(out)


DEFAULT_ROOT = os.path.expanduser("~/datasets")

#: dataset registry (reference datasets.py:96-151); transforms are realized in
#: ``_build_dataset`` / ``DataLoader`` rather than as torchvision objects.
DATA_INFO = {
    "mnist": {
        "num_classes": 10,
        "resolution": (32, 32),
        "channels": 1,
        "train_size": 60000,
        "test_size": 10000,
        "target_shift": 1,  # reserve 0 for the CFG null class
    },
    "cifar10": {
        "num_classes": 10,
        "resolution": (32, 32),
        "channels": 3,
        "train_size": 50000,
        "test_size": 10000,
        "random_flip": True,
        "target_shift": 1,
    },
    "celeba": {
        "num_classes": 40,
        "multitags": True,
        "resolution": (64, 64),
        "channels": 3,
        "train": 162770,
        "test": 19962,
        "validation": 19867,
        "random_flip": True,
    },
    "synthetic": {  # deterministic stand-in for tests / offline smoke runs
        "num_classes": 10,
        "resolution": (32, 32),
        "channels": 3,
        "train_size": 512,
        "test_size": 128,
        "target_shift": 1,
    },
}


def _build_dataset(dataset: str, root: str, split: str, num_workers: int = 0):
    train = split in {"train", "all"}
    if dataset == "mnist":
        images, labels = load_mnist(root, train=train)
        images = _resize_batch_bilinear(images, 32)
        return ArrayDataset(images, labels + 1, random_flip=False)
    if dataset == "cifar10":
        images, labels = load_cifar10(root, train=train)
        return ArrayDataset(images, labels + 1, random_flip=True)
    if dataset == "celeba":
        return CelebADataset(root, split=split, num_workers=num_workers)
    if dataset == "synthetic":
        n = DATA_INFO["synthetic"]["train_size" if train else "test_size"]
        rng = np.random.RandomState(0 if train else 1)
        images = rng.randint(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
        labels = rng.randint(0, 10, size=(n,)).astype(np.int64) + 1
        return ArrayDataset(images, labels, random_flip=False)
    raise NotImplementedError(dataset)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


class DataLoader:
    """Epoch-based host loader with per-process sharding.

    Yields (x, y): x float32 NHWC in [-1, 1], y int64 (B,) or float32 (B, K).
    ``set_epoch``/seeded shuffling mirror DistributedSampler semantics
    (datasets.py:233-234, train_utils.py:242-243). ``drop_last`` keeps shapes
    static for jit.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: Optional[int] = 1234,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed if seed is not None else 0
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState((self.seed + self.epoch) % (2**31))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # contiguous per-process shard of the permutation
        shard = n // self.process_count
        return order[self.process_index * shard : (self.process_index + 1) * shard]

    def _materialize(self, idx: np.ndarray, flip_rng: np.ndarray):
        ds = self.dataset
        if isinstance(ds, CelebADataset):
            x = ds.load_batch(idx)
            y = ds.attr[idx]
        else:
            x = ds.images[idx]
            y = ds.targets[idx]
        flips = flip_rng if getattr(ds, "random_flip", False) else None
        x = native.normalize_flip(np.ascontiguousarray(x), flips)
        return x, y

    def __iter__(self):
        indices = self._epoch_indices()
        B = self.batch_size
        nb = len(indices) // B if self.drop_last else -(-len(indices) // B)
        flip_seed = (self.seed * 9176 + self.epoch + 7 * self.process_index) % (2**31)
        flip_rng = np.random.RandomState(flip_seed)

        def producer(q):
            # any failure (corrupt JPEG, IO error, ...) must reach the consumer:
            # a silently-dead producer leaves the consumer blocked on q.get()
            # forever, so the exception itself travels through the queue
            try:
                for b in range(nb):
                    idx = indices[b * B : (b + 1) * B]
                    flips = flip_rng.rand(len(idx)) < 0.5
                    q.put(self._materialize(idx, flips))
            except BaseException as exc:  # noqa: BLE001 — re-raised consumer-side
                q.put(exc)
                return
            q.put(None)

        q = queue_mod.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=producer, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def train_val_split(dataset: str, val_size: float, random_seed: Optional[int] = None):
    """Shuffled index split (reference datasets.py:154-162)."""
    train_size = DATA_INFO[dataset]["train_size"]
    if random_seed is not None:
        np.random.seed(random_seed)
    inds = np.arange(train_size)
    np.random.shuffle(inds)
    n_val = int(train_size * val_size)
    return inds[n_val:], inds[:n_val]


def SubsetDataset(base: ArrayDataset, indices) -> ArrayDataset:
    """Materialized index-subset of an ArrayDataset (reference Subset +
    SubsetSequentialSampler, datasets.py:165-173,219)."""
    indices = np.asarray(indices)
    return ArrayDataset(
        images=base.images[indices],
        targets=np.asarray(base.targets)[indices],
        random_flip=getattr(base, "random_flip", False),
    )


def get_dataloader(
    dataset: str,
    batch_size: int,
    split: str,
    val_size: float = 0.0,
    random_seed: Optional[int] = None,
    root: str = DEFAULT_ROOT,
    drop_last: bool = True,
    distributed: bool = False,
    is_leader: bool = True,
    num_workers: int = 0,
    **_ignored,
):
    """Factory mirroring reference get_dataloader (datasets.py:176-237).

    ``batch_size`` is the global batch; under multi-process JAX it is divided
    by ``process_count`` (datasets.py:198). Returns (loader, loader) — the
    loader doubles as its own sampler (``set_epoch``).
    """
    import jax

    process_index = jax.process_index() if distributed else 0
    process_count = jax.process_count() if distributed else 1
    if distributed:
        batch_size = batch_size // process_count

    assert isinstance(val_size, float) and 0 <= val_size < 1

    def build():
        if dataset != "celeba" and split in {"train", "valid"} and val_size > 0:
            base = _build_dataset(dataset, root, "train")
            train_inds, val_inds = train_val_split(dataset, val_size, random_seed)
            return SubsetDataset(base, {"train": train_inds, "valid": val_inds}[split])
        if val_size == 0 and split == "valid":
            raise ValueError("valid split requires val_size > 0")
        return _build_dataset(dataset, root, split, num_workers=num_workers)

    # leader-prepares-first gate (reference datasets.py:222-231): with no
    # network egress, "prepare" here can only mean another process already
    # materialized files. EVERY process must join the named barrier — a
    # conditional barrier deadlocks when filesystem state differs across
    # hosts — so: build-or-record, sync unconditionally, then retry failures.
    if distributed:
        from .parallel import sync_global_devices

        try:
            ds = build()
        except FileNotFoundError:
            ds = None
        sync_global_devices("dataset_download")
        if ds is None:
            ds = build()
    else:
        ds = build()
    loader = DataLoader(
        ds,
        batch_size=batch_size,
        shuffle=split in {"train", "all"},
        seed=random_seed,
        drop_last=drop_last,
        process_index=process_index,
        process_count=process_count,
    )
    return loader, loader
