"""Data-layer tests: loader determinism, sharding, transforms, registry."""

import numpy as np
import pytest

from vdiff_tpu.data import DATA_INFO, ArrayDataset, DataLoader, _build_dataset, get_dataloader


def _ds(n=64, flip=False):
    rng = np.random.RandomState(0)
    return ArrayDataset(
        images=rng.randint(0, 256, (n, 8, 8, 3), np.uint8),
        targets=rng.randint(1, 11, (n,)).astype(np.int64),
        random_flip=flip,
    )


def test_loader_shapes_and_range():
    loader = DataLoader(_ds(), batch_size=16, seed=1)
    x, y = next(iter(loader))
    assert x.shape == (16, 8, 8, 3) and x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert y.shape == (16,)


def test_loader_epoch_determinism():
    loader = DataLoader(_ds(), batch_size=16, seed=7)
    loader.set_epoch(3)
    a = [x.copy() for x, _ in loader]
    loader.set_epoch(3)
    b = [x.copy() for x, _ in loader]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    loader.set_epoch(4)
    c = [x.copy() for x, _ in loader]
    assert any(not np.array_equal(xa, xc) for xa, xc in zip(a, c))


def test_loader_process_sharding_partitions():
    ds = _ds(64)
    seen = []
    for pi in range(4):
        loader = DataLoader(
            ds, batch_size=4, seed=2, process_index=pi, process_count=4, shuffle=True
        )
        loader.set_epoch(0)
        for x, y in loader:
            seen.append(x)
    total = sum(len(b) for b in seen)
    assert total == 64  # full coverage, no overlap (perm is a partition)
    all_rows = np.concatenate(seen).reshape(64, -1)
    assert len(np.unique(all_rows.round(3), axis=0)) == 64


def test_loader_drop_last():
    loader = DataLoader(_ds(30), batch_size=8, seed=1, drop_last=True)
    batches = list(loader)
    assert len(batches) == 3
    assert all(x.shape[0] == 8 for x, _ in batches)


def test_random_flip_applied():
    ds = _ds(32, flip=True)
    loader = DataLoader(ds, batch_size=32, seed=1, shuffle=False)
    loader.set_epoch(0)
    x, _ = next(iter(loader))
    raw = ds.images.astype(np.float32) / 127.5 - 1.0
    flipped = raw[:, :, ::-1, :]
    per_item_match = [
        np.array_equal(x[i], raw[i]) or np.array_equal(x[i], flipped[i]) for i in range(32)
    ]
    assert all(per_item_match)
    n_flipped = sum(np.array_equal(x[i], flipped[i]) for i in range(32))
    assert 0 < n_flipped < 32  # some flipped, some not


def test_synthetic_dataset_registry():
    loader, sampler = get_dataloader("synthetic", batch_size=32, split="train", random_seed=0)
    assert sampler is loader
    x, y = next(iter(loader))
    assert x.shape == (32, 32, 32, 3)
    assert y.min() >= 1 and y.max() <= 10  # target_shift reserves 0 for null


def test_data_info_parity_keys():
    """Registry carries the reference DATA_INFO surface (datasets.py:96-151)."""
    for name in ("mnist", "cifar10", "celeba"):
        info = DATA_INFO[name]
        assert "num_classes" in info and "resolution" in info and "channels" in info
    assert DATA_INFO["celeba"]["multitags"] is True
    assert DATA_INFO["mnist"]["resolution"] == (32, 32)
    assert DATA_INFO["cifar10"]["train_size"] == 50000


def test_missing_dataset_raises():
    with pytest.raises(FileNotFoundError):
        _build_dataset("cifar10", "/nonexistent", "train")


def test_loader_propagates_producer_errors():
    """A failure in the prefetch thread (e.g. one corrupt JPEG) must surface in
    the consumer, not leave it blocked on the queue forever."""
    import threading

    class CorruptDataset:
        random_flip = False

        def __len__(self):
            return 32

        @property
        def images(self):
            raise OSError("corrupt image file")

        @property
        def targets(self):
            raise OSError("corrupt image file")

    loader = DataLoader(CorruptDataset(), batch_size=8, seed=0)
    result = {}

    def consume():
        try:
            next(iter(loader))
            result["exc"] = None
        except Exception as e:  # noqa: BLE001
            result["exc"] = e

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "loader hung instead of propagating the producer error"
    assert isinstance(result["exc"], OSError) and "corrupt" in str(result["exc"])
