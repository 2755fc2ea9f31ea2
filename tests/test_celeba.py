"""CelebA pipeline tests against a synthetic on-disk fixture: CSV parsing
(reference datasets.py:57-72 semantics), crop+resize transform, multitag flow."""

import os

import numpy as np
import pytest
from PIL import Image

from vdiff_tpu.data import CelebADataset, DataLoader, load_celeba_index


@pytest.fixture
def celeba_root(tmp_path):
    base = tmp_path / "celeba"
    img_dir = base / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names, parts, attrs = [], [], []
    for i in range(6):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.randint(0, 256, (218, 178, 3), np.uint8)).save(img_dir / name)
        names.append(name)
        parts.append(i % 3)  # train/valid/test round-robin
        attrs.append(rng.choice([-1, 1], size=4))
    with open(base / "list_eval_partition.txt", "w") as f:
        for n, p in zip(names, parts):
            f.write(f"{n} {p}\n")
    with open(base / "list_attr_celeba.txt", "w") as f:
        f.write("6\n")
        f.write("Attr_A Attr_B Attr_C Attr_D\n")
        for n, a in zip(names, attrs):
            f.write(n + " " + " ".join(f"{v:d}" for v in a) + "\n")
    return str(tmp_path)


def test_celeba_index_splits(celeba_root):
    names, attr, attr_names = load_celeba_index(celeba_root, "all")
    assert len(names) == 6 and attr.shape == (6, 4)
    assert attr_names == ["Attr_A", "Attr_B", "Attr_C", "Attr_D"]
    assert set(np.unique(attr)) <= {0.0, 1.0}  # {-1,1} -> {0,1}

    train_names, train_attr, _ = load_celeba_index(celeba_root, "train")
    assert len(train_names) == 2  # partition 0


def test_celeba_dataset_loads_crop_resized(celeba_root):
    ds = CelebADataset(celeba_root, split="all")
    batch = ds.load_batch(np.array([0, 3]))
    assert batch.shape == (2, 64, 64, 3) and batch.dtype == np.uint8
    assert ds.targets.shape == (6, 4)


def test_celeba_dataloader_multitags(celeba_root):
    ds = CelebADataset(celeba_root, split="all")
    loader = DataLoader(ds, batch_size=3, seed=0, drop_last=True)
    x, y = next(iter(loader))
    assert x.shape == (3, 64, 64, 3) and x.dtype == np.float32
    assert y.shape == (3, 4) and y.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_celeba_crop_matches_reference_box(celeba_root):
    """crop(top=40, left=15, 148, 148) then bilinear 64 (datasets.py:13-14)."""
    ds = CelebADataset(celeba_root, split="all")
    out = ds.load_batch(np.array([0]))[0]
    with Image.open(os.path.join(celeba_root, "celeba", "img_align_celeba", ds.filenames[0])) as im:
        ref = im.crop((15, 40, 163, 188)).resize((64, 64), Image.BILINEAR)
    np.testing.assert_array_equal(out, np.asarray(ref))
