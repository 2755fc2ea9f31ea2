"""Native data-ops library tests: C++ kernels vs numpy/PIL references."""

import numpy as np
import pytest

from vdiff_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of libdataops.so failed"


def test_normalize_flip_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (5, 7, 9, 3), np.uint8)
    flips = np.array([1, 0, 1, 0, 1], bool)
    out = native.normalize_flip(x, flips)
    ref = np.where(flips[:, None, None, None], x[:, :, ::-1, :], x).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)


def test_normalize_no_flip():
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (3, 4, 4, 1), np.uint8)
    out = native.normalize_flip(x)
    np.testing.assert_allclose(out, x.astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_resize_bilinear_close_to_pil():
    from PIL import Image

    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (2, 28, 28, 3), np.uint8)
    out = native.resize_bilinear(x, 32, 32)
    for i in range(2):
        ref = np.asarray(Image.fromarray(x[i]).resize((32, 32), Image.BILINEAR))
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        # implementations differ in rounding; values must be within 2 levels
        assert diff.max() <= 2, diff.max()


def test_crop_resize_matches_crop_then_resize():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (2, 218, 178, 3), np.uint8)
    fused = native.crop_resize_bilinear(x, 40, 15, 148, 148, 64, 64)
    cropped = np.ascontiguousarray(x[:, 40:188, 15:163])
    staged = native.resize_bilinear(cropped, 64, 64)
    np.testing.assert_array_equal(fused, staged)
