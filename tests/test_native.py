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


@pytest.mark.parametrize(
    "shape,out",
    [
        ((2, 28, 28, 3), (32, 32)),    # mnist upscale
        ((2, 148, 148, 3), (64, 64)),  # celeba downscale (antialias matters)
        ((1, 512, 333, 3), (100, 77)),  # non-square, large ratio
        ((2, 28, 28, 1), (32, 32)),    # grayscale
    ],
)
def test_resize_bilinear_bitexact_vs_pil(shape, out):
    """The native resampler reimplements PIL's antialiased fixed-point
    BILINEAR — parity must be exact, incl. downscales where classic 4-tap
    bilinear diverges by tens of levels."""
    from PIL import Image

    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, shape, np.uint8)
    oh, ow = out
    got = native.resize_bilinear(x, oh, ow)
    for i in range(shape[0]):
        img = x[i, ..., 0] if shape[-1] == 1 else x[i]
        ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        if shape[-1] == 1:
            ref = ref[..., None]
        np.testing.assert_array_equal(got[i], ref)


def test_crop_resize_bitexact_vs_pil_crop_then_resize():
    from PIL import Image

    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (2, 218, 178, 3), np.uint8)
    fused = native.crop_resize_bilinear(x, 40, 15, 148, 148, 64, 64)
    for i in range(2):
        ref = Image.fromarray(x[i]).crop((15, 40, 163, 188)).resize((64, 64), Image.BILINEAR)
        np.testing.assert_array_equal(fused[i], np.asarray(ref))
