"""ctypes binding for the native data-ops library (dataops.cpp).

Builds ``libdataops.so`` with g++ on first import (cached next to the source);
falls back to numpy implementations when no compiler is available, so the
framework stays importable everywhere. Public API:

    normalize_flip(images_u8, flips_bool) -> float32 in [-1, 1]
    resize_bilinear(images_u8, oh, ow) -> uint8
    crop_resize_bilinear(images_u8, top, left, ch, cw, oh, ow) -> uint8
    available() -> bool (native library loaded)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataops.cpp")
_SO = os.path.join(_DIR, "libdataops.so")

_lib = None


def _build() -> bool:
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.normalize_flip_u8_f32.argtypes = [u8p, f32p, u8p, i64, i64, i64, i64]
    lib.resize_bilinear_u8.argtypes = [u8p, u8p, i64, i64, i64, i64, i64, i64]
    lib.crop_resize_bilinear_u8.argtypes = [u8p, u8p] + [i64] * 10
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def normalize_flip(images: np.ndarray, flips: np.ndarray | None = None) -> np.ndarray:
    """(N,H,W,C) uint8 → float32 in [-1,1]; flips: (N,) bool mirrors W."""
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    images = np.ascontiguousarray(images)
    if flips is None:
        flips = np.zeros((n,), np.uint8)
    else:
        flips = np.ascontiguousarray(flips.astype(np.uint8))
    lib = _load()
    if lib is None:
        x = np.where(flips[:, None, None, None] != 0, images[:, :, ::-1, :], images)
        return x.astype(np.float32) / 127.5 - 1.0
    out = np.empty((n, h, w, c), np.float32)
    lib.normalize_flip_u8_f32(images, out, flips, n, h, w, c)
    return out


def resize_bilinear(images: np.ndarray, oh: int, ow: int) -> np.ndarray:
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    lib = _load()
    if lib is None:
        from PIL import Image

        out = np.empty((n, oh, ow, c), np.uint8)
        for i in range(n):
            img = images[i, ..., 0] if c == 1 else images[i]
            arr = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
            out[i] = arr[..., None] if c == 1 else arr
        return out
    images = np.ascontiguousarray(images)
    out = np.empty((n, oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(images, out, n, h, w, c, oh, ow)
    return out


def crop_resize_bilinear(
    images: np.ndarray, top: int, left: int, ch: int, cw: int, oh: int, ow: int
) -> np.ndarray:
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    lib = _load()
    if lib is None:
        return resize_bilinear(
            np.ascontiguousarray(images[:, top : top + ch, left : left + cw]), oh, ow
        )
    images = np.ascontiguousarray(images)
    out = np.empty((n, oh, ow, c), np.uint8)
    lib.crop_resize_bilinear_u8(images, out, n, h, w, c, top, left, ch, cw, oh, ow)
    return out
