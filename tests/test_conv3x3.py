"""Fused GN→SiLU→conv3x3 Pallas kernel: parity vs the XLA composition, and
UNet-level equivalence when the fused dispatch is forced on (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdiff_tpu.ops import conv3x3
from vdiff_tpu.ops.conv3x3 import fused_gn_silu_conv3x3
from vdiff_tpu.ops.groupnorm import gn_film_silu_reference


def _xla_chain(x, k, b, gamma=None, beta=None, fshift=None, fscale=None,
               skip=None, num_groups=4):
    h = x
    if gamma is not None:
        h = gn_film_silu_reference(
            x, gamma, beta, fshift, fscale, num_groups=num_groups, eps=1e-6,
            apply_silu=True,
        )
    out = jax.lax.conv_general_dilated(
        h, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out = out + b
    if skip is not None:
        out = out + skip
    return out


@pytest.mark.parametrize(
    "B,H,W,C,CO,film,has_skip,gn",
    [
        (2, 4, 4, 8, 16, False, False, True),   # P>1 multi-image block
        (2, 4, 4, 8, 16, True, True, True),     # film + skip
        (4, 4, 6, 8, 8, True, False, True),     # non-square spatial
        (2, 8, 8, 8, 8, False, True, False),    # bare conv (no GN prologue)
        (1, 8, 8, 16, 8, True, True, True),     # single image per block
    ],
)
def test_kernel_matches_xla(B, H, W, C, CO, film, has_skip, gn):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, CO) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(CO) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32) if gn else None
    beta = jnp.asarray(rng.randn(C) * 0.1, jnp.float32) if gn else None
    fs = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
    fsc = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
    skip = jnp.asarray(rng.randn(B, H, W, CO), jnp.float32) if has_skip else None

    got = fused_gn_silu_conv3x3(
        x, k, b, gamma, beta, fs, fsc, skip, num_groups=4, eps=1e-6, interpret=True
    )
    want = _xla_chain(x, k, b, gamma, beta, fs, fsc, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-5)


def test_unet_fused_path_matches_unfused(monkeypatch):
    """Force the fused-conv dispatch on (interpret mode) and check the full
    UNet forward is unchanged — covers both ResBlock fusion sites (conv1 on
    non-resampling blocks, conv2+FiLM+skip everywhere) and the up-path concat
    inputs (C_in = 2x C_out)."""
    from vdiff_tpu.models import unet as unet_mod
    from vdiff_tpu.models.unet import UNet

    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), drop_rate=0.0, num_heads=1,
        num_classes=0, use_flash=False,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x, t, None)["params"]
    base = model.apply({"params": params}, x, t, None, train=False)

    monkeypatch.setattr(unet_mod, "fusable", lambda x_, co: True)
    monkeypatch.setattr(
        unet_mod, "fused_gn_silu_conv3x3",
        functools.partial(fused_gn_silu_conv3x3, interpret=True),
    )
    fused = model.apply({"params": params}, x, t, None, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=5e-5, rtol=1e-5)
