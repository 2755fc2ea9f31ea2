"""Fused GroupNorm(+FiLM)(+SiLU) — Pallas TPU kernel + XLA reference path.

The ResBlock hot path (reference unet.py:137-148) is GN → SiLU → conv and
GN → FiLM → SiLU → conv. The convs ride the MXU; the normalization chain is
HBM-bandwidth-bound. This kernel computes group statistics, the affine, the
FiLM modulation and the SiLU in one VMEM round trip per sample, folding
everything into a single per-channel scale/offset applied to x:

    y = silu( x * A + B ),  A = γ·rsqrt(var+eps)·(1+film_scale)
                            B = (β − mean·γ·rsqrt(var+eps))·(1+film_scale) + film_shift

Used on the inference/sampling path (no dropout, no autodiff); training uses
the XLA path, which the compiler fuses well enough for the backward story.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_film_silu_reference(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    film_shift: Optional[jax.Array] = None,
    film_scale: Optional[jax.Array] = None,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    apply_silu: bool = True,
) -> jax.Array:
    """XLA path. x: (B, H, W, C); gamma/beta: (C,); film_*: (B, C) or None."""
    B, H, W, C = x.shape
    cg = C // num_groups
    # Single-pass statistics (sum and sum-of-squares fused into one read of x,
    # f32 accumulation) + the whole normalize/affine/FiLM folded into ONE
    # per-channel fused multiply-add y = x·A + B in the compute dtype. This
    # minimizes HBM traffic: profiling showed the naive two-pass f32 GN
    # (convert_reduce fusions) eating ~45% of the UNet's step time on v5e.
    # reduce over spatial dims per channel first (lane-parallel on the VPU —
    # cross-lane group subfolds are slow), then fold channels→groups on the
    # tiny (B, C) partials
    x32 = x.astype(jnp.float32)
    s1c = jnp.sum(x32, axis=(1, 2))  # (B, C)
    s2c = jnp.sum(x32 * x32, axis=(1, 2))
    s1 = jnp.sum(s1c.reshape(B, num_groups, cg), axis=2)  # (B, G)
    s2 = jnp.sum(s2c.reshape(B, num_groups, cg), axis=2)
    n = H * W * cg
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (B, G)

    # expand per-group stats to per-channel coefficients (tiny tensors)
    mean_c = jnp.repeat(mean, cg, axis=1)  # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    a = gamma[None, :] * inv_c
    b = beta[None, :] - mean_c * a
    if film_scale is not None:
        fs = 1.0 + film_scale.astype(jnp.float32)
        a = a * fs
        b = b * fs
    if film_shift is not None:
        b = b + film_shift.astype(jnp.float32)

    a = a.astype(x.dtype)[:, None, None, :]
    b = b.astype(x.dtype)[:, None, None, :]
    y = x * a + b
    if apply_silu:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, shift_ref, scale_ref, o_ref, *,
               num_groups: int, eps: float, apply_silu: bool, has_film: bool):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    HW, C = x.shape
    cg = C // num_groups

    # Group statistics via a one-hot channel→group matrix on the MXU: Mosaic
    # cannot shape-cast along lanes ((C,) → (G, cg)), so the fold and the
    # broadcast back are both tiny (1,C)x(C,G) matmuls — everything stays 2-D.
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    M = (chan // cg == grp).astype(jnp.float32)  # (C, G)

    csum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    csq = jnp.sum(x * x, axis=0, keepdims=True)
    n = float(HW * cg)
    hi = jax.lax.Precision.HIGHEST
    mean_g = jnp.dot(csum, M, preferred_element_type=jnp.float32, precision=hi) / n  # (1, G)
    var_g = jnp.dot(csq, M, preferred_element_type=jnp.float32, precision=hi) / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group values back to channels: (1, G) x (G, C)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32, precision=hi)  # (1, C)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32, precision=hi)

    gamma = gamma_ref[pl.ds(b, 1), :]  # (1, C)
    beta = beta_ref[pl.ds(b, 1), :]
    a = gamma * inv_c
    off = beta - mean_c * a
    if has_film:
        fs = 1.0 + scale_ref[pl.ds(b, 1), :].astype(jnp.float32)
        a = a * fs
        off = off * fs + shift_ref[pl.ds(b, 1), :].astype(jnp.float32)

    y = x * a + off
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def gn_film_silu_pallas(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    film_shift: Optional[jax.Array] = None,
    film_scale: Optional[jax.Array] = None,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    apply_silu: bool = True,
) -> jax.Array:
    B, H, W, C = x.shape
    HW = H * W
    has_film = film_shift is not None
    x2 = x.reshape(B, HW, C)
    gamma2 = jnp.broadcast_to(gamma.astype(jnp.float32)[None, :], (B, C))
    beta2 = jnp.broadcast_to(beta.astype(jnp.float32)[None, :], (B, C))
    # side inputs are kept f32: dynamic sublane row-slices of bf16 (tile 16)
    # arrays fail Mosaic's alignment proof, and these are tiny
    if has_film:
        shift2 = film_shift.astype(jnp.float32)
        scale2 = film_scale.astype(jnp.float32)
    else:
        shift2 = jnp.zeros((B, C), jnp.float32)
        scale2 = jnp.zeros((B, C), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, num_groups=num_groups, eps=eps,
            apply_silu=apply_silu, has_film=has_film,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # (B, C) vectors ride along whole (tiny); kernel slices row b
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
    )(x2, gamma2, beta2, shift2, scale2)
    return out.reshape(B, H, W, C)


def gn_film_silu(
    x, gamma, beta, film_shift=None, film_scale=None, *,
    num_groups: int = 32, eps: float = 1e-6, apply_silu: bool = True,
    use_pallas: Optional[bool] = None,
):
    """Dispatch between the Pallas kernel and the XLA composition.

    Measured on v5e (bench.py, hid=256 UNet, 256-step DDIM): the per-sample
    Pallas grid LOSES to XLA's own fusion of this chain (10.8 vs 15.3
    samples/s/chip) — XLA already fuses GN+FiLM+SiLU into neighboring ops and
    pipelines across the batch. The kernel therefore stays opt-in
    (``use_pallas=True``) pending a batched-grid rewrite; ``None``/default
    routes to XLA everywhere.
    """
    B, H, W, C = x.shape
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        assert (
            jax.default_backend() == "tpu"
            and C % 128 == 0
            and (H * W) % 8 == 0
        ), "pallas GN requires TPU and tile-aligned shapes"
    fn = gn_film_silu_pallas if use_pallas else gn_film_silu_reference
    return fn(
        x, gamma, beta, film_shift, film_scale,
        num_groups=num_groups, eps=eps, apply_silu=apply_silu,
    )
