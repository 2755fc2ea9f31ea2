"""Fused GroupNorm(+FiLM) → SiLU → 3x3 conv (+bias, +skip-add) Pallas kernel.

The ResBlock inference hot path (reference unet.py:137-148) is two chains of
``GN[(+FiLM)] → SiLU → conv3x3`` plus a residual add. XLA runs the conv on the
MXU but materializes the normalized activation in HBM between the chains; at
the flagship shapes (B=128, 32x32x256 ≈ 64 MB bf16 per activation) those round
trips and the conv lowering overhead cap MXU utilization at ~71% (profiled,
README). This kernel keeps one block of images resident in VMEM and computes
the whole chain in one pass:

  * per-image GroupNorm statistics via one-hot fold matmuls (all 2-D, MXU),
  * the FiLM/affine folded into ONE per-row FMA ``y = silu(x·A + B)``,
  * the 3x3 SAME conv as 9 shifted matmuls: ``out += roll(y, -s)·mask @ W_k``
    accumulated in f32 — the roll/mask (VPU) pipelines against the previous
    shift's matmul (MXU),
  * bias and the residual-skip add fused into the epilogue.

Inference-only (no VJP); training takes the XLA composition in
``ops/groupnorm.py``. Applicability is gated on TPU + lane/sublane-aligned
shapes; callers fall back to the unfused path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# offsets of the 9 taps of a SAME 3x3 conv, HWIO kernel order (dy major)
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _images_per_block(H: int, W: int, c_in: int, c_out: int) -> int:
    """Pick images per grid program: enough rows to feed the MXU (M >= 1024
    when possible) while keeping the working set well under VMEM."""
    target_rows = 1024
    P = max(1, target_rows // (H * W))
    # working set ≈ x + y + a/b rows + acc + out (bytes, f32-dominated)
    while P > 1 and P * H * W * (c_in * 14 + c_out * 6) > 8 * 1024 * 1024:
        P //= 2
    return P


def _tap_mask(M: int, HW: int, H: int, W: int, dy: int, dx: int):
    """(M, 1) bool: rows whose shifted source (h+dy, w+dx) stays inside the
    image. Rolled rows that cross an image boundary are exactly the rows this
    mask zeroes, so a flat roll over a multi-image block is exact."""
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    h = (r % HW) // W
    w = r % W
    return (h + dy >= 0) & (h + dy < H) & (w + dx >= 0) & (w + dx < W)


def _gn_silu_conv_kernel(
    x_ref, gamma_ref, beta_ref, shift_ref, scale_ref, w_ref, b_ref, skip_ref, o_ref,
    *, H: int, W: int, P: int, num_groups: int, eps: float,
    has_film: bool, has_skip: bool, apply_gn: bool,
):
    HW = H * W
    M = P * HW
    x = x_ref[0]  # (M, C_in)
    C = x.shape[-1]
    c_out = o_ref.shape[-1]
    cdt = x.dtype
    hi = jax.lax.Precision.HIGHEST

    if apply_gn:
        x32 = x.astype(jnp.float32)
        if P == 1:
            # single image per block: plain spatial reductions, coefficients
            # broadcast as (1, C) rows — no M-row expansion temporaries
            csum = jnp.sum(x32, axis=0, keepdims=True)  # (1, C)
            csq = jnp.sum(x32 * x32, axis=0, keepdims=True)
        else:
            # per-image fold: R (M, P) one-hot image membership — reductions as
            # 2-D matmuls (Mosaic cannot shape-cast lanes; cf. ops/groupnorm.py)
            img = jax.lax.broadcasted_iota(jnp.int32, (M, P), 0) // HW
            pid = jax.lax.broadcasted_iota(jnp.int32, (M, P), 1)
            R = (img == pid).astype(jnp.float32)
            csum = jnp.dot(R.T, x32, preferred_element_type=jnp.float32, precision=hi)  # (P, C)
            csq = jnp.dot(R.T, x32 * x32, preferred_element_type=jnp.float32, precision=hi)

        cg = C // num_groups
        chan = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
        Mcg = (chan // cg == grp).astype(jnp.float32)  # (C, G)
        n = float(HW * cg)
        mean_pg = jnp.dot(csum, Mcg, preferred_element_type=jnp.float32, precision=hi) / n
        var_pg = jnp.dot(csq, Mcg, preferred_element_type=jnp.float32, precision=hi) / n - mean_pg * mean_pg
        inv_pg = jax.lax.rsqrt(var_pg + eps)
        mean_pc = jnp.dot(mean_pg, Mcg.T, preferred_element_type=jnp.float32, precision=hi)  # (P, C)
        inv_pc = jnp.dot(inv_pg, Mcg.T, preferred_element_type=jnp.float32, precision=hi)

        gamma = gamma_ref[:]  # (1, C) f32
        beta = beta_ref[:]
        a_pc = gamma * inv_pc
        b_pc = beta - mean_pc * a_pc
        if has_film:
            fs = 1.0 + scale_ref[0]  # (P, C) f32
            a_pc = a_pc * fs
            b_pc = b_pc * fs + shift_ref[0]

        if P == 1:
            a_rows, b_rows = a_pc, b_pc  # (1, C) broadcasts against (M, C)
        else:
            # expand (P, C) coefficients to rows with one (M,P)x(P,C) matmul each
            a_rows = jnp.dot(R, a_pc, preferred_element_type=jnp.float32, precision=hi)
            b_rows = jnp.dot(R, b_pc, preferred_element_type=jnp.float32, precision=hi)
        y = x32 * a_rows + b_rows
        y = (y * jax.nn.sigmoid(y)).astype(cdt)  # SiLU, conv input dtype
    else:
        y = x

    def tap(dy, dx):
        # static shift-with-zero-fill: ys[r] = y[r+s] (Mosaic has no bf16
        # rotate, so the roll is expressed as slice+concat at static offsets)
        s = dy * W + dx
        if s > 0:
            ys = jnp.concatenate([y[s:], jnp.zeros((s, C), y.dtype)], axis=0)
        elif s < 0:
            ys = jnp.concatenate([jnp.zeros((-s, C), y.dtype), y[:s]], axis=0)
        else:
            ys = y
        mask = _tap_mask(M, HW, H, W, dy, dx)
        return jnp.where(mask, ys, jnp.zeros_like(ys))

    # Lane-concatenate shifted taps into an im2col block so the conv runs as
    # few LARGE matmuls (K = group·C) instead of 9 small K=C ones — the small
    # sequential accumulation chain measurably underfeeds the MXU (~0.92x vs
    # XLA); the single-K=9C form exceeds it. Group size 9 when the (M, 9C)
    # block fits VMEM alongside the rest, else 3 (one group per dy row).
    group = 9 if C <= 256 else 3
    acc = jnp.zeros((M, c_out), jnp.float32)
    for g in range(0, 9, group):
        ys_g = jnp.concatenate(
            [tap(*_TAPS[k]) for k in range(g, g + group)], axis=1
        )
        wg = w_ref[g * C:(g + group) * C, :]
        acc = acc + jnp.dot(ys_g, wg, preferred_element_type=jnp.float32)

    out = acc + b_ref[:]
    if has_skip:
        out = out + skip_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_gn_silu_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    gamma: Optional[jax.Array] = None,
    beta: Optional[jax.Array] = None,
    film_shift: Optional[jax.Array] = None,
    film_scale: Optional[jax.Array] = None,
    skip: Optional[jax.Array] = None,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """y = conv3x3(silu(GN_film(x))) + bias (+ skip).

    x: (B, H, W, C_in) NHWC; kernel: (3, 3, C_in, C_out) HWIO (flax.linen.Conv
    layout); gamma/beta: (C_in,); film_*: (B, C_in) or None; skip: (B, H, W,
    C_out) or None. When gamma is None the GN+SiLU prologue is skipped (bare
    conv3x3). Returns (B, H, W, C_out) in x.dtype.
    """
    B, H, W, C = x.shape
    c_out = kernel.shape[-1]
    has_film = film_shift is not None
    has_skip = skip is not None
    apply_gn = gamma is not None

    P = _images_per_block(H, W, C, c_out)
    while B % P:
        P //= 2
    M = P * H * W
    G = B // P

    x2 = x.reshape(G, M, C)
    w2 = kernel.reshape(9 * C, c_out).astype(x.dtype)
    b2 = bias.astype(jnp.float32).reshape(1, c_out)
    gamma2 = (gamma if apply_gn else jnp.ones((C,))).astype(jnp.float32).reshape(1, C)
    beta2 = (beta if apply_gn else jnp.zeros((C,))).astype(jnp.float32).reshape(1, C)
    # film rows grouped to (G, P, C); f32 (dynamic bf16 row slices trip Mosaic
    # tile-alignment — cf. ops/groupnorm.py)
    if has_film:
        shift2 = film_shift.astype(jnp.float32).reshape(G, P, C)
        scale2 = film_scale.astype(jnp.float32).reshape(G, P, C)
    else:
        shift2 = jnp.zeros((G, 1, C), jnp.float32)
        scale2 = jnp.zeros((G, 1, C), jnp.float32)
    skip2 = skip.reshape(G, M, c_out) if has_skip else jnp.zeros((G, 1, c_out), x.dtype)

    film_spec = pl.BlockSpec(
        (1, P if has_film else 1, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    skip_spec = pl.BlockSpec(
        (1, M if has_skip else 1, c_out), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(
            _gn_silu_conv_kernel,
            H=H, W=W, P=P, num_groups=num_groups, eps=eps,
            has_film=has_film, has_skip=has_skip, apply_gn=apply_gn,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma (1, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta (1, C)
            film_spec,  # shift
            film_spec,  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (9C, c_out)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, c_out)
            skip_spec,
        ],
        out_specs=pl.BlockSpec((1, M, c_out), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, M, c_out), x.dtype),
        interpret=interpret,
    )(x2, gamma2, beta2, shift2, scale2, w2, b2, skip2)
    return out.reshape(B, H, W, c_out)


def fusable(x: jax.Array, c_out: int) -> bool:
    """Shape gate: TPU backend, bf16 activations (the inference perf target —
    f32 doubles every VMEM buffer and OOMs the C=512 up-path blocks),
    lane-aligned channels, sublane-aligned rows, and a one-image working set
    that fits VMEM (the kernel never splits an image spatially — that would
    need halo exchange)."""
    import os

    B, H, W, C = x.shape
    # Default OFF: measured end-to-end on v5e (bench.py A/B, 2026-08-16) the
    # fused kernel LOSES to XLA's own conv+fusion — 11.5 vs 16.1 samples/s/chip
    # at the flagship shapes (per-op: 0.81-0.95x, scripts/bench_fused_conv.py).
    # XLA pipelines the VPU normalize phase against neighboring ops across the
    # batch; the in-kernel phases serialize. Kept opt-in (VDIFF_FUSED_CONV=1)
    # as the base for a future sub-block-interleaved rewrite — same discipline
    # as the GN kernel (ops/groupnorm.py:287-295).
    if os.environ.get("VDIFF_FUSED_CONV", "0") != "1":
        return False
    if jax.default_backend() != "tpu" or x.dtype != jnp.bfloat16:
        return False
    if C % 128 or c_out % 128:
        return False
    if (H * W) % 16:  # bf16 sublane tile
        return False
    # peak-liveness estimate (bytes), P=1: x bf16 (double-buffered) + x32/x² f32
    # + y bf16 + one rolled copy + acc f32 + out bf16 (double-buffered) + weights
    hw = H * W
    bytes_p1 = hw * C * (2 * 2 + 4 + 4 + 2 + 2) + hw * c_out * (4 + 2 * 2) + 9 * C * c_out * 2
    return bytes_p1 <= 14 * 1024 * 1024
