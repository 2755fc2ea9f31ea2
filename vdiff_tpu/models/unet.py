"""UNet denoiser — TPU-native (Flax/linen, NHWC) re-design of reference
``v_diffusion/models/unet.py``.

Capability parity with the reference UNet (unet.py:151-322):
  * DDPM-style UNet with BigGAN-style resample-inside-ResBlock
    (``resample_with_res=True`` default), per-level attention flags
  * sinusoidal timestep embedding (scale=1000) → 2-layer SiLU MLP
  * class conditioning added to the time embedding — one-hot with
    ``exclude_zero`` for scalar classes, plain Dense on √count-normalized
    multi-hot tags for CelebA (unet.py:207-215, 289-295)
  * FiLM conditioning in ResBlocks: (1+scale)·GN(x)+shift (unet.py:142-146)
  * zero-initialized output projections throughout (init_scale=0.)

TPU-first design choices (not translations):
  * NHWC layout — XLA:TPU's native conv layout; channels ride the 128-lane
    minor dimension.
  * Attention is computed over flattened spatial tokens with a fused
    scaled-dot-product (optionally a Pallas flash kernel) rather than the
    reference's (HW)²-materializing einsum (unet.py:55-64). One implementation
    covers both ``AttentionBlock`` and ``XFormersAttentionBlock`` capabilities.
  * All control flow is static; the module jits/scans cleanly.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.numerics import get_timestep_embedding
from ..ops.attention import pack1_padded_heads, spatial_attention_qkv
from ..ops.conv3x3 import fusable, fused_gn_silu_conv3x3
from ..ops.groupnorm import gn_film_silu
from .layers import (
    Conv,
    Conv1x1,
    Conv3x3,
    Dense,
    EfficientDropout,
    ParamConv,
    avg_pool_2x,
    nearest_upsample,
    one_hot_exclude_zero,
)


def _conv_nhwc(x, kernel, strides=(1, 1)):
    """Bare NHWC/HWIO conv in x's compute dtype (bias handled by callers)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class FusableGroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) with optional fused FiLM+SiLU epilogue.

    Parameter-tree compatible with ``nn.GroupNorm`` (scale/bias), so converted
    reference checkpoints load unchanged. On TPU at inference the whole
    GN→FiLM→SiLU chain runs as one Pallas kernel (ops/groupnorm.py); under
    training/autodiff it uses the XLA composition.
    """

    use_pallas_ok: bool = True

    @nn.compact
    def __call__(self, x, film_shift=None, film_scale=None, *, apply_silu=False,
                 fuse=False, params_only=False):
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        if params_only:  # caller fuses GN into a downstream kernel
            return gamma, beta
        use_pallas = None if (fuse and self.use_pallas_ok) else False
        return gn_film_silu(
            x, gamma, beta, film_shift, film_scale,
            num_groups=32, eps=1e-6, apply_silu=apply_silu, use_pallas=use_pallas,
        )


class AttentionBlock(nn.Module):
    """Self-attention over spatial tokens (reference unet.py:33-103).

    qkv from a single 1x1 conv, multi-head scaled dot-product with 1/√head_dim,
    zero-init output projection, residual.
    """

    head_dim: int | None = None
    num_heads: int | None = None
    use_flash: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_dim = x.shape[-1]
        head_dim, num_heads = self.head_dim, self.num_heads
        if head_dim is None:
            assert num_heads is not None and in_dim % num_heads == 0
            head_dim = in_dim // num_heads
        if num_heads is None:
            assert head_dim is not None and in_dim % head_dim == 0
            num_heads = in_dim // head_dim
        hid_dim = head_dim * num_heads

        skip = x
        B, H, W, _ = x.shape
        h = FusableGroupNorm(name="norm")(x, apply_silu=False, fuse=not train)
        # qkv/out projections run as token matmuls (param trees identical to
        # the 1x1 convs): a dot reads the neighboring convs' layouts natively,
        # where conv(1x1) → Pallas-attention forced ~0.6 ms/step of relayout
        # copies at B=64 (profiled: copy.1969 et al., scripts/trace_sampler.py)
        kin, bin_ = ParamConv(3 * hid_dim, (1, 1), name="proj_in", dtype=self.dtype)(
            h, params_only=True
        )
        tokens = h.reshape(B, H * W, in_dim)
        # head padding for misaligned sub-lane shapes (celeba's T=256 level:
        # N=9/C=64 → NC=576): zero weight columns per q/k/v section + zero
        # proj-out rows make NC 128-aligned so the packed zero-copy kernels
        # apply; the pad head's output and all real-weight gradients are
        # exactly zero (see ops/attention.py:pack1_padded_heads). Param trees
        # are untouched — the pad lives on the jit-traced weight VALUES.
        n_eff = (pack1_padded_heads(H * W, num_heads, head_dim, train)
                 if self.use_flash else 0) or num_heads
        w_in, b_in = kin[0, 0], bin_
        if n_eff != num_heads:
            zc = jnp.zeros((in_dim, (n_eff - num_heads) * head_dim), w_in.dtype)
            w_in = jnp.concatenate(
                [a for s in jnp.split(w_in, 3, axis=-1) for a in (s, zc)], axis=-1)
            zb = jnp.zeros((zc.shape[-1],), b_in.dtype)
            b_in = jnp.concatenate(
                [a for s in jnp.split(b_in, 3) for a in (s, zb)])
        qkv = checkpoint_name(
            jnp.dot(tokens, w_in.astype(tokens.dtype)) + b_in.astype(tokens.dtype),
            "unet_mm",
        )
        # fused-qkv attention: at inference the Pallas kernel reads q/k/v as
        # lane-offset views of the projection output (no split copies); at
        # training it dispatches to the custom-VJP flash kernels (attention
        # was 20% of the train step through XLA autodiff's materialized
        # softmax chain)
        out = checkpoint_name(
            spatial_attention_qkv(
                qkv, n_eff, use_flash=self.use_flash, train=train,
            ),
            "unet_mm",
        )
        kout, bout = ParamConv(in_dim, (1, 1), init_scale=0.0, name="proj_out",
                               dtype=self.dtype)(
                                   out[..., :hid_dim].reshape(B, H, W, hid_dim),
                                   params_only=True)
        w_out = kout[0, 0]
        if n_eff != num_heads:
            w_out = jnp.concatenate(
                [w_out, jnp.zeros((out.shape[-1] - hid_dim, in_dim), w_out.dtype)])
        out = checkpoint_name(
            jnp.dot(out, w_out.astype(out.dtype)) + bout.astype(out.dtype),
            "unet_mm",
        )
        return out.reshape(B, H, W, in_dim) + skip


class ResidualBlock(nn.Module):
    """FiLM-conditioned residual block (reference unet.py:106-148).

    norm → SiLU → resample → conv3x3; conditioning fc(SiLU(t_emb)) → (shift,
    scale); x = (1+scale)·GN(x)+shift; second conv zero-init; resample ∈
    {nearest-up ×2, avg-pool 2, identity}; 1x1-conv skip on channel change.
    """

    out_channels: int
    drop_rate: float = 0.0
    resampling: str = "none"  # none | upsample | downsample
    dtype: jnp.dtype | None = None

    @staticmethod
    def _split_ok(c1: int, c2: int) -> bool:
        """GN(32) groups over concat([a, b]) must not straddle the a/b seam."""
        total = c1 + c2
        if total % 32:
            return False
        cg = total // 32
        return c1 % cg == 0 and c2 % cg == 0

    @nn.compact
    def __call__(self, x, t_emb, *, train: bool = False, skip_in=None):
        """``skip_in`` is the up-path skip tensor the reference concatenates
        onto x (unet.py:315). When GN groups split cleanly at the seam, the
        whole front of the block — GN, SiLU, conv1, the 1x1 skip conv — runs
        concat-free as per-part ops summed into the conv outputs (exact same
        math: groups never straddle the seam, and conv over a channel concat
        is the sum of per-part convs). Measured 1.48x on the up-block front at
        flagship shapes (scripts/bench_concat_free.py): the (B, H, W, C1+C2)
        concat is 128 MB that XLA materializes and reads twice."""
        split = (
            skip_in is not None
            and self.resampling == "none"
            and x.shape[-1] + skip_in.shape[-1] != self.out_channels  # 1x1 skip present
            and self._split_ok(x.shape[-1], skip_in.shape[-1])
        )
        if skip_in is not None and not split:
            x = jnp.concatenate([x, skip_in], axis=-1)
            skip_in = None
        in_channels = x.shape[-1] + (skip_in.shape[-1] if split else 0)
        resample = {
            "upsample": nearest_upsample,
            "downsample": avg_pool_2x,
            "none": lambda a: a,
        }[self.resampling]

        # fused inference kernels (no autodiff through them; dropout inactive)
        fuse = not train

        norm1 = FusableGroupNorm(name="norm1")
        conv1 = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")
        if split:
            C1, C2 = x.shape[-1], skip_in.shape[-1]
            ctot = C1 + C2
            # channel-count carrier for params_only sizing (never computed on)
            dummy = jnp.zeros((1, 1, 1, ctot), x.dtype)
            ks, bs = Conv1x1(self.out_channels, dtype=self.dtype, name="skip")(
                dummy, params_only=True
            )
            skip = checkpoint_name(
                _conv_nhwc(x, ks[:, :, :C1])
                + _conv_nhwc(skip_in, ks[:, :, C1:])
                + bs.astype(x.dtype),
                "unet_mm",
            )
            gamma, beta = norm1(dummy, params_only=True)
            ga = gn_film_silu(x, gamma[:C1], beta[:C1],
                              num_groups=32 * C1 // ctot, eps=1e-6, apply_silu=True)
            gb = gn_film_silu(skip_in, gamma[C1:], beta[C1:],
                              num_groups=32 * C2 // ctot, eps=1e-6, apply_silu=True)
            k1, b1 = conv1(dummy, params_only=True)
            h = checkpoint_name(
                _conv_nhwc(ga, k1[:, :, :C1])
                + _conv_nhwc(gb, k1[:, :, C1:])
                + b1.astype(x.dtype),
                "unet_mm",
            )
        else:
            skip = resample(x)
            if in_channels != self.out_channels:
                skip = Conv(self.out_channels, (1, 1), name="skip", dtype=self.dtype)(skip)
            # the GN→SiLU→conv3x3 megakernel only applies when nothing
            # resamples between the norm and the conv
            if fuse and self.resampling == "none" and fusable(x, self.out_channels):
                gamma1, beta1 = norm1(x, params_only=True)
                k1, b1 = conv1(x, params_only=True)
                h = fused_gn_silu_conv3x3(x, k1, b1, gamma1, beta1)
            else:
                h = norm1(x, apply_silu=True, fuse=fuse)
                h = conv1(resample(h))

        # FiLM: fc(SiLU(t_emb)) → (shift, scale); reference chunks shift first
        # (unet.py:142-146)
        emb = Dense(2 * self.out_channels, name="fc", dtype=self.dtype)(nn.silu(t_emb))
        shift, scale = jnp.split(emb, 2, axis=-1)
        # reference order: conv2(dropout(silu(FiLM(GN(h))))) (unet.py:147)
        norm2 = FusableGroupNorm(name="norm2")
        conv2 = Conv3x3(self.out_channels, init_scale=0.0, dtype=self.dtype, name="conv2")
        if fuse and fusable(h, self.out_channels):
            gamma2, beta2 = norm2(h, params_only=True)
            k2, b2 = conv2(h, params_only=True)
            return fused_gn_silu_conv3x3(
                h, k2, b2, gamma2, beta2, shift, scale, skip=skip.astype(h.dtype)
            )
        h = norm2(h, film_shift=shift, film_scale=scale, apply_silu=True, fuse=fuse)
        if self.drop_rate > 0.0:
            h = EfficientDropout(self.drop_rate, deterministic=not train)(h)
        h = conv2(h)
        return h + skip


class _ResAttn(nn.Module):
    """ResidualBlock optionally followed by attention (reference Sequential at
    unet.py:240-247)."""

    out_channels: int
    apply_attn: bool
    drop_rate: float = 0.0
    resampling: str = "none"
    head_dim: int | None = None
    num_heads: int | None = None
    use_flash: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, t_emb, train: bool = False, skip_in=None):
        x = ResidualBlock(
            self.out_channels,
            drop_rate=self.drop_rate,
            resampling=self.resampling,
            dtype=self.dtype,
            name="res",
        )(x, t_emb, train=train, skip_in=skip_in)
        if self.apply_attn:
            x = AttentionBlock(
                head_dim=self.head_dim,
                num_heads=self.num_heads,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name="attn",
            )(x, train=train)
        return x


class UNet(nn.Module):
    """Improved-DDPM UNet; config knobs mirror reference unet.py:155-171."""

    in_channels: int
    hid_channels: int
    out_channels: int
    ch_multipliers: Sequence[int]
    num_res_blocks: int
    apply_attn: Union[bool, Sequence[bool]]
    embedding_dim: int | None = None
    drop_rate: float = 0.0
    head_dim: int | None = None
    num_heads: int | None = None
    num_classes: int = 0
    multitags: bool = False
    resample_with_res: bool = True
    use_flash: bool = True
    # gradient checkpointing: recompute each block's activations in the
    # backward instead of storing them (jax.checkpoint) — trades ~1/3 more
    # FLOPs for O(depth) less activation memory. Needed to train the
    # celeba-scale model (301M params, 64x64) at useful batch sizes on one
    # chip; beyond-parity (torch reference has no activation checkpointing).
    remat: bool = False
    # remat_policy="conv": selective checkpointing — conv/matmul outputs
    # (tagged "unet_mm") are SAVED and only the cheap elementwise chains
    # (GN/FiLM/SiLU/dropout) recompute in the backward. More activation
    # memory than full per-block remat, but the backward re-executes no
    # convolutions (the FLOPs-heavy 90% of a block; +0.6% executed FLOPs vs
    # full remat's +25.2%, RUNLOG round 4). Setting a policy enables
    # checkpointing by itself — `remat=True` is not additionally required.
    remat_policy: str | None = None
    dtype: jnp.dtype | None = None

    @property
    def levels(self) -> int:
        return len(self.ch_multipliers)

    def _attn_flags(self):
        if isinstance(self.apply_attn, bool):
            return [self.apply_attn] * self.levels
        return list(self.apply_attn)

    def _block(self, level, out_ch, resampling="none", name=None):
        head_dim, num_heads = self.head_dim, self.num_heads
        if head_dim is None and num_heads is None:
            num_heads = 1  # reference default (unet.py:184-185)
        policy = None
        if self.remat_policy == "conv":
            policy = jax.checkpoint_policies.save_only_these_names("unet_mm")
        elif self.remat_policy is not None:
            raise ValueError(f"unknown remat_policy {self.remat_policy!r}")
        if self.remat or self.remat_policy is not None:
            cls = nn.remat(_ResAttn, static_argnums=(3,), policy=policy)
        else:
            cls = _ResAttn
        return cls(
            out_ch,
            apply_attn=self._attn_flags()[level],
            drop_rate=self.drop_rate,
            resampling=resampling,
            head_dim=head_dim,
            num_heads=num_heads,
            use_flash=self.use_flash,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, t, y=None, *, train: bool = False):
        ch = self.hid_channels
        embed_dim = self.embedding_dim or 4 * ch
        chs = [m * ch for m in self.ch_multipliers]
        attn_flags = self._attn_flags()

        # --- conditioning (reference unet.py:201-215, 286-295) ---
        t_emb = get_timestep_embedding(t, ch)
        t_emb = Dense(embed_dim, name="time_embed_1", dtype=self.dtype)(t_emb)
        t_emb = Dense(embed_dim, name="time_embed_2", dtype=self.dtype)(nn.silu(t_emb))
        if self.num_classes > 0 and y is not None:
            if self.multitags:
                assert y.ndim == 2
                count = jnp.sqrt(jnp.clip(jnp.sum(y != 0, axis=1).astype(y.dtype), 1.0, None))
                y = y / count[:, None]
                c_emb = Dense(embed_dim, name="class_embed", dtype=self.dtype)(y)
            else:
                onehot = one_hot_exclude_zero(y, self.num_classes)
                c_emb = Dense(embed_dim, name="class_embed", dtype=self.dtype)(onehot)
            t_emb = t_emb + c_emb

        # --- downsampling path (reference unet.py:250-263, 296-305) ---
        hs = [Conv(ch, (3, 3), name="in_conv", dtype=self.dtype)(x)]
        for i in range(self.levels):
            prev_ch = chs[i - 1] if i else ch
            cur_ch = chs[i]
            h = self._block(i, cur_ch, name=f"down_{i}_0")(hs[-1], t_emb, train)
            hs.append(h)
            for j in range(1, self.num_res_blocks):
                h = self._block(i, cur_ch, name=f"down_{i}_{j}")(hs[-1], t_emb, train)
                hs.append(h)
            if i != self.levels - 1:
                if self.resample_with_res:
                    h = self._block(i, cur_ch, resampling="downsample", name=f"down_{i}_ds")(
                        hs[-1], t_emb, train
                    )
                else:
                    # stride-2 conv downsample; padding ((1,1),(1,1)) keeps the
                    # H/2 shape contract (reference unet.py:261 uses pad=0,
                    # which breaks shape parity — deliberate fix)
                    h = Conv(
                        cur_ch, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                        name=f"down_{i}_ds", dtype=self.dtype,
                    )(hs[-1])
                hs.append(h)

        # --- middle: Res → Attn → Res (reference unet.py:222-226) ---
        mid_ch = chs[-1]
        h = ResidualBlock(mid_ch, drop_rate=self.drop_rate, dtype=self.dtype, name="mid_res1")(
            hs[-1], t_emb, train=train
        )
        head_dim, num_heads = self.head_dim, self.num_heads
        if head_dim is None and num_heads is None:
            num_heads = 1
        h = AttentionBlock(
            head_dim=head_dim, num_heads=num_heads, use_flash=self.use_flash,
            dtype=self.dtype, name="mid_attn",
        )(h, train=train)
        h = ResidualBlock(mid_ch, drop_rate=self.drop_rate, dtype=self.dtype, name="mid_res2")(
            h, t_emb, train=train
        )

        # --- upsampling path (reference unet.py:265-284, 310-319) ---
        for i in range(self.levels - 1, -1, -1):
            cur_ch = chs[i]
            for j in range(self.num_res_blocks + 1):
                # reference concatenates (unet.py:315); passed separately so
                # the block can run the concat-free split when GN groups allow
                h = self._block(i, cur_ch, name=f"up_{i}_{j}")(
                    h, t_emb, train, hs.pop()
                )
            if i != 0:
                if self.resample_with_res:
                    h = self._block(i, cur_ch, resampling="upsample", name=f"up_{i}_us")(
                        h, t_emb, train
                    )
                else:
                    h = Conv(cur_ch, (3, 3), name=f"up_{i}_us", dtype=self.dtype)(
                        nearest_upsample(h)
                    )
        assert len(hs) == 0

        # --- output head: GN → SiLU → zero-init conv (reference unet.py:229-232) ---
        h = FusableGroupNorm(name="out_norm")(h, apply_silu=True, fuse=not train)
        h = Conv(self.out_channels, (3, 3), init_scale=0.0, name="out_conv")(h)
        return h
