"""Checkpoint migration: reference (torch) UNet state_dicts → Flax params.

Lets users of the reference framework load their trained ``v-diffusion-torch``
checkpoints (train_utils.py:328-352 format) directly into :class:`UNet`.
Also the engine of the forward-parity test gate (BASELINE.json: per-step
latents must match the torch reference within fp32 tolerance).

Layout transforms: torch Linear (out, in) → flax (in, out); torch Conv OIHW →
flax HWIO; GroupNorm weight/bias → scale/bias. Structure mapping follows the
reference module tree (models/unet.py:196-232; see docstrings in unet.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t_linear(sd, prefix):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _t_conv(sd, prefix):
    w = np.asarray(sd[prefix + ".weight"])  # OIHW
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}  # HWIO
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _t_norm(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _t_resblock(sd, prefix, has_skip):
    out = {
        "norm1": _t_norm(sd, prefix + ".norm1"),
        "conv1": _t_conv(sd, prefix + ".conv1"),
        "fc": _t_linear(sd, prefix + ".fc"),
        "norm2": _t_norm(sd, prefix + ".norm2"),
        "conv2": _t_conv(sd, prefix + ".conv2"),
    }
    if has_skip:
        out["skip"] = _t_conv(sd, prefix + ".skip")
    return out


def _t_attn(sd, prefix):
    return {
        "norm": _t_norm(sd, prefix + ".norm"),
        "proj_in": _t_conv(sd, prefix + ".proj_in"),
        "proj_out": _t_conv(sd, prefix + ".proj_out"),
    }


def torch_unet_to_flax(state_dict: Dict[str, "np.ndarray"], model) -> dict:
    """Convert a reference UNet state_dict to params for :class:`UNet` ``model``.

    ``state_dict`` values may be torch tensors or numpy arrays; ``module.``
    DDP prefixes are stripped (reference train_utils.py:318-323).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k.split(".", 1)[1]
        sd[k] = np.asarray(getattr(v, "detach", lambda: v)().cpu()) if hasattr(v, "cpu") else np.asarray(v)

    levels = model.levels
    nres = model.num_res_blocks
    attn_flags = (
        [model.apply_attn] * levels if isinstance(model.apply_attn, bool) else list(model.apply_attn)
    )
    ch = model.hid_channels
    chs = [m * ch for m in model.ch_multipliers]

    params = {
        "time_embed_1": _t_linear(sd, "time_embed.0"),
        "time_embed_2": _t_linear(sd, "time_embed.2"),
        "in_conv": _t_conv(sd, "in_conv"),
        "out_norm": _t_norm(sd, "out_conv.0"),
        "out_conv": _t_conv(sd, "out_conv.2"),
    }
    if model.num_classes > 0 and any(k.startswith("class_embed") for k in sd):
        if model.multitags:
            params["class_embed"] = _t_linear(sd, "class_embed")
        else:
            params["class_embed"] = _t_linear(sd, "class_embed.1")

    def block(prefix, attn, in_ch, out_ch):
        """reference Sequential(Res, Attn) vs bare Res (unet.py:240-247)."""
        res_prefix = prefix + ".0" if attn else prefix
        out = {"res": _t_resblock(sd, res_prefix, has_skip=in_ch != out_ch)}
        if attn:
            out["attn"] = _t_attn(sd, prefix + ".1")
        return out

    # downsamples (reference unet.py:250-263)
    for i in range(levels):
        prev = chs[i - 1] if i else ch
        cur = chs[i]
        attn = attn_flags[i]
        base = f"downsamples.level_{i}"
        params[f"down_{i}_0"] = block(f"{base}.0", attn, prev, cur)
        for j in range(1, nres):
            params[f"down_{i}_{j}"] = block(f"{base}.{j}", attn, cur, cur)
        if i != levels - 1:
            if model.resample_with_res:
                params[f"down_{i}_ds"] = block(f"{base}.{nres}", attn, cur, cur)
            else:
                params[f"down_{i}_ds"] = _t_conv(sd, f"{base}.{nres}")

    # middle (reference unet.py:222-226: Sequential(res, attn, res))
    params["mid_res1"] = _t_resblock(sd, "middle.0", has_skip=False)
    params["mid_attn"] = _t_attn(sd, "middle.1")
    params["mid_res2"] = _t_resblock(sd, "middle.2", has_skip=False)

    # upsamples (reference unet.py:265-284)
    for i in range(levels):
        cur = chs[i]
        nxt = ch if i == 0 else chs[i - 1]
        prev = chs[-1] if i == levels - 1 else chs[i + 1]
        attn = attn_flags[i]
        base = f"upsamples.level_{i}"
        params[f"up_{i}_0"] = block(f"{base}.0", attn, prev + cur, cur)
        for j in range(1, nres):
            params[f"up_{i}_{j}"] = block(f"{base}.{j}", attn, 2 * cur, cur)
        params[f"up_{i}_{nres}"] = block(f"{base}.{nres}", attn, nxt + cur, cur)
        if i != 0:
            if model.resample_with_res:
                params[f"up_{i}_us"] = block(f"{base}.{nres + 1}", attn, cur, cur)
            else:
                params[f"up_{i}_us"] = _t_conv(sd, f"{base}.{nres + 1}.1")

    return params
