"""Experiment assembly — shared by the train/generate/eval CLIs and library
users.

Covers the reference's config-plumbing responsibilities (train.py:31-110,
generate.py:40-110) with a declarative design instead of per-field statements:

* :func:`resolve_section` walks a ``{field: spec}`` table through the 3-level
  precedence rule (CLI > experiment JSON > defaults) implemented by
  :func:`vdiff_tpu.utils.config.update_config`.
* :func:`build_diffusion` / :func:`build_unet` turn resolved config sections
  into the process/model objects (single source of truth for schedule
  construction, out-channel inference, and the ``x_0``→``x0`` flag normalize).
* :func:`load_checkpoint_params` abstracts over this framework's Orbax
  checkpoint directories and the reference's torch ``.pt`` files.
"""

from __future__ import annotations

import json
import os
from functools import partial
from types import SimpleNamespace

from .utils.config import fill_with_defaults, update_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")
DEFAULT_CONFIG_PATH = os.path.join(CONFIG_DIR, "defaults.json")


def load_experiment_config(config_path: str, default_config_path: str = DEFAULT_CONFIG_PATH):
    """Experiment JSON deep-merged over defaults → (config dict, exp name)."""
    with open(config_path, "r") as f:
        config = json.load(f)
    with open(default_config_path, "r") as f:
        defaults = json.load(f)
    fill_with_defaults(config, defaults)
    exp_name = os.path.splitext(os.path.basename(config_path))[0]
    return config, exp_name


def resolve_section(config: dict, args, section: str, fields: dict) -> SimpleNamespace:
    """Resolve one config section against CLI args, table-driven.

    ``fields`` maps a config field name to a spec dict with optional keys
    ``arg`` (the CLI attribute when named differently) and ``op`` (the
    store_true-flag OR/AND fallback rule). Resolved values are written back
    into ``config[section]`` (so the dumped config records what actually ran)
    and returned as attributes.
    """
    sec = config.setdefault(section, {})
    get = partial(update_config, old_config=sec, new_config=args)
    out = {
        name: get(name, spec.get("arg"), logical_op=spec.get("op"))
        for name, spec in fields.items()
    }
    return SimpleNamespace(**out)


def normalize_out_type(model_out_type: str) -> str:
    """The reference CLI spells the x0 head "x_0" while configs/models use
    "x0" (left broken upstream); accept both."""
    return "x0" if model_out_type == "x_0" else model_out_type


def build_diffusion(diff_section: dict, *, w_guide: float, p_uncond: float = 0.0,
                    sample_timesteps: int | None = None, continuous_gate: bool = True):
    """(resolved) ``config["diffusion"]`` → (GaussianDiffusion, train_timesteps).

    The schedule is constructed here (pure ``fn(t) -> (logsnr, t_adj)``). With
    ``continuous_gate`` (training semantics, reference train.py:94) the rescale
    applies only when training is continuous (train_timesteps == 0); without it
    (sampling semantics, reference generate.py:75) ``allow_rescale`` applies
    directly.
    """
    from .diffusion import GaussianDiffusion
    from .ops.numerics import get_logsnr_schedule

    d = dict(diff_section)
    train_timesteps = d.pop("train_timesteps", None)
    allow_rescale = d.pop("allow_rescale", False)
    rescale = allow_rescale and (train_timesteps == 0 or not continuous_gate)
    logsnr_fn = get_logsnr_schedule(
        d.pop("logsnr_schedule"),
        logsnr_min=d.pop("logsnr_min"),
        logsnr_max=d.pop("logsnr_max"),
        rescale=rescale,
    )
    if sample_timesteps is not None:
        d["sample_timesteps"] = sample_timesteps
    d["model_out_type"] = normalize_out_type(d.get("model_out_type", "eps"))
    diffusion = GaussianDiffusion(logsnr_fn=logsnr_fn, w_guide=w_guide, p_uncond=p_uncond, **d)
    return diffusion, train_timesteps


def build_unet(model_section: dict, *, in_channels: int, model_out_type: str,
               num_classes: int, multitags: bool, use_flash: bool, dtype=None,
               remat: bool = False, remat_policy=None):
    """(resolved) ``config["model"]`` → UNet; infers out_channels from the
    prediction head ("both" doubles channels, reference train.py:106-110)."""
    from .models.unet import UNet

    cfg = {k: v for k, v in model_section.items() if k != "use_xformers"}
    cfg.setdefault("in_channels", in_channels)
    assert cfg["in_channels"] == in_channels, (cfg["in_channels"], in_channels)
    head_mult = 2 if normalize_out_type(model_out_type) == "both" else 1
    cfg.setdefault("out_channels", head_mult * in_channels)
    return UNet(num_classes=num_classes, multitags=multitags, use_flash=use_flash,
                dtype=dtype, remat=remat, remat_policy=remat_policy, **cfg)


def load_checkpoint_params(ckpt_path: str, use_ema: bool = False):
    """Load denoiser weights from an Orbax checkpoint dir or a reference torch
    ``.pt`` file.

    Returns ``(params, head_keys, is_torch)``: ``params`` is either a Flax
    param tree (Orbax) or a torch state dict (caller converts via
    ``models.convert.torch_unet_to_flax`` once the model is built),
    ``head_keys`` are the top-level module names — used to sniff conditional
    models by the presence of ``class_embed`` (reference generate.py:44) —
    and ``is_torch`` says which format was loaded.
    """
    if os.path.isdir(ckpt_path):
        import orbax.checkpoint as ocp

        payload = ocp.StandardCheckpointer().restore(ckpt_path)
        if use_ema:
            # consistent with the torch branch: asking for EMA weights a
            # checkpoint doesn't have is an error, not a silent fallback
            if payload.get("ema_params") is None:
                raise KeyError(
                    f"--use-ema requested but '{ckpt_path}' holds no ema_params "
                    "(trained without --use-ema?)"
                )
            params = payload["ema_params"]
        else:
            params = payload["params"]
        return params, set(params.keys()), False

    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu")
    state_dict = ckpt["ema"]["shadow"] if use_ema else ckpt["model"]
    for k in list(state_dict.keys()):  # strip DDP prefixes
        if k.startswith("module."):
            state_dict[k.split(".", maxsplit=1)[1]] = state_dict.pop(k)
    return state_dict, {k.split(".")[0] for k in state_dict}, True
