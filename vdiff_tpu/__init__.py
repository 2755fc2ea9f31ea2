"""vdiff_tpu — TPU-native V-objective diffusion framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference ``tqch/v-diffusion-torch`` (see SURVEY.md): continuous-time log-SNR
Gaussian diffusion, improved-DDPM UNet, DDIM/ancestral samplers compiled to a
single on-chip ``lax.scan``, classifier-free guidance, mesh data-parallel
training over ICI, gradient accumulation, EMA, Orbax checkpointing, and
FID / Precision-Recall evaluation.
"""

import os as _os

# Deterministic platform pinning for the CLIs: hosted TPU environments can
# install a sitecustomize that registers their plugin and clobbers the
# JAX_PLATFORMS env var in every interpreter, so `JAX_PLATFORMS=cpu train.py`
# silently lands on the (possibly absent) TPU backend. VDIFF_JAX_PLATFORM
# survives such overrides because it is applied through jax.config, which
# wins over the env var; it must run before any backend initialization —
# importing this package first (as all CLIs do) is early enough.
_platform = _os.environ.get("VDIFF_JAX_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)

from .diffusion import GaussianDiffusion
from .ops.numerics import get_logsnr_schedule
from .models.unet import UNet
from .utils.config import dict2str, update_config, fill_with_defaults
from .utils.misc import seed_all
from .data import DATA_INFO, get_dataloader
from .train_lib import Trainer, Evaluator

__all__ = [
    "get_dataloader",
    "DATA_INFO",
    "dict2str",
    "seed_all",
    "update_config",
    "fill_with_defaults",
    "Trainer",
    "Evaluator",
    "GaussianDiffusion",
    "get_logsnr_schedule",
    "UNet",
]
