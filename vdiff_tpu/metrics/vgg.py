"""VGG16 feature extractor in Flax for the Precision/Recall metric.

Replaces the NVIDIA stylegan2-ada TorchScript VGG16 the reference downloads
(precision_recall.py:23-47). Network: standard VGG16 — 13 convs (3x3, SAME) in
blocks (64,64 / 128,128 / 256,256,256 / 512,512,512 / 512,512,512) with 2x2
max-pools, then fc6 (25088→4096) → ReLU → fc7 (4096→4096); the returned
features are the 4096-d fc7 activations, matching the stylegan2-ada
``return_features=True`` convention.

Input convention (stylegan2-ada): raw images in [0, 255], any resolution;
internally resized to 224×224 bilinear and mean-normalized with ImageNet
channel means scaled by 255 (the NVIDIA port folds preprocessing in).

Weights are converted from either the NVIDIA ``vgg16.pt`` TorchScript file or
a torchvision ``vgg16`` state_dict when present locally (no egress here).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

VGG_FILENAMES = ("vgg16.pt", "vgg16-397923af.pth")
_SEARCH_DIRS = (
    "precomputed",
    os.path.expanduser("~/.cache/torch/hub"),
    os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    os.path.expanduser("~/datasets"),
    ".",
)

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
_IMAGENET_MEAN_255 = np.array([123.68, 116.779, 103.939], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (N, 224, 224, 3) float, raw [0, 255] minus ImageNet means."""
        ci = 0
        for v in _CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=1, name=f"conv{ci}")(x))
                ci += 1
        # torch flattens NCHW (C, H, W); match that order for weight parity
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.Dense(4096, name="fc7")(x)
        return x


def convert_vgg_weights(torch_state_dict) -> dict:
    """torchvision-layout vgg16 state_dict → Flax params (fc8 head dropped).

    Rejects keys outside the known manifest so a layout drift in the weights
    file fails loudly instead of silently dropping tensors."""
    from .manifests import vgg16_manifest

    known = set(vgg16_manifest())
    unknown = set(torch_state_dict) - known
    if unknown:
        raise KeyError(f"unexpected vgg16 state-dict keys: {sorted(unknown)[:5]}")
    sd = {
        k: np.asarray(getattr(v, "detach", lambda: v)().cpu()) if hasattr(v, "cpu") else np.asarray(v)
        for k, v in torch_state_dict.items()
    }
    params = {}
    conv_keys = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("features.") and k.endswith(".weight")}
    )
    for ci, li in enumerate(conv_keys):
        params[f"conv{ci}"] = {
            "kernel": sd[f"features.{li}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"features.{li}.bias"],
        }
    params["fc6"] = {
        "kernel": sd["classifier.0.weight"].T,
        "bias": sd["classifier.0.bias"],
    }
    params["fc7"] = {
        "kernel": sd["classifier.3.weight"].T,
        "bias": sd["classifier.3.bias"],
    }
    return {"params": params}


def find_vgg_weights() -> Optional[str]:
    for d in _SEARCH_DIRS:
        for f in VGG_FILENAMES:
            cand = os.path.join(d, f)
            if os.path.exists(cand):
                return cand
    return None


def load_vgg_features(weights_path: Optional[str] = None, batch_size: int = 64,
                      mesh=None):
    """Returns feature_fn: (N, H, W, C) uint8/float images → (N, 4096) f32.
    ``mesh`` shards each batch over the data axis (eval.py --dp)."""
    weights_path = weights_path or find_vgg_weights()
    if weights_path is None:
        raise FileNotFoundError(
            f"VGG16 weights not found (looked for {VGG_FILENAMES} in {_SEARCH_DIRS}). "
            "No network egress here — place NVIDIA's vgg16.pt or torchvision's "
            "vgg16 state_dict in one of those directories."
        )
    import torch

    if weights_path.endswith(".pt"):
        mod = torch.jit.load(weights_path, map_location="cpu")
        variables = convert_vgg_weights(mod.state_dict())
    else:
        variables = convert_vgg_weights(torch.load(weights_path, map_location="cpu", weights_only=True))

    model = VGG16Features()
    mean = jnp.asarray(_IMAGENET_MEAN_255)

    @jax.jit
    def _features(x):
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear", antialias=False)
        return model.apply(variables, x - mean)

    def feature_fn(x):
        from .device_apply import apply_batched

        x = np.asarray(x)
        if x.dtype != np.float32:
            x = x.astype(np.float32)
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return apply_batched(_features, x, batch_size, mesh=mesh)

    return feature_fn
