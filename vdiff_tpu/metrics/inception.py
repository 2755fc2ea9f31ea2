"""FID-patched InceptionV3 in Flax — TPU-native replacement for reference
``v_diffusion/metrics/inception.py`` (which patches torchvision InceptionV3
with TF-compatible blocks and loads the mseitzer/pytorch-fid weights).

Faithful to the FID network semantics the 2.58 headline number depends on
(SURVEY.md §6): BasicConv2d = conv(no bias) + BatchNorm(eps=1e-3) + ReLU;
InceptionA/C/E pool branches use avg-pool with ``count_include_pad=False``
(inception.py:13, FIDInceptionA/C/E_1); Mixed_7c's pool branch uses max-pool
(FIDInceptionE_2, inception.py:268-301); inputs are bilinearly resized to
299×299 and scaled to [-1, 1] (inception.py:135-156); features are the 2048-d
pool3 activations.

Weights: converted from the pytorch-fid release file
(``pt_inception-2015-12-05-6726825d.pth``) when available locally — this
environment has no egress, so ``load_fid_inception`` searches standard cache
paths and raises with instructions otherwise.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

FID_WEIGHTS_FILENAME = "pt_inception-2015-12-05-6726825d.pth"
_SEARCH_DIRS = (
    "precomputed",
    os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    os.path.expanduser("~/datasets"),
    ".",
)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class BasicConv(nn.Module):
    features: int
    kernel_size: tuple
    strides: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=pad, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool_no_pad_count(x, window=3, strides=1):
    """avg_pool(3x3, stride 1, pad 1) with count_include_pad=False — the TF/FID
    convention (reference inception.py FIDInceptionA/C/E_1)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    sum_pool = partial(
        jax.lax.reduce_window,
        init_value=0.0,
        computation=jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, strides, strides, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return sum_pool(x) / sum_pool(ones)


def _max_pool(x, window=3, strides=2, padding="VALID"):
    return nn.max_pool(x, (window, window), strides=(strides, strides), padding=padding)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # 'avg' → FIDInceptionE_1, 'max' → FIDInceptionE_2

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_no_pad_count(x)
        else:  # FIDInceptionE_2 quirk (reference inception.py:292-296)
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3 feature extractor.

    ``output_blocks`` select the tap points by feature dim {64: 0, 192: 1,
    768: 2, 2048: 3} (reference inception.py:28-33). Input: float in [-1, 1]
    when ``normalize_input=False`` else [0, 1], NHWC; resized internally to
    299 bilinear when ``resize_input``.
    """

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = False
    include_head: bool = False  # append the 1008-class fc logits (for IS)

    BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

    @nn.compact
    def __call__(self, x):
        outputs = {}
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear", antialias=False
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        outputs[0] = x
        if max(self.output_blocks) > 0:
            x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = _max_pool(x)
            outputs[1] = x
        if max(self.output_blocks) > 1:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outputs[2] = x
        if max(self.output_blocks) > 2:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool 1x1
            outputs[3] = x
        outs = [outputs[i] for i in self.output_blocks]
        if self.include_head:
            # 1008-class logits of the TF-compatible release net (the head the
            # standard Inception-Score protocol marginalizes over)
            outs.append(nn.Dense(1008, name="fc")(x[:, 0, 0, :]))
        return outs


# ---------------------------------------------------------------------------
# weight conversion (pytorch-fid release file → flax variables)
# ---------------------------------------------------------------------------


def convert_fid_weights(torch_state_dict, include_head: bool = False) -> dict:
    """Convert the mseitzer/pytorch-fid InceptionV3 state_dict to Flax
    {params, batch_stats} collections. The 1008-class fc head is dropped
    unless ``include_head`` (needed for Inception Score)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, v in torch_state_dict.items():
        arr = np.asarray(getattr(v, "detach", lambda: v)().cpu()) if hasattr(v, "cpu") else np.asarray(v)
        parts = key.split(".")
        if parts[0] == "fc":
            if not include_head:
                continue
            if parts[1] == "weight":
                put(params, ["fc", "kernel"], arr.T)  # (1008, 2048) → (2048, 1008)
            elif parts[1] == "bias":
                put(params, ["fc", "bias"], arr)
            else:
                raise KeyError(f"unexpected key {key}")
            continue
        *mod_path, pname = parts
        # mod_path like ['Mixed_5b', 'branch1x1', 'conv'] or ['Conv2d_1a_3x3', 'bn']
        if pname == "weight" and mod_path[-1] == "conv":
            put(params, mod_path + ["kernel"], arr.transpose(2, 3, 1, 0))
        elif mod_path[-1] == "bn":
            if pname == "weight":
                put(params, mod_path + ["scale"], arr)
            elif pname == "bias":
                put(params, mod_path + ["bias"], arr)
            elif pname == "running_mean":
                put(stats, mod_path + ["mean"], arr)
            elif pname == "running_var":
                put(stats, mod_path + ["var"], arr)
            elif pname != "num_batches_tracked":
                raise KeyError(f"unexpected key {key}")
        elif pname == "num_batches_tracked":
            continue
        else:
            raise KeyError(f"unexpected key {key}")

    return {"params": params, "batch_stats": stats}


def load_is_inception(weights_path: Optional[str] = None, batch_size: int = 128,
                      mesh=None):
    """Returns prob_fn: uint8/float (N, H, W, C) images → (N, 1008) softmax
    probabilities of the release net's TF-compatible fc head — the marginal
    the standard Inception-Score protocol is computed over (torch-fidelity
    uses this same FID-patched net + 1008-way head for IS)."""
    weights_path = weights_path or find_fid_weights()
    if weights_path is None:
        raise FileNotFoundError(
            f"FID InceptionV3 weights '{FID_WEIGHTS_FILENAME}' not found in "
            f"{_SEARCH_DIRS}. No network egress here — place the pytorch-fid "
            "release file in one of those directories."
        )
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    variables = convert_fid_weights(sd, include_head=True)
    model = InceptionV3(
        output_blocks=(3,), resize_input=True, normalize_input=False, include_head=True
    )

    @jax.jit
    def _probs(x):
        logits = model.apply(variables, x)[-1]
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def prob_fn(x):
        from .device_apply import apply_batched

        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return apply_batched(_probs, x, batch_size, mesh=mesh)

    return prob_fn


def find_fid_weights() -> Optional[str]:
    for d in _SEARCH_DIRS:
        cand = os.path.join(d, FID_WEIGHTS_FILENAME)
        if os.path.exists(cand):
            return cand
    return None


def load_fid_inception(weights_path: Optional[str] = None, batch_size: int = 128,
                       mesh=None):
    """Returns feature_fn: uint8/float (N, H, W, C) images → (N, 2048) f32.

    Input convention matches the reference metric stack: values are mapped to
    [-1, 1] by the caller's input_transform (eval.py:82) or assumed already
    normalized; grayscale is tiled to 3 channels. ``mesh`` shards each batch
    over the data axis (eval.py --dp).
    """
    weights_path = weights_path or find_fid_weights()
    if weights_path is None:
        raise FileNotFoundError(
            f"FID InceptionV3 weights '{FID_WEIGHTS_FILENAME}' not found in "
            f"{_SEARCH_DIRS}. No network egress here — place the pytorch-fid "
            "release file in one of those directories."
        )
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    variables = convert_fid_weights(sd)
    model = InceptionV3(output_blocks=(3,), resize_input=True, normalize_input=False)

    @jax.jit
    def _features(x):
        return model.apply(variables, x)[0][:, 0, 0, :]

    def feature_fn(x):
        from .device_apply import apply_batched

        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        return apply_batched(_features, x, batch_size, mesh=mesh)

    return feature_fn
