"""UNet parity tests: parameter count + forward outputs vs the torch reference
with converted weights (SURVEY.md §7 build step 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vdiff_tpu.models.unet import UNet
from vdiff_tpu.models.convert import torch_unet_to_flax
from tests.ref_loader import load

ref_unet = load("models.unet")


def _count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


SMALL = dict(
    in_channels=3,
    hid_channels=64,
    out_channels=3,
    ch_multipliers=(1, 2),
    num_res_blocks=2,
    apply_attn=(False, True),
    drop_rate=0.0,
    num_heads=2,
)


def _perturb_zero_init(tm):
    """Fill zero-initialized output projections with noise — otherwise the
    zero-init out_conv makes the whole forward identically zero and the parity
    comparison vacuous."""
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim >= 2 and float(p.abs().max()) == 0.0:
                p.normal_(0.0, 0.05)
    return tm


def _build_pair(num_classes=0, multitags=False, **overrides):
    cfg = dict(SMALL, **overrides)
    torch.manual_seed(0)
    tm = _perturb_zero_init(ref_unet.UNet(num_classes=num_classes, multitags=multitags, **cfg))
    tm.eval()
    jm = UNet(num_classes=num_classes, multitags=multitags, use_flash=False, **cfg)
    params = torch_unet_to_flax(tm.state_dict(), jm)
    return tm, jm, {"params": params}


def _forward_pair(tm, jm, variables, B=2, res=16, num_classes=0, multitags=False):
    rng = np.random.RandomState(0)
    x = rng.randn(B, res, res, SMALL["in_channels"]).astype(np.float32)
    t = rng.rand(B).astype(np.float32)
    if multitags:
        y = (rng.rand(B, num_classes) > 0.5).astype(np.float32)
        ty = torch.as_tensor(y)
        jy = jnp.asarray(y)
    elif num_classes:
        y = rng.randint(0, num_classes + 1, (B,))
        ty = torch.as_tensor(y)
        jy = jnp.asarray(y.astype(np.float32))
    else:
        ty = jy = None
    with torch.inference_mode():
        ref = tm(torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(t), ty)
    ours = jm.apply(variables, jnp.asarray(x), jnp.asarray(t), jy)
    return np.asarray(ours), ref.permute(0, 2, 3, 1).numpy()


def test_param_count_matches_reference():
    tm, jm, variables = _build_pair()
    n_torch = sum(p.numel() for p in tm.parameters())
    assert _count_params(variables["params"]) == n_torch


def test_forward_matches_reference_uncond():
    tm, jm, variables = _build_pair()
    ours, ref = _forward_pair(tm, jm, variables)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_forward_matches_reference_class_cond():
    tm, jm, variables = _build_pair(num_classes=10)
    ours, ref = _forward_pair(tm, jm, variables, num_classes=10)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_forward_matches_reference_multitags():
    tm, jm, variables = _build_pair(num_classes=8, multitags=True)
    ours, ref = _forward_pair(tm, jm, variables, num_classes=8, multitags=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_forward_three_levels_param_count():
    """The README cifar10 shape: 3 levels, attn (F, T, T), head via num_heads=1."""
    cfg = dict(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1, 1, 1), num_res_blocks=3,
        apply_attn=(False, True, True), num_heads=1, drop_rate=0.0,
    )
    tm = _perturb_zero_init(ref_unet.UNet(**cfg))
    jm = UNet(use_flash=False, **cfg)
    params = torch_unet_to_flax(tm.state_dict(), jm)
    assert _count_params(params) == sum(p.numel() for p in tm.parameters())
    tm.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    t = rng.rand(2).astype(np.float32)
    with torch.inference_mode():
        ref = tm(torch.as_tensor(x).permute(0, 3, 1, 2), torch.as_tensor(t))
    ours = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4)


def test_head_dim_attention_variant():
    tm, jm, variables = _build_pair(num_heads=None, head_dim=32)
    ours, ref = _forward_pair(tm, jm, variables)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_concat_free_up_path_matches_concat():
    """The split (concat-free) up-path front must equal running the block on
    an explicit channel concat — same params, same math (GN groups never
    straddle the seam; conv over a concat is the sum of per-part convs)."""
    import numpy as np

    from vdiff_tpu.models.unet import ResidualBlock

    B, H, W, C1, C2, CO = 2, 8, 8, 64, 64, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C1), jnp.float32)
    s = jnp.asarray(rng.randn(B, H, W, C2), jnp.float32)
    t_emb = jnp.asarray(rng.randn(B, 32), jnp.float32)

    block = ResidualBlock(CO, drop_rate=0.0)
    assert block._split_ok(C1, C2)
    params = block.init(jax.random.key(0), x, t_emb, skip_in=s)["params"]

    split_out = block.apply({"params": params}, x, t_emb, skip_in=s)
    # same params applied to the explicit concat (split gate off: skip_in=None)
    concat_out = block.apply(
        {"params": params}, jnp.concatenate([x, s], axis=-1), t_emb
    )
    np.testing.assert_allclose(
        np.asarray(split_out), np.asarray(concat_out), rtol=2e-5, atol=2e-5
    )

    # parameter tree must be identical to the concat form (checkpoint compat)
    concat_params = block.init(
        jax.random.key(0), jnp.concatenate([x, s], axis=-1), t_emb
    )["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(concat_params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(concat_params)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


import pytest


@pytest.mark.parametrize("policy", [None, "conv"])
def test_remat_same_outputs_and_grads(policy):
    """remat=True (gradient checkpointing) must be a pure memory/FLOP trade:
    identical forward outputs and parameter gradients. remat_policy="conv"
    (selective: conv/matmul outputs saved, elementwise chains recomputed)
    must be numerics-identical too — incl. dropout, whose mask re-derivation
    in the backward must consume the same rng (drop_rate>0 covers it)."""
    import numpy as np

    from vdiff_tpu.models.unet import UNet

    kw = dict(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), num_heads=1,
        num_classes=0, use_flash=False,
        drop_rate=0.0 if policy is None else 0.3,
    )
    base = UNet(**kw)
    ckpt = UNet(**kw, remat=True, remat_policy=policy)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    params = base.init({"params": jax.random.key(0)}, x, t, None)["params"]

    # identical param tree (remat is a lifted transform, names unchanged)
    p2 = ckpt.init({"params": jax.random.key(0)}, x, t, None)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x, t, None, train=True,
                               rngs={"dropout": jax.random.key(1)}) ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(ckpt, p))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_celeba_config_param_count_parity():
    """celeba.json model config: 301.38M params, exactly matching the torch
    reference (the largest config; pins the full 4-level/multitag/head_dim
    surface without running a forward)."""
    import numpy as np

    import ref_loader
    from vdiff_tpu.models.unet import UNet

    kw = dict(in_channels=3, hid_channels=192, out_channels=6,
              num_res_blocks=3, embedding_dim=768, drop_rate=0.1,
              head_dim=64, num_classes=40, multitags=True)
    tm = ref_loader.load("models.unet").UNet(
        ch_multipliers=[1, 2, 3, 4], apply_attn=[False, True, True, True], **kw
    )
    n_torch = sum(p.numel() for p in tm.parameters())

    fm = UNet(ch_multipliers=(1, 2, 3, 4), apply_attn=(False, True, True, True),
              use_flash=False, **kw)
    params = fm.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_flax == n_torch, (n_flax, n_torch)  # 301.38M


@pytest.mark.parametrize("mode", ["valid", "same"])
@pytest.mark.parametrize("kernel_size,stride", [(3, 1), (3, 2), (5, 2), ((3, 5), (1, 2))])
def test_pad_2d_parity(mode, kernel_size, stride):
    """valid_pad_2d/same_pad_2d match the reference ValidPad2d/SamePad2d
    (modules.py:147-181) on NHWC↔NCHW-transposed inputs."""
    from tests.ref_loader import load
    from vdiff_tpu.models.layers import same_pad_2d, valid_pad_2d

    modules = load("modules")
    cls = modules.ValidPad2d if mode == "valid" else modules.SamePad2d
    fn = valid_pad_2d if mode == "valid" else same_pad_2d

    rng = np.random.RandomState(0)
    x = rng.randn(2, 13, 9, 4).astype(np.float32)  # odd sizes exercise padding
    ref = cls(kernel_size, stride)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = fn(jnp.asarray(x), kernel_size, stride)
    np.testing.assert_array_equal(
        np.asarray(got), ref.numpy().transpose(0, 2, 3, 1)
    )


def test_efficient_dropout_semantics():
    """uint16-threshold dropout: exact inverse-keep scaling (E[out] == x),
    realized drop rate within 2^-16 + sampling error of nominal, zero-rate
    and deterministic modes are identity."""
    from vdiff_tpu.models.layers import EfficientDropout

    x = jnp.ones((64, 64), jnp.float32)
    rate = 0.2
    mod = EfficientDropout(rate, deterministic=False)
    out = mod.apply({}, x, rngs={"dropout": jax.random.key(0)})
    out = np.asarray(out)
    kept = out != 0
    # survivors are exactly x / keep_prob with keep_prob = 1 - round(r*2^16)/2^16
    keep_prob = 1.0 - round(rate * 65536) / 65536
    np.testing.assert_allclose(out[kept], 1.0 / keep_prob, rtol=1e-6)
    # realized drop rate within 4 sigma of nominal
    p_hat = 1.0 - kept.mean()
    sigma = np.sqrt(rate * (1 - rate) / x.size)
    assert abs(p_hat - rate) < 4 * sigma, (p_hat, rate)
    # mean preservation
    np.testing.assert_allclose(out.mean(), 1.0, atol=5 * sigma / keep_prob)
    # identity modes
    det = EfficientDropout(rate, deterministic=True).apply({}, x)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(x))
    zero = EfficientDropout(0.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.key(1)}
    )
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(x))
    # rate=1 drops everything (nn.Dropout semantics; regression: uint16
    # threshold wrapped to 0 / inverse-keep divided by zero)
    ones = EfficientDropout(1.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.key(2)}
    )
    np.testing.assert_array_equal(np.asarray(ones), np.zeros_like(np.asarray(x)))
