"""Tensor-parallel and spatially-partitioned inference (beyond-parity: the
reference forward is strictly single-device). On the 8-device CPU mesh:
TP-sharded params and height-sharded activations must reproduce the
single-device forward/sampler numerics while actually distributing the
storage/compute."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.parallel.fsdp import state_bytes_per_device
from vdiff_tpu.parallel.spatial import spatial_constraint, spatial_sharding
from vdiff_tpu.parallel.tp import (
    create_tp_mesh,
    tp_param_shardings,
    tp_shard_params,
)

RES = 16


def test_tp_param_sharding_rules():
    mesh = create_tp_mesh()
    sh = tp_param_shardings(mesh, {
        "conv_kernel": jnp.zeros((3, 3, 32, 32)),   # 9216 elems, O=32 % 8 == 0
        "dense_kernel": jnp.zeros((128, 128)),
        "bias": jnp.zeros((128,)),                  # rank-1 -> replicated
        "odd_out": jnp.zeros((3, 3, 64, 12)),       # 12 % 8 != 0 -> replicated
        "tiny": jnp.zeros((8, 8)),                  # below min_size -> replicated
    })
    assert sh["conv_kernel"].spec == P(None, None, None, "model")
    assert sh["dense_kernel"].spec == P(None, "model")
    assert sh["bias"].spec == P()
    assert sh["odd_out"].spec == P()
    assert sh["tiny"].spec == P()


@functools.lru_cache(maxsize=None)
def _model_and_params():
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), num_heads=2, drop_rate=0.0,
        num_classes=10, use_flash=False,
    )
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]
    return model, params


def _inputs(b=2):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, RES, RES, 3).astype(np.float32))
    t = jnp.linspace(0.2, 0.8, b)
    y = jnp.asarray(rng.randint(1, 11, (b,)).astype(np.float32))
    return x, t, y


def test_tp_forward_matches_single_device():
    """Batch replicated + kernels O-sharded: same outputs, ~1/8 param bytes."""
    assert jax.device_count() >= 8
    model, params = _model_and_params()
    x, t, y = _inputs()

    fwd = jax.jit(lambda p, x, t, y: model.apply({"params": p}, x, t, y, train=False))
    gold = np.asarray(fwd(params, x, t, y))

    mesh = create_tp_mesh()
    params_tp = tp_shard_params(mesh, params)
    total = sum(np.asarray(l).nbytes for l in jax.tree.leaves(jax.device_get(params)))
    assert state_bytes_per_device(params_tp) < 0.5 * total

    out = np.asarray(fwd(params_tp, x, t, y))
    np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)


def _diffusion():
    return GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=4, model_out_type="eps", model_var_type="fixed_large",
        reweight_type="snr", loss_type="mse", w_guide=0.3, p_uncond=0.1,
    )


def test_tp_sampling_matches_single_device():
    """A full DDIM trajectory (CFG doubling included) with TP params equals
    the single-device trajectory."""
    model, params = _model_and_params()
    diffusion = _diffusion()
    _, _, y = _inputs(4)
    key = jax.random.key(3)

    def make_sampler(p):
        def denoise_fn(x_t, t_, y_):
            return model.apply({"params": p}, x_t, t_, y_, train=False)

        return jax.jit(lambda r: diffusion.p_sample(
            denoise_fn, (4, RES, RES, 3), r, label=y, use_ddim=True))

    gold = np.asarray(make_sampler(params)(key))
    mesh = create_tp_mesh()
    out = np.asarray(make_sampler(tp_shard_params(mesh, params))(key))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)


def test_spatial_sharded_sampling_matches_single_device():
    """Height-sharded activations (XLA halo-exchange convs, psum'd GN stats,
    gathered attention): the sampled trajectory is unchanged."""
    model, params = _model_and_params()
    diffusion = _diffusion()
    _, _, y = _inputs(2)
    key = jax.random.key(5)
    mesh = create_tp_mesh()
    assert spatial_sharding(mesh).spec == P(None, "model", None, None)

    def make_sampler(constrain):
        def denoise_fn(x_t, t_, y_):
            if constrain:
                x_t = spatial_constraint(x_t, mesh)
            return model.apply({"params": params}, x_t, t_, y_, train=False)

        return jax.jit(lambda r: diffusion.p_sample(
            denoise_fn, (2, RES, RES, 3), r, label=y, use_ddim=True))

    gold = np.asarray(make_sampler(False)(key))
    out = np.asarray(make_sampler(True)(key))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, gold, rtol=1e-5, atol=1e-5)
