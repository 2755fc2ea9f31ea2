"""End-to-end learning test: a tiny model trained on a trivial distribution
(constant-color images) must produce samples near the data modes. This is the
CPU-runnable analogue of SURVEY §7 step 4's 'loss decreases, samples render'
milestone, with an actual sample-quality assertion."""

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

RES = 8
MODE = 0.5  # single constant-image mode — unimodal keeps the test robust


def test_training_learns_constant_images():
    model = UNet(
        in_channels=1, hid_channels=32, out_channels=1, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(False,), num_heads=1, drop_rate=0.0,
        num_classes=0, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=32,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.0, p_uncond=0.0,
    )
    opt = make_optimizer(lr=2e-3, warmup=20, grad_norm=1.0)
    step_fn = jax.jit(make_train_step(model, diffusion, opt, timesteps=0))

    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, RES, RES, 1)), jnp.zeros((1,)), None
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt.init(params), ema_params=None,
    )

    B = 32
    x = jnp.full((B, RES, RES, 1), MODE)

    first_loss = None
    for i in range(500):
        state, loss = step_fn(state, x, None, jax.random.fold_in(jax.random.key(1), i))
        if i == 0:
            first_loss = float(loss)
    final_loss = float(loss)
    assert final_loss < first_loss * 0.7, (first_loss, final_loss)

    @jax.jit
    def sample(r):
        def denoise_fn(x_t, t_, y_):
            return model.apply({"params": state.params}, x_t, t_, y_, train=False)

        return diffusion.p_sample(denoise_fn, (16, RES, RES, 1), r, use_ddim=True)

    out = np.asarray(sample(jax.random.key(2)))
    means = out.mean(axis=(1, 2, 3))
    stds = out.std(axis=(1, 2, 3))
    # samples should be near-constant images close to the data mode
    assert np.median(np.abs(means - MODE)) < 0.2, means
    assert np.median(stds) < 0.25, stds
