"""CelebA-flagship-shape smoke on the real chip: one jitted train step
(celeba.json model: 64x64, hid=192, ch_mult (1,2,3,4), head_dim=64 → padded
sub-lane flash kernels; attention at levels 1-3, max T = 64·64 = 4096 at the
up_1 resample block, which upsamples inside the ResidualBlock and THEN
attends — reference unet.py:278,243) + a short DDIM sample.

This script exists to prove the padded-head flash path keeps the 301M-param
celeba training run on one chip (together with remat).

Run ON TPU: python scripts/smoke_celeba_tpu.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    B = 32
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    model = UNet(
        in_channels=3, hid_channels=192, out_channels=6,  # 'both' head: 2x3
        ch_multipliers=(1, 2, 3, 4), num_res_blocks=3,
        apply_attn=(False, True, True, True), embedding_dim=768,
        drop_rate=0.1, head_dim=64, num_classes=40, multitags=True,
        use_flash=True, dtype=jnp.bfloat16, remat=True,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=8,
        model_out_type="both", model_var_type="fixed_large",
        reweight_type="snr_trunc", loss_type="mse", w_guide=0.1, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    rng = jax.random.key(0)
    y0 = jnp.zeros((1, 40), jnp.float32)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), y0)["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1,
                           use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, 64, 64, 3), jnp.float32, -1, 1)
    y = (jax.random.uniform(jax.random.key(2), (B, 40)) > 0.5).astype(jnp.float32)

    def make_steps(K):
        def steps(state, r):
            def body(st, k):
                st, loss = step(st, x, y, k)
                return st, loss
            return jax.lax.scan(body, state, jax.random.split(r, K))
        # donate: two live 4.8 GB TrainStates OOM the chip at this scale
        return jax.jit(steps, donate_argnums=(0,))

    steps4, steps12 = make_steps(4), make_steps(12)

    def run_timed(fn, state, key):
        # device_get forces real completion (the tunnel's block_until_ready
        # alone has been observed returning early)
        t0 = time.perf_counter()
        state, losses = fn(state, key)
        losses = jax.device_get(losses)
        return time.perf_counter() - t0, state, losses

    _, state, _ = run_timed(steps4, state, jax.random.key(3))   # compile K=4
    t4, state, l4 = run_timed(steps4, state, jax.random.key(4))
    _, state, _ = run_timed(steps12, state, jax.random.key(5))  # compile K=12
    t12, state, l12 = run_timed(steps12, state, jax.random.key(6))
    dt = (t12 - t4) / 8  # Δ between scan lengths cancels constant overheads
    print(f"train step: {dt*1e3:.1f} ms at B={B} -> {B/dt:.1f} img/s/chip "
          f"(delta of 12- vs 4-step scans); losses finite: "
          f"{bool(jnp.isfinite(l12).all() and jnp.isfinite(l4).all())}", flush=True)

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": state.ema_params}, x_t, t_, y_, train=False)

    sample = jax.jit(lambda r: diffusion.p_sample(
        denoise_fn, (8, 64, 64, 3), r, label=y[:8], use_ddim=True))(jax.random.key(5))
    jax.block_until_ready(sample)
    print(f"8-step DDIM sample ok: {sample.shape}, finite={bool(jnp.isfinite(sample).all())}",
          flush=True)


if __name__ == "__main__":
    main()
