"""Quantify the training-attention share of the flagship train step on TPU
(VERDICT r1 #5: measure before building a flash backward kernel).

Ablation method: time the full jitted train step with (a) the real attention
blocks, (b) attention disabled (apply_attn all-False, other FLOPs identical).
The delta bounds everything attention-related in fwd+bwd (QKV/proj matmuls +
softmax chains + their gradients). Also times the bare attention op fwd/bwd
in XLA vs Pallas-fwd form at the UNet's shapes.

Run ON TPU:  python scripts/profile_train_attention.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step
from vdiff_tpu.utils.profiling import benchmark


def make_step(apply_attn, batch=128):
    model = UNet(
        in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
        num_res_blocks=3, apply_attn=apply_attn, drop_rate=0.2, num_heads=1,
        num_classes=10, use_flash=True, dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="v", model_var_type="fixed_medium", reweight_type="snr_trunc",
        loss_type="mse", intp_frac=0.3, w_guide=0.0, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=2e-4, warmup=5000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)))["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = jax.jit(make_train_step(model, diffusion, optimizer, timesteps=0,
                                   num_accum=1, use_cfg=True, use_ema=True))
    x = jax.random.uniform(jax.random.key(1), (batch, 32, 32, 3), jnp.float32, -1, 1)
    y = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

    def run(r):
        s, l = step(state, x, y, r)
        return l

    return run


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    B = 128

    with_attn = benchmark(make_step((False, True, True), B), jax.random.key(2), warmup=2, iters=10)
    no_attn = benchmark(make_step((False, False, False), B), jax.random.key(2), warmup=2, iters=10)
    t_w, t_n = with_attn["median"], no_attn["median"]
    print(f"train step WITH attention : {t_w*1e3:8.2f} ms  ({B/t_w:7.1f} img/s)")
    print(f"train step NO   attention : {t_n*1e3:8.2f} ms  ({B/t_n:7.1f} img/s)")
    print(f"attention share (fwd+bwd) : {(t_w-t_n)/t_w*100:5.1f}%  ({(t_w-t_n)*1e3:.2f} ms)")

    # bare op, UNet shapes: two attn stages at 16x16 (T=256) and 8x8 (T=64),
    # N=1 head, C=256, batch 128 — fwd and fwd+bwd through the XLA path
    from vdiff_tpu.ops.attention import _xla_attention, spatial_attention

    for T in (256, 64):
        q = jax.random.normal(jax.random.key(3), (B, T, 1, 256), jnp.bfloat16)

        fwd = jax.jit(lambda q: _xla_attention(q, q, q))
        r = benchmark(fwd, q, warmup=2, iters=10)
        print(f"T={T:4d} XLA attn fwd       : {r['median']*1e6:9.1f} us")

        grad = jax.jit(jax.grad(lambda q: _xla_attention(q, q, q).astype(jnp.float32).sum()))
        r = benchmark(grad, q, warmup=2, iters=10)
        print(f"T={T:4d} XLA attn fwd+bwd   : {r['median']*1e6:9.1f} us")

        flash = jax.jit(lambda q: spatial_attention(q, q, q, use_flash=True))
        r = benchmark(flash, q, warmup=2, iters=10)
        print(f"T={T:4d} flash(fwd dispatch): {r['median']*1e6:9.1f} us")


if __name__ == "__main__":
    main()
