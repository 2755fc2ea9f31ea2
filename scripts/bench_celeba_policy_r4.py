"""Round-4 celeba train-step attack: does selective remat (`remat_policy=
"conv"` — conv outputs saved, elementwise recomputed; +0.6% executed FLOPs vs
full per-block remat's +25.2%, RUNLOG round-4 entry) fit on one v5e at B=32,
and how much wall-clock does it buy over full remat (86.8 img/s, BENCH_r03)?

Tries (mode, B) combos in order; OOM on one combo moves on to the next.

Run ON TPU: timeout 4000 python scripts/bench_celeba_policy_r4.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

N_STEPS = 6


def celeba_unet(remat, remat_policy):
    return UNet(
        in_channels=3, hid_channels=192, out_channels=6,
        ch_multipliers=(1, 2, 3, 4), num_res_blocks=3,
        apply_attn=(False, True, True, True), embedding_dim=768,
        drop_rate=0.1, head_dim=64, num_classes=40, multitags=True,
        use_flash=True, dtype=jnp.bfloat16, remat=remat,
        remat_policy=remat_policy,
    )


def bench_one(remat, policy, B):
    label = f"remat={remat} policy={policy} B={B}"
    model = celeba_unet(remat, policy)
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="both", model_var_type="fixed_large",
        reweight_type="snr_trunc", loss_type="mse", w_guide=0.0, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(model, diffusion, optimizer, timesteps=0,
                           num_accum=1, use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, 64, 64, 3), jnp.float32, -1, 1)
    y = (jax.random.uniform(jax.random.key(2), (B, 40)) < 0.5).astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_steps(st, r):
        def body(s, k):
            s, loss = step(s, x, y, k)
            return s, loss
        return jax.lax.scan(body, st, jax.random.split(r, N_STEPS))

    try:
        state, losses = scan_steps(state, jax.random.key(3))
        jax.device_get(losses)
        t0 = time.perf_counter()
        state, losses = scan_steps(state, jax.random.key(4))
        jax.device_get(losses)
        dt = (time.perf_counter() - t0) / N_STEPS
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{label}: FAILED ({msg})", flush=True)
        return
    print(f"{label}: {dt*1e3:8.1f} ms/step  {B/dt:7.1f} img/s/chip", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for remat, policy, B in [
        (True, "conv", 32),   # the candidate
        (True, None, 32),     # the r3 baseline (expect ~369 ms)
        (True, "conv", 64),   # if conv-policy freed enough memory
        (False, None, 32),    # no remat at all — r2 said OOM; re-verify
    ]:
        bench_one(remat, policy, B)


if __name__ == "__main__":
    main()
