"""Headline benchmark: CIFAR-10 samples/sec/chip at 256-step DDIM.

Runs the flagship conditional UNet (cifar10_cond.json shapes: hid=256,
ch_mult [1,1,1], 3 res blocks, attn (F,T,T)) through the full jitted
lax.scan DDIM sampler (CFG disabled at w=0, matching the FID-2.58 headline
condition) and reports throughput.

``vs_baseline``: the reference publishes no throughput numbers (SURVEY.md §6),
so the baseline is a documented engineering estimate of the torch reference on
an A100 at fp32 (its shipped config: allow_tf32=false): ~32 GFLOPs/UNet-forward
× 256 steps ≈ 8.2 TFLOPs/sample; at ~35% fp32 utilization (6.8 TF/s) →
≈ 0.83 samples/s. We use BASELINE_SAMPLES_PER_SEC = 0.83.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 0.83  # torch reference, A100 fp32 estimate (see docstring)


def main():
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule

    on_tpu = jax.default_backend() == "tpu"
    batch = 128 if on_tpu else 4
    steps = 256 if on_tpu else 4
    hid = 256 if on_tpu else 32

    model = UNet(
        in_channels=3,
        hid_channels=hid,
        out_channels=3,
        ch_multipliers=(1, 1, 1),
        num_res_blocks=3,
        apply_attn=(False, True, True),
        drop_rate=0.0,
        num_heads=1,
        num_classes=10,
        use_flash=on_tpu,
        dtype=jnp.bfloat16 if on_tpu else None,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=steps,
        model_out_type="v",
        model_var_type="fixed_medium",
        reweight_type="snr_trunc",
        loss_type="mse",
        intp_frac=0.3,
        w_guide=0.0,  # headline FID 2.58 condition (w=0): no CFG doubling
        p_uncond=0.1,
    )

    rng = jax.random.key(0)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init({"params": rng, "dropout": rng}, x, jnp.zeros((1,)), jnp.zeros((1,)))[
        "params"
    ]

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": params}, x_t, t_, y_, train=False)

    labels = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

    @jax.jit
    def sample(r):
        return diffusion.p_sample(
            denoise_fn, (batch, 32, 32, 3), r, label=labels, use_ddim=True
        )

    # compile + warmup
    jax.block_until_ready(sample(jax.random.key(1)))

    n_runs = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = sample(jax.random.key(2 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_runs

    n_chips = jax.device_count()
    samples_per_sec_chip = batch / dt / n_chips
    value = round(samples_per_sec_chip, 3)
    print(
        json.dumps(
            {
                "metric": "cifar10_samples_per_sec_per_chip_ddim256",
                "value": value,
                "unit": "samples/s/chip",
                "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
