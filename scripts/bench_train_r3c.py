"""Round-3 final train candidate: bf16 loss/target math.

VERDICT #4 listed "bf16 loss/target math" as a candidate; rounds measured
uint16 dropout (+1.8%), B=192 (+2%), bf16 GN-backward storage (+1.8%) but
never this one. The diffusion-loss tensor math outside the model (q_sample
mix, v-target construction, residual square) runs f32 today because x/noise
are f32; the elementwise loop fusions it lands in run at/near HBM SOL
(RUNLOG_TPU.md) — halving their traffic is the hypothesis. Probe by feeding
the train step a bf16 batch (noise inherits x.dtype in micro_loss; the f32
schedule-table scalars promote some ops back — this measures the honest
achievable version, not a rewrite).

Run ON TPU: timeout 4500 python scripts/bench_train_r3c.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def run_variant(name, batch, x_dtype, n_steps=20):
    import optax

    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule
    from vdiff_tpu.train_lib import TrainState, make_train_step

    model = UNet(
        in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
        num_res_blocks=3, apply_attn=(False, True, True), drop_rate=0.2,
        num_heads=1, num_classes=10, use_flash=True, dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="v", model_var_type="fixed_medium", reweight_type="snr_trunc",
        loss_type="mse", intp_frac=0.3, w_guide=0.0, p_uncond=0.1,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lambda t: 2e-4 * jnp.minimum((t + 1.0) / 5000, 1.0),
                    b1=0.9, b2=0.999, weight_decay=0.0),
    )
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)))["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step_fn = make_train_step(model, diffusion, tx, timesteps=0, num_accum=1,
                              use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (batch, 32, 32, 3), jnp.float32, -1, 1)
    x = x.astype(x_dtype)
    y = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

    @jax.jit
    def scan_steps(st, r):
        def body(s, k):
            s, loss = step_fn(s, x, y, k)
            return s, loss
        return jax.lax.scan(body, st, jax.random.split(r, n_steps))

    st, losses = scan_steps(state, jax.random.key(2))
    jax.device_get(losses)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        st, losses = scan_steps(st, jax.random.key(3 + i))
        jax.device_get(losses)
        ts.append((time.perf_counter() - t0) / n_steps)
    dt = sorted(ts)[1]
    print(f"{name:26s} B={batch:3d}  {dt*1e3:7.2f} ms/step  "
          f"{batch/dt:8.1f} img/s/chip  loss={float(jax.device_get(losses)[-1]):.4f}",
          flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_variant("base f32 batch", 192, jnp.float32)
    run_variant("bf16 batch/loss math", 192, jnp.bfloat16)


if __name__ == "__main__":
    main()
