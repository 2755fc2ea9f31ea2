"""Round-3 train-step experiments toward ≥1250 img/s/chip (from 1150.7).

Profiled residue (RUNLOG r2): convs 76.5% (some HBM-bound wgrads), loop
fusions ~12%, AdamW+EMA ~2.2 ms (HBM SOL), RNG 1.7%. Levers probed here:
  E1  batch size: B ∈ {128, 192, 256} — amortize fixed per-step work
  E2  bf16 Adam first moment (optax mu_dtype) — cuts optimizer HBM traffic
  E3  dropout off comparison — bounds what mask generation+apply still costs

Each variant is timed as K steps chained in ONE jitted lax.scan with
device_get sync (python-loop timing lies through the axon tunnel).

Run ON TPU: timeout 4500 python scripts/bench_train_r3.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_default_prng_impl", "rbg")


def flagship(drop_rate=0.2):
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule

    model = UNet(
        in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
        num_res_blocks=3, apply_attn=(False, True, True), drop_rate=drop_rate,
        num_heads=1, num_classes=10, use_flash=True, dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="v", model_var_type="fixed_medium", reweight_type="snr_trunc",
        loss_type="mse", intp_frac=0.3, w_guide=0.0, p_uncond=0.1,
    )
    return model, diffusion


def run_variant(name, batch, mu_dtype=None, drop_rate=0.2, n_steps=20):
    from vdiff_tpu.train_lib import TrainState, make_train_step

    model, diffusion = flagship(drop_rate)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lambda t: 2e-4 * jnp.minimum((t + 1.0) / 5000, 1.0),
                    b1=0.9, b2=0.999, weight_decay=0.0, mu_dtype=mu_dtype),
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
    print(f"{name:28s} B={batch:3d}  {dt*1e3:7.2f} ms/step  "
          f"{batch/dt:8.1f} img/s/chip  loss={float(jax.device_get(losses)[-1]):.4f}",
          flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_variant("base", 128)
    run_variant("B=192", 192)
    run_variant("B=256", 256)
    run_variant("mu_dtype=bf16", 128, mu_dtype=jnp.bfloat16)
    run_variant("dropout off (bound)", 128, drop_rate=0.0)


if __name__ == "__main__":
    main()
