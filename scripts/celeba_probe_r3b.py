"""CelebA-scale re-measurement after the native-width sub-lane attention
kernels landed (inference ef69c68, training 8763dbe): the bench.py batch
optima and absolute numbers were measured on the zero-padded kernels and may
have shifted.

Stages (each prints a JSON line; rerun safe — retry through tunnel flakes):
  1. 256-step DDIM sampling timed via the jitted scan at B=32 and B=64
  2. remat train step timed via 8-step donated scan at B=32 and B=64
     (native-width attention halves the attention working set — a larger
     batch may now fit and win)

Run ON TPU: timeout 4000 python scripts/celeba_probe_r3b.py
"""

import sys, os, time, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def build(remat: bool):
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule

    model = UNet(
        in_channels=3, hid_channels=192, out_channels=6,  # 'both' head
        ch_multipliers=(1, 2, 3, 4), num_res_blocks=3,
        apply_attn=(False, True, True, True), embedding_dim=768,
        drop_rate=0.1, head_dim=64, num_classes=40, multitags=True,
        use_flash=True, dtype=jnp.bfloat16, remat=remat,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="both", model_var_type="fixed_large",
        reweight_type="snr_trunc", loss_type="mse", w_guide=0.0, p_uncond=0.1,
    )
    return model, diffusion


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    model, diffusion = build(remat=False)
    rng = jax.random.key(0)
    t0 = time.time()
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3), jnp.float32), jnp.zeros((1,)),
        jnp.zeros((1, 40), jnp.float32),
    )["params"]
    print(f"init done in {time.time()-t0:.0f}s", flush=True)

    def fwd(p, xt, t, y):
        return model.apply({"params": p}, xt, t, y, train=False)

    # --- stage 1: 256-step DDIM timed (B=32 and B=64) ----------------------
    for Bs in (32, 64):
        yS = jnp.zeros((Bs, 40), jnp.float32)

        def sampleB(p, r, yS=yS, Bs=Bs):
            return diffusion.p_sample(lambda xt, t, y: fwd(p, xt, t, y),
                                      (Bs, 64, 64, 3), r, label=yS, use_ddim=True)

        f256 = jax.jit(sampleB)
        jax.device_get(f256(params, jax.random.key(2)))  # compile + warmup
        t0 = time.perf_counter()
        out = f256(params, jax.random.key(3))
        jax.device_get(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": f"ddim256_B{Bs}", "sec": round(dt, 2),
                          "samples_per_sec_per_chip": round(Bs / dt / jax.device_count(), 3)}), flush=True)
        del f256, out

    # --- stage 2: train step (remat), B sweep ------------------------------
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    model_r, diffusion_r = build(remat=True)
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    step_fn = make_train_step(model_r, diffusion_r, optimizer, timesteps=0,
                              num_accum=1, use_cfg=True, use_ema=True)

    for B in (32, 64):
        try:
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=optimizer.init(params),
                               ema_params=jax.tree.map(jnp.copy, params))
            xT = jax.random.uniform(jax.random.key(4), (B, 64, 64, 3), jnp.float32, -1, 1)
            yT = (jax.random.uniform(jax.random.key(5), (B, 40)) < 0.5).astype(jnp.float32)

            # donate the 4.8 GB TrainState (input+output coexisting OOMs)
            @functools.partial(jax.jit, donate_argnums=(0,))
            def f8(st, r, xT=xT, yT=yT):
                def body(s, k):
                    s, loss = step_fn(s, xT, yT, k)
                    return s, loss
                return jax.lax.scan(body, st, jax.random.split(r, 8))

            st, losses = f8(state, jax.random.key(6))
            jax.device_get(losses)
            t0 = time.perf_counter()
            st, losses = f8(st, jax.random.key(7))
            jax.device_get(losses)
            dt = (time.perf_counter() - t0) / 8
            print(json.dumps({"stage": f"train_remat_B{B}", "ms_per_step": round(dt * 1e3, 1),
                              "img_per_sec_per_chip": round(B / dt / jax.device_count(), 1),
                              "loss_finite": bool(jnp.isfinite(jax.device_get(losses)).all())}), flush=True)
            del st, losses, state
        except Exception as e:
            print(json.dumps({"stage": f"train_remat_B{B}", "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
