"""CelebA-scale on-chip probe (round 3): the sampling leg that round 2 never
executed, plus the numbers needed to pin celeba bench baselines.

Stages (each prints a line; rerun safe — retry through tunnel flakes):
  1. forward cost analysis → exact model GFLOPs/forward (baseline estimate)
  2. short DDIM sample (8 steps) at B=32 — first-ever celeba inference on chip
  3. 256-step DDIM sampling timed via scan (scan IS the sampler) at B=32
  4. train step timed via K-step donated scan at B=32 with remat (as round 2)

Run ON TPU: timeout 3000 python scripts/celeba_probe_tpu.py
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
    B = 32
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    model, diffusion = build(remat=False)
    rng = jax.random.key(0)
    x1 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    y1 = jnp.zeros((1, 40), jnp.float32)
    t0 = time.time()
    variables = model.init({"params": rng, "dropout": rng}, x1, jnp.zeros((1,)), y1)
    params = variables["params"]
    print(f"init done in {time.time()-t0:.0f}s; params = "
          f"{sum(p.size for p in jax.tree.leaves(params))/1e6:.2f}M", flush=True)

    # --- stage 1: forward FLOPs -------------------------------------------
    def fwd(p, xt, t, y):
        return model.apply({"params": p}, xt, t, y, train=False)

    xB = jnp.zeros((B, 64, 64, 3), jnp.float32)
    tB = jnp.full((B,), 0.5, jnp.float32)
    yB = jnp.zeros((B, 40), jnp.float32)
    try:
        lowered = jax.jit(fwd).lower(params, xB, tB, yB)
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", float("nan"))
        print(json.dumps({"stage": "cost", "gflops_fwd_total_B": flops / 1e9,
                          "gflops_per_image": flops / 1e9 / B}), flush=True)
    except Exception as e:
        print(f"cost analysis failed: {e}", flush=True)

    # --- stage 2: short DDIM sample (first celeba inference on chip) ------
    # params must be a jit ARGUMENT: closed-over they embed as constants in
    # the serialized program and 301M f32 params blow the axon tunnel's
    # remote_compile request limit (HTTP 413)
    import dataclasses
    short = dataclasses.replace(diffusion, sample_timesteps=8)

    def sample(d, p, r):
        return d.p_sample(lambda xt, t, y: fwd(p, xt, t, y),
                          (B, 64, 64, 3), r, label=yB, use_ddim=True)

    t0 = time.time()
    f8 = jax.jit(lambda p, r: sample(short, p, r))
    out = jax.device_get(f8(params, jax.random.key(1)))
    print(json.dumps({"stage": "short_sample", "compile_plus_run_s": round(time.time()-t0, 1),
                      "finite": bool(jnp.isfinite(out).all()), "shape": list(out.shape)}), flush=True)

    # --- stage 3: 256-step DDIM timed (B=32 and B=64) ----------------------
    for Bs in (B, 2 * B):
        yS = jnp.zeros((Bs, 40), jnp.float32)

        def sampleB(d, p, r, yS=yS, Bs=Bs):
            return d.p_sample(lambda xt, t, y: fwd(p, xt, t, y),
                              (Bs, 64, 64, 3), r, label=yS, use_ddim=True)

        f256 = jax.jit(lambda p, r: sampleB(diffusion, p, r))
        jax.device_get(f256(params, jax.random.key(2)))  # compile + warmup
        t0 = time.perf_counter()
        out = f256(params, jax.random.key(3))
        jax.device_get(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": f"ddim256_B{Bs}", "sec": round(dt, 2),
                          "samples_per_sec_per_chip": round(Bs / dt / jax.device_count(), 3)}), flush=True)
        del f256, out

    # --- stage 4: train step (remat) --------------------------------------
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    model_r, diffusion_r = build(remat=True)
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step_fn = make_train_step(model_r, diffusion_r, optimizer, timesteps=0,
                              num_accum=1, use_cfg=True, use_ema=True)
    xT = jax.random.uniform(jax.random.key(4), (B, 64, 64, 3), jnp.float32, -1, 1)
    yT = (jax.random.uniform(jax.random.key(5), (B, 40)) < 0.5).astype(jnp.float32)

    def scan_steps(n):
        # donate the 4.8 GB TrainState: without donation input+output states
        # coexist and the 301M run OOMs (params+m+v+ema ≈ 4.8 GB each side)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(st, r):
            def body(s, k):
                s, loss = step_fn(s, xT, yT, k)
                return s, loss
            return jax.lax.scan(body, st, jax.random.split(r, n))
        return f

    f8 = scan_steps(8)
    st, losses = f8(state, jax.random.key(6))
    jax.device_get(losses)
    t0 = time.perf_counter()
    st, losses = f8(st, jax.random.key(7))
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / 8
    print(json.dumps({"stage": "train_remat", "ms_per_step": round(dt * 1e3, 1),
                      "img_per_sec_per_chip": round(B / dt / jax.device_count(), 1),
                      "loss_finite": bool(jnp.isfinite(jax.device_get(losses)).all())}), flush=True)


if __name__ == "__main__":
    main()
