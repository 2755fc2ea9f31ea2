"""Round-5: re-probe the celeba sampler batch after the packed-attention and
head-padding rounds. B=32 was picked in r3 with the native-width folded
kernels (celeba_probe_r3b.py: 1.674 @ B=32 vs 1.588 @ B=64, monotone down);
the r5 kernels changed per-level rates (packed T=4096 fwd at 76 TF/s,
T=256 now packed via head padding), so the optimum may have moved. Probes
B in {32, 48, 64} with the exact bench sampler (jitted 256-step DDIM scan,
params as jit argument) in ONE chip session.

Run ON TPU: timeout 7200 python scripts/celeba_sampler_batch_probe_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), flush=True)
    import bench

    unet, diffusion = bench._celeba(on_tpu=True)
    model = unet(remat=False)
    res = 64
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, res, res, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]

    for B in (32, 48, 64):
        y = jnp.zeros((B, 40), jnp.float32)

        @jax.jit
        def sample(p, r, B=B, y=y):
            def denoise(xt, t, y_):
                return model.apply({"params": p}, xt, t, y_, train=False)
            return diffusion.p_sample(denoise, (B, res, res, 3), r, label=y,
                                      use_ddim=True)

        try:
            jax.device_get(sample(params, jax.random.key(1)))  # compile+warm
            t0 = time.perf_counter()
            for i in range(2):
                out = sample(params, jax.random.key(2 + i))
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / 2
            print(f"B={B}: {B / dt:6.3f} samples/s/chip  ({dt:.2f} s/traj)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM per batch size
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
