"""Trace the celeba.json-scale DDIM sampler on TPU (round-3: it runs at
~65 TF/s model rate vs the cifar sampler's ~170 — find out where the time
goes before accepting that as final).

Run ON TPU: timeout 3000 python scripts/trace_celeba_sampler.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    import dataclasses

    from bench import _celeba

    B = 32
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    unet, diffusion = _celeba(on_tpu=True)
    diffusion = dataclasses.replace(diffusion, sample_timesteps=8)  # short scan: same per-step profile
    model = unet(remat=False)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    y = jnp.zeros((B, 40), jnp.float32)

    @jax.jit
    def sample(p, r):
        def denoise(xt, t, y_):
            return model.apply({"params": p}, xt, t, y_, train=False)
        return diffusion.p_sample(denoise, (B, 64, 64, 3), r, label=y, use_ddim=True)

    jax.device_get(sample(params, jax.random.key(1)))  # compile + warmup

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/celeba_trace")
    with jax.profiler.trace(logdir):
        jax.device_get(sample(params, jax.random.key(2)))

    parse_trace(logdir, "/tmp/celeba", tools=("hlo_stats",))


if __name__ == "__main__":
    main()
