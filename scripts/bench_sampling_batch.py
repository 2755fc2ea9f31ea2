"""Sampling-throughput batch sweep: find the per-chip-optimal batch size for
the 256-step DDIM sampler (round-1 ablation showed B=256 LOSES to B=128;
check the other side of the knee too).

Run ON TPU: python scripts/bench_sampling_batch.py [w_guide]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    from bench import _flagship

    w = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    print(f"backend: {jax.default_backend()}  w_guide={w}", flush=True)
    model, diffusion = _flagship(on_tpu=True)
    if w:
        diffusion = dataclasses.replace(diffusion, w_guide=w)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": params}, x_t, t_, y_, train=False)

    for batch in (32, 64, 96, 128, 192, 256):
        labels = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

        @jax.jit
        def sample(r, batch=batch, labels=labels):
            return diffusion.p_sample(
                denoise_fn, (batch, 32, 32, 3), r, label=labels, use_ddim=True
            )

        jax.block_until_ready(sample(jax.random.key(1)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(sample(jax.random.key(2 + i)))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        print(f"B={batch:4d}: {batch/dt:7.2f} samples/s/chip  ({dt*1e3/256:6.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
