"""Capture a jax.profiler trace of the DDIM sampler step on TPU and print the
op-level time breakdown (parsed on-box via the tensorboard profile plugin —
no TensorBoard UI needed).

Run ON TPU: python scripts/trace_sampler.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    from bench import _flagship

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    model, diffusion = _flagship(on_tpu=True)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": params}, x_t, t_, y_, train=False)

    labels = (jnp.arange(B, dtype=jnp.float32) % 10) + 1

    @jax.jit
    def sample(r):
        return diffusion.p_sample(denoise_fn, (B, 32, 32, 3), r, label=labels, use_ddim=True)

    jax.block_until_ready(sample(jax.random.key(1)))  # compile + warmup

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/sampler_trace")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(sample(jax.random.key(2)))

    parse_trace(logdir, "/tmp/sampler",
                tools=("framework_op_stats", "hlo_stats", "op_profile"))


if __name__ == "__main__":
    main()
