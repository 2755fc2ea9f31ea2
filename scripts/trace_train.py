"""Capture a jax.profiler trace of the flagship train step on TPU and dump
op-level stats (see trace_sampler.py).

Run ON TPU: python scripts/trace_train.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    from bench import _flagship
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    B = 192
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    model, diffusion = _flagship(on_tpu=True)
    optimizer = make_optimizer(lr=2e-4, warmup=5000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)))["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1,
                           use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 3), jnp.float32, -1, 1)
    y = (jnp.arange(B, dtype=jnp.float32) % 10) + 1
    K = 4

    @jax.jit
    def steps(state, r):
        def body(st, k):
            st, loss = step(st, x, y, k)
            return st, loss
        return jax.lax.scan(body, state, jax.random.split(r, K))

    state, losses = steps(state, jax.random.key(2))
    jax.block_until_ready(losses)

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/train_trace")
    with jax.profiler.trace(logdir):
        state, losses = steps(state, jax.random.key(3))
        jax.block_until_ready(losses)

    parse_trace(logdir, "/tmp/train", tools=("hlo_stats",))


if __name__ == "__main__":
    main()
