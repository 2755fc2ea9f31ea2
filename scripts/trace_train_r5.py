"""Round-5: decompose flagship CIFAR training (VERDICT r4 weak #5 / next #4).

The cifar10_cond train line has plateaued (1150.7 → 1211.5 → 1212.6 img/s/chip,
trace-derived ~59% MFU) without a per-category adjudication of the remaining
~40% non-MXU time. This traces the exact bench recipe (B=192, bf16, rbg PRNG,
CFG dropout, EMA, single jitted scan) with the r4 self-time pipeline and
prints the category table + top self-time ops, so the top item can be attacked
or the per-category SOL bound written (RUNLOG_TPU.md).

Run ON TPU: timeout 3000 python scripts/trace_train_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from trace_celeba_r4 import summarize  # per-category self-time table


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

    _, losses = steps(state, jax.random.key(2))
    jax.device_get(losses)

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/train_trace_r5")
    with jax.profiler.trace(logdir):
        _, losses = steps(state, jax.random.key(3))
        jax.device_get(losses)
    for p in parse_trace(logdir, "/tmp/train_r5", tools=("hlo_stats",)):
        summarize(p, top_ops=24)
    print(f"\n(table is for {K} chained steps; divide ms by {K} for per-step)",
          flush=True)


if __name__ == "__main__":
    main()
