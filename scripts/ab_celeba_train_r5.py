"""Round-5: adjudicate the integrated celeba-train regression (110.4 → ~100).

Two integrated runs at HEAD measured celeba train at 101.9 (pre-gate) and
99.7 (post-gate) img/s/chip vs BENCH_r04's 110.4, while the op-level
microbench (scripts/bench_attn_train_pack_r5.py) says the only dispatch
change on that path — packed training attention at T=1024 — is a 1.02x WIN.
This A/Bs the exact bench recipe in one process:

  canary: one 8192^3 bf16 matmul (chip/tunnel health — if the chip itself is
          slow today, both configs shift together and the canary shows it)
  A. HEAD dispatch (packed training attention at T=1024, folded at T=4096)
  B. folded everywhere (packed-backward picker forced 0 → the exact r4 path)

If B recovers ~110, the packed training path is an in-model loss and comes
out of the dispatch; if A≈B≈100, the regression is chip/tunnel state, not
code, and the RUNLOG records that with the canary reading.

Run ON TPU: timeout 4800 python scripts/ab_celeba_train_r5.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vdiff_tpu.ops import attention as A


def canary():
    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    jax.device_get(f(x, x))
    t0 = time.perf_counter()
    for _ in range(8):
        out = f(x, x)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / 8
    print(f"canary: 8192^3 bf16 matmul {2 * n**3 / dt / 1e12:.1f} TF/s "
          f"(r4-era chips ~180-190)", flush=True)


def run_config(name, params_host):
    from bench import _celeba
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    unet, diffusion = _celeba(on_tpu=True)
    model = unet(remat=False)
    B, res, n_steps = 32, 64, 8
    params = jax.device_put(params_host)
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step_fn = make_train_step(model, diffusion, optimizer, timesteps=0,
                              num_accum=1, use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, res, res, 3), jnp.float32, -1, 1)
    y = (jax.random.uniform(jax.random.key(2), (B, 40)) < 0.5).astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_steps(st, r):
        def body(s, k):
            s, loss = step_fn(s, x, y, k)
            return s, loss
        return jax.lax.scan(body, st, jax.random.split(r, n_steps))

    c = scan_steps.lower(state, jax.random.key(3)).compile()
    state, losses = c(state, jax.random.key(3))
    jax.device_get(losses)
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        state, losses = c(state, jax.random.key(4 + rep))
        jax.device_get(losses)
        dt = (time.perf_counter() - t0) / n_steps
        rates.append(B / dt)
    print(f"{name}: " + " ".join(f"{r:6.1f}" for r in rates)
          + " img/s/chip (3 reps of 8 steps)", flush=True)
    del state, losses, params
    return rates


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    canary()

    # init params ONCE, stage on host, share across configs (the state is
    # donated inside each config)
    from bench import _celeba
    unet, _ = _celeba(on_tpu=True)
    model = unet(remat=False)
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
                        jnp.zeros((1, 40)))["params"]
    params_host = jax.device_get(params)
    del params

    run_config("A packed-T1024 (HEAD)", params_host)

    orig = A._pick_qblk_pack1_bwd
    A._pick_qblk_pack1_bwd = lambda T, C: 0
    try:
        run_config("B folded (r4 path) ", params_host)
    finally:
        A._pick_qblk_pack1_bwd = orig


if __name__ == "__main__":
    main()
