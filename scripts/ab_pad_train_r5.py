"""Round-5: adjudicate the celeba-train effect of weight-level head padding.

After wiring pack1_padded_heads into AttentionBlock, a fresh chip session
read celeba train 115.7 img/s/chip at B=48 while the SAME session's sampler
read 1.855 (slightly up vs the pre-padding 1.848) — so the session is
r4-grade and the drop vs the pre-padding 128.7 is suspected to be the
TRAINING side of the padding: at T=256 the padded shape routes
pack1_attention_trainable (full-row packed, N=10) where the unpadded shape
took the folded flash custom-VJP (N=9) — a pairing never microbenched.

  A. HEAD (padding on: T=256 level trains packed at N_eff=10)
  B. pack1_padded_heads forced 0 (T=256 level trains folded at N=9;
     T=1024/T=4096 levels identical in both arms)

If B recovers ~128, the training-side pad is an in-model loss and the gate
should exclude train; if A≈B, the 115.7 was session noise after all.

Run ON TPU: timeout 4800 python scripts/ab_pad_train_r5.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vdiff_tpu.ops import attention as A


def run_config(name, params_host):
    from bench import _celeba
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    unet, diffusion = _celeba(on_tpu=True)
    model = unet(remat=False)
    B, res, n_steps = 48, 64, 8
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
          + " img/s/chip (3 reps of 8 steps, B=48)", flush=True)
    del state, losses, params
    return rates


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    from bench import _celeba
    unet, _ = _celeba(on_tpu=True)
    model = unet(remat=False)
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
                        jnp.zeros((1, 40)))["params"]
    params_host = jax.device_get(params)
    del params

    run_config("A padded-T256 (HEAD)", params_host)

    # unet binds the helper by from-import: patch BOTH namespaces
    from vdiff_tpu.models import unet as U
    orig = A.pack1_padded_heads
    A.pack1_padded_heads = U.pack1_padded_heads = lambda T, N, C, train: 0
    try:
        run_config("B unpadded (folded T256)", params_host)
    finally:
        A.pack1_padded_heads = U.pack1_padded_heads = orig


if __name__ == "__main__":
    main()
