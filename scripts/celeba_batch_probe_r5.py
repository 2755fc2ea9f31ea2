"""Round-5: does the B=32 no-remat celeba train recipe still win after the
kv-blocked packed backward freed ~18 ms/step of attention time and the
packed paths shrank copies? Larger batches amortize fixed per-step work but
grow activations (+ the new out/lse residuals, ~300 MB at B=32/T=4096).
Probes B in {32, 48, 64} with the exact bench step (donated state, 8-step
jitted scan, CFG dropout, EMA) in ONE process; OOM is caught and reported.

Run ON TPU: timeout 7200 python scripts/celeba_batch_probe_r5.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    print("backend:", jax.default_backend(), flush=True)
    import bench
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    unet, diffusion = bench._celeba(on_tpu=True)
    model = unet(remat=False)
    rng = jax.random.key(0)
    params_host = jax.device_get(model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)))["params"])
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    step_fn = make_train_step(model, diffusion, optimizer, timesteps=0,
                              num_accum=1, use_cfg=True, use_ema=True)
    n_steps = 8

    for B in (32, 48, 64):
        params = jax.device_put(params_host)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=optimizer.init(params),
                           ema_params=jax.tree.map(jnp.copy, params))
        x = jax.random.uniform(jax.random.key(1), (B, 64, 64, 3), jnp.float32, -1, 1)
        y = (jax.random.uniform(jax.random.key(2), (B, 40)) < 0.5).astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_steps(st, r, x=x, y=y):
            def body(s, k):
                s, loss = step_fn(s, x, y, k)
                return s, loss
            return jax.lax.scan(body, st, jax.random.split(r, n_steps))

        try:
            state, _ = scan_steps(state, jax.random.key(3))
            jax.block_until_ready(state.step)
            t0 = time.perf_counter()
            state, losses = scan_steps(state, jax.random.key(4))
            jax.block_until_ready(losses)
            dt = (time.perf_counter() - t0) / n_steps
            print(f"B={B}: {B / dt:7.1f} img/s/chip  ({dt * 1e3:.1f} ms/step)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM per batch size
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        finally:
            del state


if __name__ == "__main__":
    main()
