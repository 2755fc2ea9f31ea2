"""Quantify the training-attention share of the flagship train step on TPU
(VERDICT r1 #5: measure before building a flash backward kernel).

Ablation method: time the full jitted train step with (a) the real attention
blocks, (b) attention disabled (apply_attn all-False, other FLOPs identical).
The delta bounds everything attention-related in fwd+bwd (QKV/proj matmuls +
softmax chains + their gradients). Also times the bare attention op fwd/bwd
in XLA vs Pallas-fwd form at the UNet's shapes.

Run ON TPU:  python scripts/profile_train_attention.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step


def make_step(apply_attn, batch=128):
    model = UNet(
        in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
        num_res_blocks=3, apply_attn=apply_attn, drop_rate=0.2, num_heads=1,
        num_classes=10, use_flash=True, dtype=jnp.bfloat16,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
        model_out_type="v", model_var_type="fixed_medium", reweight_type="snr_trunc",
        loss_type="mse", intp_frac=0.3, w_guide=0.0, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=2e-4, warmup=5000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init({"params": rng, "dropout": rng},
                        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)))["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(model, diffusion, optimizer, timesteps=0,
                           num_accum=1, use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (batch, 32, 32, 3), jnp.float32, -1, 1)
    y = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

    # K steps chained in ONE jit: per-dispatch timing through the axon tunnel
    # pays ~27 ms RPC each call (see bench.py bench_train)
    K = 10

    @jax.jit
    def run(r):
        def body(st, k):
            st, loss = step(st, x, y, k)
            return st, loss
        _, losses = jax.lax.scan(body, state, jax.random.split(r, K))
        return losses

    return run, K


def _timed(run, K, key, reps=3):
    import time

    jax.block_until_ready(run(key))  # compile + warmup
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, i)))
        ts.append((time.perf_counter() - t0) / K)
    return sorted(ts)[len(ts) // 2]


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)
    B = 128

    run_w, K = make_step((False, True, True), B)
    t_w = _timed(run_w, K, jax.random.key(2))
    print(f"train step WITH attention : {t_w*1e3:8.2f} ms  ({B/t_w:7.1f} img/s)", flush=True)
    run_n, K = make_step((False, False, False), B)
    t_n = _timed(run_n, K, jax.random.key(2))
    print(f"train step NO   attention : {t_n*1e3:8.2f} ms  ({B/t_n:7.1f} img/s)")
    print(f"attention share (fwd+bwd) : {(t_w-t_n)/t_w*100:5.1f}%  ({(t_w-t_n)*1e3:.2f} ms)",
          flush=True)

    # bare op, UNet shapes: two attn stages at 16x16 (T=256) and 8x8 (T=64),
    # N=1 head, C=256, batch 128 — fwd and fwd+bwd, chained in one jit
    from vdiff_tpu.ops.attention import _xla_attention, spatial_attention_qkv

    OPK = 50
    for T in (256, 64):
        q = jax.random.normal(jax.random.key(3), (B, T, 1, 256), jnp.bfloat16)
        qkv = jax.random.normal(jax.random.key(4), (B, T, 3 * 256), jnp.bfloat16)

        def chain_op(op, x0):
            @jax.jit
            def run(r):
                def body(carry, _):
                    out = op(carry)
                    return out, None
                out, _ = jax.lax.scan(body, x0, None, length=OPK)
                return out
            return run

        fwd = chain_op(lambda q: _xla_attention(q, q, q).reshape(q.shape), q)
        print(f"T={T:4d} XLA attn fwd       : {_timed(fwd, OPK, jax.random.key(0))*1e6:9.1f} us")

        g = jax.grad(lambda q: _xla_attention(q, q, q).astype(jnp.float32).sum())
        grad = chain_op(lambda q: g(q).reshape(q.shape), q)
        print(f"T={T:4d} XLA attn fwd+bwd   : {_timed(grad, OPK, jax.random.key(0))*1e6:9.1f} us")

        flash = chain_op(
            lambda v: jnp.concatenate([spatial_attention_qkv(v, 1, use_flash=True)] * 3, -1),
            qkv,
        )
        print(f"T={T:4d} flash fwd (+concat): {_timed(flash, OPK, jax.random.key(0))*1e6:9.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
