"""Round-3 train follow-ups: cheap uint16-threshold dropout + combined stack.

First round measured (scripts/bench_train_r3.py): base 1151.2, B=192 1174.3
(+2%), B=256 1149.4, mu_dtype=bf16 1160.8, dropout-off BOUND 1212.3 (+5.3%).
Dropout costs ~5.5 ms/step; its RNG half generates uniform f32. Probe a
uint16-bits threshold dropout (same keep probability to 2^-16, half the
random bits) via a linen-Dropout monkeypatch, alone and stacked with B=192.

Run ON TPU: timeout 4500 python scripts/bench_train_r3b.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as linen

jax.config.update("jax_default_prng_impl", "rbg")


class CheapDropout(linen.Module):
    """uint16-threshold dropout: keep iff bits >= round(rate*65536); exact
    inverse-keep scaling. Signature-compatible with the unet.py call site
    ``nn.Dropout(rate, deterministic=...)(x)``."""

    rate: float
    deterministic: bool = True

    @linen.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        thresh = int(round(self.rate * 65536.0))
        keep_prob = 1.0 - thresh / 65536.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint16)
        keep = bits >= jnp.uint16(thresh)
        return jnp.where(keep, x * jnp.asarray(1.0 / keep_prob, x.dtype), 0)


def run_variant(name, batch, cheap_dropout, mu_dtype=None, n_steps=20):
    import importlib
    import optax

    import vdiff_tpu.models.unet as unet_mod

    orig = linen.Dropout
    if cheap_dropout:
        unet_mod.nn.Dropout = CheapDropout
    try:
        from vdiff_tpu.diffusion import GaussianDiffusion
        from vdiff_tpu.ops.numerics import get_logsnr_schedule
        from vdiff_tpu.train_lib import TrainState, make_train_step

        model = unet_mod.UNet(
            in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
            num_res_blocks=3, apply_attn=(False, True, True), drop_rate=0.2,
            num_heads=1, num_classes=10, use_flash=True, dtype=jnp.bfloat16,
        )
        diffusion = GaussianDiffusion(
            logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=256,
            model_out_type="v", model_var_type="fixed_medium", reweight_type="snr_trunc",
            loss_type="mse", intp_frac=0.3, w_guide=0.0, p_uncond=0.1,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lambda t: 2e-4 * jnp.minimum((t + 1.0) / 5000, 1.0),
                        b1=0.9, b2=0.999, weight_decay=0.0, mu_dtype=mu_dtype),
        )
        rng = jax.random.key(0)
        params = model.init({"params": rng, "dropout": rng},
                            jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)))["params"]
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params),
                           ema_params=jax.tree.map(jnp.copy, params))
        step_fn = make_train_step(model, diffusion, tx, timesteps=0, num_accum=1,
                                  use_cfg=True, use_ema=True)
        x = jax.random.uniform(jax.random.key(1), (batch, 32, 32, 3), jnp.float32, -1, 1)
        y = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

        @jax.jit
        def scan_steps(st, r):
            def body(s, k):
                s, loss = step_fn(s, x, y, k)
                return s, loss
            return jax.lax.scan(body, st, jax.random.split(r, n_steps))

        st, losses = scan_steps(state, jax.random.key(2))
        jax.device_get(losses)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            st, losses = scan_steps(st, jax.random.key(3 + i))
            jax.device_get(losses)
            ts.append((time.perf_counter() - t0) / n_steps)
        dt = sorted(ts)[1]
        print(f"{name:28s} B={batch:3d}  {dt*1e3:7.2f} ms/step  "
              f"{batch/dt:8.1f} img/s/chip  loss={float(jax.device_get(losses)[-1]):.4f}",
              flush=True)
    finally:
        unet_mod.nn.Dropout = orig


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    run_variant("cheap dropout", 128, True)
    run_variant("B=192 + cheap dropout", 192, True)
    run_variant("B=192 + cheap + mu_bf16", 192, True, mu_dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
