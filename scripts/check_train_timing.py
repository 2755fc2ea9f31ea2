"""Cross-check train-step timing methodology on the axon-tunneled TPU.

Two measurements of the SAME jitted train step (flagship cifar10_cond shapes):
  a) Python loop of donated-state calls, block_until_ready at the end
  b) lax.scan of K steps inside ONE jit call (no host round-trips)

If (a) >> (b) differs, the async-dispatch timing under axon is unreliable and
bench.py must use (b).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

jax.config.update("jax_default_prng_impl", "rbg")

B = 128
model = UNet(
    in_channels=3, hid_channels=256, out_channels=3, ch_multipliers=(1, 1, 1),
    num_res_blocks=3, apply_attn=(False, True, True), drop_rate=0.2, num_heads=1,
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
step = make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1,
                       use_cfg=True, use_ema=True)
x = jax.random.uniform(jax.random.key(1), (B, 32, 32, 3), jnp.float32, -1, 1)
y = (jnp.arange(B, dtype=jnp.float32) % 10) + 1

# (a) python loop
step_jit = jax.jit(step, donate_argnums=(0,))
s, l = step_jit(state, x, y, jax.random.key(2))
jax.block_until_ready(l)
N = 10
t0 = time.perf_counter()
for i in range(N):
    s, l = step_jit(s, x, y, jax.random.key(3 + i))
jax.block_until_ready((s, l))
dt_a = (time.perf_counter() - t0) / N
print(f"(a) python loop    : {dt_a*1e3:8.2f} ms/step  ({B/dt_a:8.1f} img/s)")
print(f"    loss after loop: {float(l):.4f}")

# (b) lax.scan inside one jit
K = 20

@jax.jit
def scan_steps(state, rng):
    def body(st, k):
        st, loss = step(st, x, y, k)
        return st, loss
    keys = jax.random.split(rng, K)
    return jax.lax.scan(body, state, keys)

st2, losses = scan_steps(s, jax.random.key(99))
jax.block_until_ready(losses)
t0 = time.perf_counter()
st2, losses = scan_steps(st2, jax.random.key(100))
jax.block_until_ready(losses)
dt_b = (time.perf_counter() - t0) / K
print(f"(b) lax.scan       : {dt_b*1e3:8.2f} ms/step  ({B/dt_b:8.1f} img/s)")
print(f"    losses: {[round(float(v),4) for v in losses[:4]]} ...")
