"""Is the up-path concat worth eliminating? Pure-XLA A/B at flagship shapes.

The UNet up path computes ``block(concat([h, skip]))``: the concat (B, 32,
32, 512) bf16 is 128 MB that XLA materializes and then reads twice (conv1
chain + the 1x1 skip conv). Since GroupNorm(32) groups never straddle the
256/256 boundary, the whole chain splits exactly:

  GN(concat)      = concat(GN_16(h), GN_16(s))        (split gamma/beta)
  conv(concat, W) = conv(h, W[:, :, :C1]) + conv(s, W[:, :, C1:])
  1x1(concat, Ws) = 1x1(h, Ws1) + 1x1(s, Ws2)

Run ON TPU: python scripts/bench_concat_free.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.ops.groupnorm import gn_film_silu

B, H, W, C1, C2, CO = 128, 32, 32, 256, 256, 256
ITERS = 30


def make_params(rng):
    k = jnp.asarray(rng.randn(3, 3, C1 + C2, CO) * 0.03, jnp.float32)
    ks = jnp.asarray(rng.randn(1, 1, C1 + C2, CO) * 0.05, jnp.float32)
    gamma = jnp.asarray(rng.rand(C1 + C2) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C1 + C2) * 0.1, jnp.float32)
    return k, ks, gamma, beta


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain_concat(h, s, k, ks, gamma, beta):
    x = jnp.concatenate([h, s], axis=-1)
    skip = conv(x, ks)
    y = gn_film_silu(x, gamma, beta, num_groups=32, eps=1e-6, apply_silu=True)
    return conv(y, k) + skip


def chain_split(h, s, k, ks, gamma, beta):
    skip = conv(h, ks[:, :, :C1]) + conv(s, ks[:, :, C1:])
    yh = gn_film_silu(h, gamma[:C1], beta[:C1], num_groups=16, eps=1e-6, apply_silu=True)
    ys = gn_film_silu(s, gamma[C1:], beta[C1:], num_groups=16, eps=1e-6, apply_silu=True)
    return conv(yh, k[:, :, :C1]) + conv(ys, k[:, :, C1:]) + skip


def timed(op, h, s):
    @jax.jit
    def run(h0, s0):
        def body(carry, _):
            h, s = carry
            out = op(h, s)
            return (out, s), None
        (out, _), _ = jax.lax.scan(body, (h0, s0), None, length=ITERS)
        return out

    jax.block_until_ready(run(h, s))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(h, s))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    k, ks, gamma, beta = make_params(rng)
    h = jnp.asarray(rng.randn(B, H, W, C1), jnp.bfloat16)
    s = jnp.asarray(rng.randn(B, H, W, C2), jnp.bfloat16)

    a = jax.jit(lambda h, s: chain_concat(h, s, k, ks, gamma, beta))
    b = jax.jit(lambda h, s: chain_split(h, s, k, ks, gamma, beta))
    err = float(jnp.max(jnp.abs(a(h, s).astype(jnp.float32) - b(h, s).astype(jnp.float32))))

    tc = timed(lambda h, s: chain_concat(h, s, k, ks, gamma, beta), h, s)
    ts = timed(lambda h, s: chain_split(h, s, k, ks, gamma, beta), h, s)
    print(f"concat chain: {tc*1e6:8.1f} us")
    print(f"split  chain: {ts*1e6:8.1f} us   speedup {tc/ts:.3f}x   max|d|={err:.2e}")


if __name__ == "__main__":
    main()
