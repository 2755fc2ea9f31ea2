"""Probe native-width (no-pad) TRAINABLE sub-lane attention at the celeba
level-1 shape: value+grad parity vs the padded path on the real chip, then
chained timing of both. If native wins, spatial_attention_qkv's train branch
drops the pad too.

Run ON TPU: timeout 3600 python scripts/bench_attn_celeba_train_r3.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.ops import attention as A

B, T, N, C = 32, 1024, 6, 64
Cp = 128
ITERS = 10


def folded(qkv, pad):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    q, k, v = fold(q), fold(k), fold(v)
    if pad:
        w = [(0, 0), (0, 0), (0, Cp - C)]
        q = jnp.pad(q * (Cp / C) ** 0.5, w)
        k, v = jnp.pad(k, w), jnp.pad(v, w)
    return q, k, v


def unfold(out):
    return out[..., :C].reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def attn_padded(qkv):
    return unfold(A.flash_attention_trainable(*folded(qkv, True)))


def attn_native(qkv):
    return unfold(A.flash_attention_trainable(*folded(qkv, False)))


def timed_grad(fn, x0):
    @jax.jit
    def run(x0):
        def body(carry, _):
            val, g = jax.value_and_grad(lambda a: jnp.sum(jnp.sin(fn(a).astype(jnp.float32))))(carry)
            return (carry + g.astype(carry.dtype) * 1e-6), val
        out, vals = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(vals)

    jax.device_get(run(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(x0))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}  B={B} T={T} N={N} C={C}", flush=True)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C), jnp.bfloat16)

    # parity: values + grads on chip
    def loss(fn, a):
        return jnp.sum(jnp.sin(fn(a).astype(jnp.float32)))

    vp, gp = jax.jit(jax.value_and_grad(lambda a: loss(attn_padded, a)))(qkv)
    vn, gn = jax.jit(jax.value_and_grad(lambda a: loss(attn_native, a)))(qkv)
    vp, gp, vn, gn = map(jax.device_get, (vp, gp, vn, gn))
    gerr = float(np.max(np.abs(gp.astype(np.float32) - gn.astype(np.float32))))
    print(f"value padded={float(vp):.4f} native={float(vn):.4f}  grad max|d|={gerr:.2e}", flush=True)

    for name, fn in (("padded fwd+bwd", attn_padded), ("native fwd+bwd", attn_native)):
        t = timed_grad(fn, qkv)
        print(f"{name:16s} {t*1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
