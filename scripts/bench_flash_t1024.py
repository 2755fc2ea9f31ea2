"""Tune the T=1024 inference flash attention (the up-path 32x32 attention —
4.5% of the sampler step at ~54% per-program efficiency).

Variants: online-softmax flash with block_k 256 vs 1024 (single k-iteration),
and the direct-softmax q-blocked kernel from the training path.

Run ON TPU: python scripts/bench_flash_t1024.py
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdiff_tpu.ops.attention import (
    _attn_fwd_kernel_qblk,
    flash_attention,
    flash_attention_qkv,
)

B, T, N, C = 64, 1024, 1, 256
ITERS = 30


def qblk_direct(qkv, bq):
    """Direct-softmax q-blocked fwd on the fused qkv layout (lane-offset
    views, like flash_attention_qkv)."""
    scale = 1.0 / (C ** 0.5)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel_qblk, scale=scale),
        grid=(B * N, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, N), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 2 * N), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), qkv.dtype),
    )(qkv, qkv, qkv)


def timed(op, x0):
    @jax.jit
    def run(x0):
        def body(carry, _):
            out = op(carry)
            nxt = jnp.concatenate([out, out, out], axis=-1)
            return nxt, None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out

    jax.block_until_ready(run(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}  B={B} T={T} C={C}", flush=True)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C), jnp.bfloat16)

    # NOTE: flash_attention_qkv itself now routes large T to the direct-softmax
    # kernel (the outcome of this benchmark) — the online-softmax variants
    # below go through flash_attention (split q/k/v form), which always uses
    # the online kernel, so the comparison stays a real one.
    def online(x, **blocks):
        q, k, v = jnp.split(x, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return flash_attention(tok(q), tok(k), tok(v), **blocks).reshape(B, T, N * C)

    base = jax.jit(lambda x: online(x))(qkv)
    variants = {
        "flash(online) bq=256 bk=256": lambda x: online(x),
        "flash(online) bq=256 bk=512": lambda x: online(x, block_k=512),
        "flash(online) bq=512 bk=256": lambda x: online(x, block_q=512),
        "flash(online) bq=512 bk=512": lambda x: online(x, block_q=512, block_k=512),
        "direct-softmax qblk bq=256": lambda x: qblk_direct(x, 256),
        "direct-softmax qblk bq=512": lambda x: qblk_direct(x, 512),
        "dispatch (flash_attention_qkv)": lambda x: flash_attention_qkv(x, N),
    }
    flops = B * N * 2 * T * T * C * 2
    for name, op in variants.items():
        try:
            err = float(jnp.max(jnp.abs(
                jax.jit(op)(qkv).astype(jnp.float32) - base.astype(jnp.float32))))
            t = timed(op, qkv)
            print(f"{name:32s} {t*1e6:8.1f} us ({flops/t/1e12:6.1f} TF/s)  max|d|={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
