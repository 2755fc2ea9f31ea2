"""Tune the celeba sub-lane attention (head_dim=64): the padded online-softmax
path runs at ~18 TF/s and eats 42% of the celeba sampler step (trace,
/tmp/celeba_hlo_stats.json). Variants at the dominant level-1 shape
(B=32, T=1024, N=6, C=64):

  a) current dispatch (pad→online flash bq=bk=256)
  b) pad → online flash, block_k=1024 (single k-iteration)
  c) pad → direct-softmax q-blocked kernel (bq 256 / 512)
  d) unpadded direct qblk with native C=64 blocks (no pad materialization)
  e) unpadded direct qblk reading lane-offset 64-wide views of fused qkv
     (no split, no fold transpose, no pad — zero data formatting)
  f) XLA einsum reference

FLOPs are counted UNPADDED (4·B·N·T²·C) so variants that avoid the 2x pad
waste show their real advantage.

Run ON TPU: timeout 3600 python scripts/bench_attn_celeba_r3.py
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
    _xla_attention,
    flash_attention,
    spatial_attention_qkv,
)

B, T, N, C = 32, 1024, 6, 64
Cp = 128
ITERS = 20


def folded(qkv, pad):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    q, k, v = fold(q), fold(k), fold(v)
    if pad:
        w = [(0, 0), (0, 0), (0, Cp - C)]
        q = jnp.pad(q * (Cp / C) ** 0.5, w)
        k, v = jnp.pad(k, w), jnp.pad(v, w)
    return q, k, v


def unfold(out, Ck):
    return out[..., :C].reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def online_pad(qkv, bk):
    q, k, v = folded(qkv, pad=True)
    tok = lambda a: a.reshape(B * N, T, 1, Cp)
    o = flash_attention(tok(q), tok(k), tok(v), block_q=256, block_k=bk)
    return unfold(o.reshape(B * N, T, Cp), Cp)


def qblk_pad(qkv, bq):
    q, k, v = folded(qkv, pad=True)
    scale = 1.0 / (Cp ** 0.5)  # q pre-scaled by sqrt(Cp/C) → nets to 1/sqrt(C)
    spec_q = pl.BlockSpec((1, bq, Cp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, Cp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_attn_fwd_kernel_qblk, scale=scale),
        grid=(B * N, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B * N, T, Cp), qkv.dtype),
    )(q, k, v)
    return unfold(o, Cp)


def qblk_native64(qkv, bq):
    q, k, v = folded(qkv, pad=False)
    scale = 1.0 / (C ** 0.5)
    spec_q = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_attn_fwd_kernel_qblk, scale=scale),
        grid=(B * N, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), qkv.dtype),
    )(q, k, v)
    return o.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def qblk_views64(qkv, bq):
    """Lane-offset 64-wide views straight into the fused (B, T, 3NC) array."""
    scale = 1.0 / (C ** 0.5)
    spec_q = pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, N + n), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, 2 * N + n), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel_qblk, scale=scale),
        grid=(B, N, T // bq),
        in_specs=[spec_q, kspec, vspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, T, N * C), qkv.dtype),
    )(qkv, qkv, qkv)


def xla(qkv):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    return _xla_attention(tok(q), tok(k), tok(v))


def timed(op, x0):
    @jax.jit
    def run(x0):
        def body(carry, _):
            out = op(carry)
            nxt = jnp.concatenate([out, out, out], axis=-1)
            return nxt, None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

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
    base = jax.jit(xla)(qkv)
    variants = {
        "dispatch (current)": lambda x: spatial_attention_qkv(x, N, use_flash=True, train=False),
        "pad+online bk=256": lambda x: online_pad(x, 256),
        "pad+online bk=1024": lambda x: online_pad(x, 1024),
        "pad+qblk bq=256": lambda x: qblk_pad(x, 256),
        "pad+qblk bq=512": lambda x: qblk_pad(x, 512),
        "native64 qblk bq=256": lambda x: qblk_native64(x, 256),
        "native64 qblk bq=512": lambda x: qblk_native64(x, 512),
        "views64 qblk bq=256": lambda x: qblk_views64(x, 256),
        "views64 qblk bq=512": lambda x: qblk_views64(x, 512),
        "xla (einsum)": xla,
    }
    flops = 4 * B * N * T * T * C  # unpadded
    for name, op in variants.items():
        try:
            err = float(jnp.max(jnp.abs(
                jax.jit(op)(qkv).astype(jnp.float32) - base.astype(jnp.float32))))
            t = timed(op, qkv)
            print(f"{name:22s} {t*1e6:8.1f} us ({flops/t/1e12:6.1f} TF/s unpadded)  max|d|={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
