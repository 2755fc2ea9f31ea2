"""Round-4 attack on the celeba T=4096/C=64 up-resample attention (the single
biggest op in the celeba sampler: 10.84 ms/step = 14.4% of the step at an
implied ~76 TF/s — /tmp/celeba_r4_hlo_stats.json via scripts/trace_celeba_r4.py).

Why it runs at half rate: with head_dim C=64, the QK matmul (bq,64)@(64,T)
half-fills the MXU contraction and the PV matmul (bq,T)@(T,64) half-fills the
output lanes. The QK half-fill is intrinsic (the useful contraction IS 64),
but PV is not: computing the score matrix TRANSPOSED — sT(T,bq) = k @ qT,
softmax over axis 0 — makes the PV matmul dot_general(v,(T,C), pT,(T,bq))
contract over T (full) with bq output lanes (full) → full MXU rate, at the
cost of a tiny in-kernel (bq,64) q transpose and a transposed (BN,C,T) output.

Variants (all (B,T,3NC) -> (B,T,NC) so fold/split/output copies count):
  a) dispatch (current): spatial_attention_qkv — fold copies + native64 bq=512
  b) native64 qblk bq=512/256 (isolate: same as dispatch minus dispatch glue)
  c) native64 + divide-after-PV (normalize the (bq,C) output, not the (bq,T) p)
  d) transposed qblk bq=512/256/128 (+ divide-after-PV built in)
  e) xla einsum (correctness reference only — would OOM the naive path? no:
     B*N*T*T f32 = 12.9 GB... skipped at T=4096, CPU-checked in tests instead;
     correctness here is vs variant (a))

FLOPs counted as 4*B*N*T*T*C.

Run ON TPU: timeout 3000 python scripts/bench_attn_t4096_r4.py [T]
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdiff_tpu.ops.attention import _attn_fwd_kernel_qblk, spatial_attention_qkv

B, N, C = 32, 6, 64
T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = 10


def folded(qkv):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    return fold(q), fold(k), fold(v)


def unfold(out):
    return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def _kernel_divafter(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Native layout, but normalize AFTER the PV matmul ((bq,C) divide instead
    of the (bq,T) divide inside jax.nn.softmax)."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_T(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Transposed-score kernel: sT (T, bq) so PV contracts over T at full MXU
    rate; output block is (C, bq) into a (BN, C, T) array."""
    q = q_ref[0].astype(jnp.float32) * scale   # (bq, C)
    k = k_ref[0].astype(jnp.float32)           # (T, C)
    v = v_ref[0].astype(jnp.float32)           # (T, C)
    # sT[t, j] = sum_c k[t, c] * q[j, c]
    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (T, bq)
    m = jnp.max(sT, axis=0, keepdims=True)
    p = jnp.exp(sT - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    # oT[c, j] = sum_t v[t, c] * p[t, j]  — contraction T (full), lanes bq (full)
    oT = jax.lax.dot_general(v, p, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, bq)
    o_ref[0] = (oT / l).astype(o_ref.dtype)


def _kernel_bf16ops(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Matmul operands stay bf16 (the MXU's fast input mode; f32 accumulation
    via preferred_element_type) — only the softmax runs in f32."""
    q = q_ref[0]                               # bf16 (bq, C)
    k = k_ref[0]                               # bf16 (T, C)
    v = v_ref[0]                               # bf16 (T, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_T_bf16ops(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Transposed-score + bf16 matmul operands."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale  # (T, bq)
    m = jnp.max(sT, axis=0, keepdims=True)
    p = jnp.exp(sT - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    oT = jax.lax.dot_general(v, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, bq)
    o_ref[0] = (oT / l).astype(o_ref.dtype)


def qblk_native(qkv, bq, kernel):
    q, k, v = folded(qkv)
    spec_q = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(kernel, scale=1.0 / math.sqrt(C)),
        grid=(B * N, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), qkv.dtype),
    )(q, k, v)
    return unfold(o)


def qblk_viewed(qkv, bq, kernel):
    """No fold copies: q/k/v are lane-offset BlockSpec views of the fused qkv
    array itself (the C%128==0 trick from flash_attention_qkv, attempted at
    sub-lane C=64 — offsets are multiples of 64, not 128; Mosaic may reject)."""
    spec_q = pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, N + n), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, 2 * N + n), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, scale=1.0 / math.sqrt(C)),
        grid=(B, N, T // bq),
        in_specs=[spec_q, spec_k, spec_v],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, N * C), qkv.dtype),
    )(qkv, qkv, qkv)


def qblk_transposed(qkv, bq, kernel=_kernel_T):
    q, k, v = folded(qkv)
    spec_q = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, C, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM)
    oT = pl.pallas_call(
        functools.partial(kernel, scale=1.0 / math.sqrt(C)),
        grid=(B * N, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((B * N, C, T), qkv.dtype),
    )(q, k, v)
    # (BN, C, T) -> (B, T, N*C)
    return oT.reshape(B, N, C, T).transpose(0, 3, 1, 2).reshape(B, T, N * C)


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
    base = jax.jit(lambda x: spatial_attention_qkv(x, N, use_flash=True, train=False))(qkv)
    variants = {
        "dispatch (current)": lambda x: spatial_attention_qkv(x, N, use_flash=True, train=False),
        "native64 bq=512": lambda x: qblk_native(x, 512, _attn_fwd_kernel_qblk),
        "native64 bq=256": lambda x: qblk_native(x, 256, _attn_fwd_kernel_qblk),
        "native64+divafter bq=512": lambda x: qblk_native(x, 512, _kernel_divafter),
        "transposed bq=512": lambda x: qblk_transposed(x, 512),
        "transposed bq=256": lambda x: qblk_transposed(x, 256),
        "transposed bq=128": lambda x: qblk_transposed(x, 128),
        "native64+bf16ops bq=512": lambda x: qblk_native(x, 512, _kernel_bf16ops),
        "viewed64 bq=512": lambda x: qblk_viewed(x, 512, _attn_fwd_kernel_qblk),
        "viewed64+bf16 bq=512": lambda x: qblk_viewed(x, 512, _kernel_bf16ops),
        "transposed+bf16 bq=512": lambda x: qblk_transposed(x, 512, _kernel_T_bf16ops),
        "transposed+bf16 bq=256": lambda x: qblk_transposed(x, 256, _kernel_T_bf16ops),
    }
    flops = 4 * B * N * T * T * C
    for name, op in variants.items():
        try:
            err = float(jnp.max(jnp.abs(
                jax.jit(op)(qkv).astype(jnp.float32) - base.astype(jnp.float32))))
            t = timed(op, qkv)
            print(f"{name:26s} {t*1e6:8.1f} us ({flops/t/1e12:6.1f} TF/s)  max|d|={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
