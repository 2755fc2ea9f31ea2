"""Round-3 tuning of the T=1024 inference attention (the sampler's single
worst kernel: ~105 TF/s in hlo_stats vs 164 TF/s for the training sibling).

Hypotheses probed:
  (1) dtype: the kernels upcast bf16 operands to f32 before the MXU dots —
      keeping matmul inputs bf16 (f32 accumulate via preferred_element_type,
      f32 softmax) should raise MXU rate.
  (2) layout: the lane-offset BlockSpec views into the fused (B, T, 3NC)
      array DMA strided rows; pre-split contiguous (BN, T, C) operands
      (XLA pays one split copy outside) may DMA faster.
  (3) granularity: whole-row bq=T single-program-per-(b,n) removes the
      repeated k/v loads of the q-block grid.

Run ON TPU: timeout 1800 python scripts/bench_attn_inference_r3.py
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdiff_tpu.ops.attention import _attn_fwd_kernel_qblk, flash_attention_qkv, _xla_attention

B, T, N, C = 64, 1024, 1, 256
ITERS = 30


def _kernel_f32(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_bf16(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_nomax(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Direct softmax WITHOUT the max-subtract pass (saves one full (T,T)
    reduce+sub). Safe only when logits are bounded well below f32 exp
    overflow (~88) — true for GN-normalized sampler activations."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def views_call(kernel, qkv, bq):
    """Lane-offset views into the fused (B, T, 3NC) array (current layout)."""
    scale = 1.0 / (C ** 0.5)
    return pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=(B * N, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, N), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 2 * N), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), qkv.dtype),
    )(qkv, qkv, qkv)


def split_call(kernel, qkv, bq):
    """Pre-split contiguous (BN, T, C) operands (XLA split outside)."""
    scale = 1.0 / (C ** 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)  # N=1: already (B, T, C)
    spec_q = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=(B * N, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), qkv.dtype),
    )(q, k, v)


def timed(op, x0):
    # scalar-reduced output: device_get of the full (B, T, 3NC) result ships
    # ~100 MB through the tunnel per call and dominates the measurement; the
    # sum still forces the whole chained computation
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

    def xla(x):
        q, k, v = jnp.split(x, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return _xla_attention(tok(q), tok(k), tok(v))

    variants = {
        "dispatch (current)": lambda x: flash_attention_qkv(x, N),
        "views f32  bq=512": lambda x: views_call(_kernel_f32, x, 512),
        "views bf16 bq=512": lambda x: views_call(_kernel_bf16, x, 512),
        "views bf16 bq=1024": lambda x: views_call(_kernel_bf16, x, 1024),
        "split f32  bq=512": lambda x: split_call(_kernel_f32, x, 512),
        "split bf16 bq=512": lambda x: split_call(_kernel_bf16, x, 512),
        "split bf16 bq=1024": lambda x: split_call(_kernel_bf16, x, 1024),
        "split f32  bq=1024": lambda x: split_call(_kernel_f32, x, 1024),
        "views nomax bq=512": lambda x: views_call(_kernel_nomax, x, 512),
        "views nomax bq=256": lambda x: views_call(_kernel_nomax, x, 256),
        "xla (einsum)": xla,
    }
    base = jax.jit(variants["dispatch (current)"])(qkv)
    flops = B * N * 2 * T * T * C * 2
    for name, op in variants.items():
        try:
            err = float(jnp.max(jnp.abs(
                jax.jit(op)(qkv).astype(jnp.float32) - base.astype(jnp.float32))))
            t = timed(op, qkv)
            print(f"{name:24s} {t*1e6:8.1f} us ({flops/t/1e12:6.1f} TF/s)  max|d|={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
