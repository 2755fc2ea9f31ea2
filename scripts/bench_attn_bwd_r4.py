"""Round-4 attack on the celeba T=4096/C=64 attention BACKWARD — the single
largest op in the no-remat train step: 41.2 ms/step = 14.2% of the step at an
implied ~50 TF/s (/tmp/celeba_train_r4_hlo_stats.json, attn.650).

Two levers (same analysis as the fwd in bench_attn_t4096_r4.py):
  1. bf16 matmul operands — the current kernel casts q/k/v/do to f32 on
     entry, so all six matmuls run the MXU's slow f32 mode. bf16 inputs with
     f32 accumulation (preferred_element_type) is the convs' native mode.
     Also frees ~4 MB of VMEM (no f32 casts of the (T,C) k/v), letting the
     q-block grow past the current bq=64.
  2. lane fill — with C=64, dq = ds@k, dk += ds.T@q, dv += p.T@do all produce
     (·, 64) outputs (half the 128 MXU lanes). Keeping the score TRANSPOSED
     (sT: (T, bq)) makes those three produce (C, T)- or (C, bq)-layout
     outputs with full-width lanes:
       dqT[c,j] = sum_t k[t,c]·dsT[t,j]   (contraction T, lanes bq)
       dkT[c,t] = sum_j q[j,c]·dsT[t,j]   (contraction bq, lanes T)
       dvT[c,t] = sum_j do[j,c]·pT[t,j]   (contraction bq, lanes T)
     The (BN, C, T) -> (BN, T, C) untranspose outside the kernel is ~200 MB
     of HBM traffic (~0.3 ms) against a 41 ms op.
  The two intrinsic C-contractions (s, dp) can't be widened — bf16 only.

Correctness: every variant is checked against jax.vjp of the f32 XLA
attention at T (fits: B·N·T·T f32 = 12.9 GB? no — vjp of xla attn at T=4096
would materialize (BN,T,T) twice = 25 GB. Checked instead against the
CURRENT bwd kernel output (itself VJP≡autodiff-tested in
tests/test_attention.py at smaller T).

Run ON TPU: timeout 3000 python scripts/bench_attn_bwd_r4.py [T]
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

from vdiff_tpu.ops.attention import _attn_bwd_kernel_qblk, _pick_qblk

B, N, C = 32, 6, 64
T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BN = B * N
ITERS = 10


def _bwd_kernel_bf16(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale):
    """Same layout as _attn_bwd_kernel_qblk, bf16 matmul operands (f32
    accumulation); softmax + ds algebra stay f32."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]    # bf16 (bq, C)
    k = k_ref[0]    # bf16 (T, C)
    v = v_ref[0]    # bf16 (T, C)
    do = do_ref[0]  # bf16 (bq, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)  # f32 (bq, T)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(jnp.bfloat16)
    pb = p.astype(jnp.bfloat16)
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
                 ).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
    dv_ref[0] += jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _bwd_kernel_T_bf16(q_ref, k_ref, v_ref, do_ref, dqT_ref, dkT_ref, dvT_ref,
                       *, scale):
    """Transposed-score backward: sT (T, bq); dq/dk/dv produced in (C, ·)
    layout with full MXU lanes; bf16 matmul operands."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dkT_ref[0] = jnp.zeros_like(dkT_ref[0])
        dvT_ref[0] = jnp.zeros_like(dvT_ref[0])

    q = q_ref[0]    # bf16 (bq, C)
    k = k_ref[0]    # bf16 (T, C)
    v = v_ref[0]    # bf16 (T, C)
    do = do_ref[0]  # bf16 (bq, C)
    # sT[t,j] = sum_c k[t,c] q[j,c]
    sT = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale  # (T, bq)
    m = jnp.max(sT, axis=0, keepdims=True)
    e = jnp.exp(sT - m)
    pT = e / jnp.sum(e, axis=0, keepdims=True)  # f32 (T, bq)
    # dpT[t,j] = sum_c v[t,c] do[j,c]
    dpT = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (T, bq)
    dsT = (pT * (dpT - jnp.sum(pT * dpT, axis=0, keepdims=True))
           ).astype(jnp.bfloat16)  # (T, bq)
    pTb = pT.astype(jnp.bfloat16)
    # dqT[c,j] = sum_t k[t,c] dsT[t,j]      — contraction T, lanes bq
    dqT_ref[0] = (jax.lax.dot_general(k, dsT, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
                  ).astype(dqT_ref.dtype)
    # dkT[c,t] = sum_j q[j,c] dsT[t,j]      — contraction bq, lanes T
    dkT_ref[0] += jax.lax.dot_general(
        q, dsT, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    # dvT[c,t] = sum_j do[j,c] pT[t,j]
    dvT_ref[0] += jax.lax.dot_general(
        do, pTb, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def current_bwd(q, k, v, do, bq):
    scale = 1.0 / math.sqrt(C)
    qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_qblk, scale=scale),
        grid=(BN, T // bq),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((BN, T, C), q.dtype),
            jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
        ],
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def bf16_bwd(q, k, v, do, bq):
    scale = 1.0 / math.sqrt(C)
    qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_bf16, scale=scale),
        grid=(BN, T // bq),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((BN, T, C), q.dtype),
            jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
            jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
        ],
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def transposed_bwd(q, k, v, do, bq):
    scale = 1.0 / math.sqrt(C)
    qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dqTspec = pl.BlockSpec((1, C, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM)
    cTspec = pl.BlockSpec((1, C, T), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dqT, dkT, dvT = pl.pallas_call(
        functools.partial(_bwd_kernel_T_bf16, scale=scale),
        grid=(BN, T // bq),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[dqTspec, cTspec, cTspec],
        out_shape=[
            jax.ShapeDtypeStruct((BN, C, T), q.dtype),
            jax.ShapeDtypeStruct((BN, C, T), jnp.float32),
            jax.ShapeDtypeStruct((BN, C, T), jnp.float32),
        ],
    )(q, k, v, do)
    tr = lambda a: jnp.swapaxes(a, 1, 2)
    return tr(dqT), tr(dkT).astype(k.dtype), tr(dvT).astype(v.dtype)


def timed(op, args):
    @jax.jit
    def run(*args):
        def body(carry, _):
            q, k, v, do = carry
            dq, dk, dv = op(q, k, v, do)
            return (dq, dk, dv, do), None
        out, _ = jax.lax.scan(body, args, None, length=ITERS)
        return jnp.sum(out[0].astype(jnp.float32))

    jax.device_get(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}  B={B} T={T} N={N} C={C}", flush=True)
    rng = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rng.randn(BN, T, C), jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()
    bq0 = _pick_qblk(T, C)
    print(f"current _pick_qblk -> bq={bq0}", flush=True)
    base = jax.jit(lambda *a: current_bwd(*a, bq0))(q, k, v, do)

    variants = {
        f"current f32 bq={bq0}": lambda *a: current_bwd(*a, bq0),
        f"bf16ops bq={bq0}": lambda *a: bf16_bwd(*a, bq0),
        "bf16ops bq=128": lambda *a: bf16_bwd(*a, 128),
        "bf16ops bq=256": lambda *a: bf16_bwd(*a, 256),
        f"transposed+bf16 bq={bq0}": lambda *a: transposed_bwd(*a, bq0),
        "transposed+bf16 bq=128": lambda *a: transposed_bwd(*a, 128),
        "transposed+bf16 bq=256": lambda *a: transposed_bwd(*a, 256),
        "transposed+bf16 bq=512": lambda *a: transposed_bwd(*a, 512),
    }
    # bwd matmul FLOPs: 5 (T,T)-shaped matmuls of 2·T·T·C each per head
    flops = 5 * 2 * BN * T * T * C
    for name, op in variants.items():
        try:
            outs = jax.jit(op)(q, k, v, do)
            errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32) - b.astype(jnp.float32))))
                    for o, b in zip(outs, base)]
            t = timed(op, (q, k, v, do))
            print(f"{name:26s} {t*1e6:8.1f} us ({flops/t/1e12:6.1f} TF/s)  "
                  f"max|d|=({errs[0]:.1e},{errs[1]:.1e},{errs[2]:.1e})", flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
