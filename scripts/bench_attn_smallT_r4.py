"""Round-4: does the native-dtype-operand backward win at SMALL T too?

The qblk backward's bf16-operand variant measured +7.8% at celeba's
T=4096/C=64 (scripts/bench_attn_bwd_r4.py). The flagship CIFAR train step
(B=192, hid=256, num_heads=1) runs attention through the WHOLE-TILE kernels
at T=256/C=256 (16x16 level) and T=64/C=256 (8x8 level) — this measures the
f32-cast whole-tile backward (pre-round-4 form, inlined here) against the
integrated native-operand ``_attn_bwd_kernel`` at those exact shapes.

Run ON TPU: timeout 3000 python scripts/bench_attn_smallT_r4.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdiff_tpu.ops.attention import (
    _attn_bwd_kernel, _bmm, _gbh_spec, _heads_per_program,
)

ITERS = 20


def _bwd_kernel_f32(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    """The pre-round-4 whole-tile backward: every operand cast to f32."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = _bmm(q * scale, k, 2, 2)
    p = jax.nn.softmax(s, axis=-1)
    dv = _bmm(p, do, 1, 1)
    dp = _bmm(do, v, 2, 2)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq_ref[0] = (_bmm(ds, k, 2, 1) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (_bmm(ds, q, 1, 1) * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def bwd_call(kernel, q, k, v, do):
    BN, T, C = q.shape
    scale = 1.0 / (C ** 0.5)
    G = _heads_per_program(BN, T, C)
    fold = lambda a: a.reshape(BN // G, G, T, C)
    dq, dk, dv = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=(BN // G,),
        in_specs=[_gbh_spec(G, T, C)] * 4,
        out_specs=[_gbh_spec(G, T, C)] * 3,
        out_shape=[jax.ShapeDtypeStruct((BN // G, G, T, C), q.dtype)] * 3,
    )(fold(q), fold(k), fold(v), fold(do))
    unfold = lambda a: a.reshape(BN, T, C)
    return unfold(dq), unfold(dk), unfold(dv)


def timed(fn, q, k, v, do):
    """Scan ITERS iterations inside ONE jit — axon dispatch is a network
    roundtrip per call, so python-loop timing measures the tunnel."""
    @jax.jit
    def run(q_, k_, v_, do_):
        def body(carry, _):
            cq, ck, cv, cdo = carry
            dq, dk, dv = fn(cq, ck, cv, cdo)
            return (dq, dk, dv, cdo), None
        out, _ = jax.lax.scan(body, (q_, k_, v_, do_), None, length=ITERS)
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)

    jax.device_get(run(q, k, v, do))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(q, k, v, do))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    for (BN, T, C) in [(192, 256, 256), (192, 64, 256)]:
        mk = lambda: jnp.asarray(rng.randn(BN, T, C), jnp.bfloat16)
        q, k, v, do = mk(), mk(), mk(), mk()
        flops = 5 * 2 * BN * T * T * C
        t_old = timed(lambda *a: bwd_call(_bwd_kernel_f32, *a), q, k, v, do)
        t_new = timed(lambda *a: bwd_call(_attn_bwd_kernel, *a), q, k, v, do)
        o = jax.jit(lambda *a: bwd_call(_bwd_kernel_f32, *a))(q, k, v, do)
        n = jax.jit(lambda *a: bwd_call(_attn_bwd_kernel, *a))(q, k, v, do)
        md = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                 for a, b in zip(o, n))
        print(f"BN={BN} T={T} C={C}: f32-ops {t_old*1e3:7.3f} ms ({flops/t_old/1e12:5.1f} TF/s)"
              f"  native-ops {t_new*1e3:7.3f} ms ({flops/t_new/1e12:5.1f} TF/s)"
              f"  speedup {t_old/t_new:5.3f}x  max|d|={md:.3e}", flush=True)


if __name__ == "__main__":
    main()
