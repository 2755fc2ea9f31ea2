"""Round-5: adjudicate the packed-vs-folded dispatch per celeba shape.

Round 5 wired `_pack_fwd_call` (zero fold/unfold copies off the fused qkv)
into `spatial_attention_qkv`'s sub-lane inference branch. The r4 pair bench
measured 1.39x at T=1024/C=64; this script pins BOTH production shapes the
new gate now routes to the packed kernel — T=1024 (celeba level 1) and
T=4096 (the up-resample attention, `_pick_qblk_pack` → bq=128) — against the
previous folded `_qblk_fwd_call` path (split + head-transpose copies,
bq = `_pick_qblk_fwd`). If packed loses at T=4096 the dispatch gains a T gate.

Run ON TPU: timeout 3000 python scripts/bench_attn_pack_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.ops import attention as A

ITERS = 10


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            (x,) = carry
            out = fn(x)
            s = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(x.dtype)
            return (x.at[0, 0, 0].add(s),), None

        (x,), _ = jax.lax.scan(body, a, None, length=ITERS)
        return jnp.sum(x.astype(jnp.float32))

    jax.device_get(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def folded_qblk(qkv, N, C):
    """The pre-r5 sub-lane inference path: split + head-transpose + q-block
    kernel + inverse transpose (what `spatial_attention_qkv` did before the
    packed gate)."""
    B, T, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    bq = A._pick_qblk_fwd(T, C)
    out = A._qblk_fwd_call(fold(q), fold(k), fold(v), bq)
    return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    N, C = 6, 64
    for T, B in [(1024, 32), (4096, 32)]:
        qkv = jnp.asarray(rng.randn(B, T, 3 * N * C) * 0.3, jnp.bfloat16)
        flops = 2 * 2 * B * N * T * T * C
        bqp = A._pick_qblk_pack(T, C)
        assert bqp, f"pack picker must fit T={T}"

        want = folded_qblk(qkv, N, C)
        got = A._pack_fwd_call(qkv, N, C, bqp)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))

        t_fold = timed(lambda x: folded_qblk(x, N, C), qkv)
        t_pack = timed(lambda x: A._pack_fwd_call(x, N, C, bqp), qkv)
        t_disp = timed(lambda x: A.spatial_attention_qkv(x, N, train=False), qkv)
        print(
            f"T={T} B={B}: folded {t_fold*1e3:7.2f} ms {flops/t_fold/1e12:6.1f} TF/s | "
            f"packed bq={bqp} {t_pack*1e3:7.2f} ms {flops/t_pack/1e12:6.1f} TF/s "
            f"({t_fold/t_pack:.2f}x) | dispatch {t_disp*1e3:7.2f} ms | max|d|={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
