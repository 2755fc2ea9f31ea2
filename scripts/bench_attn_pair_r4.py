"""Round-4 experiment: head-PAIR sub-lane attention straight off the fused qkv.

The celeba sampler/train traces (scripts/trace_celeba_r4.py) show ~10 ms/step
(sampler) and ~27+27 ms/step (train) of "data formatting" + HBM-bound loop
fusions, a large part of which is the fold/unfold copies around the native
sub-lane attention path: `spatial_attention_qkv` splits the fused (B, T, 3NC)
projection into q/k/v and head-transposes to (B*N, T, C) before the kernel,
then transposes back (attention.py `folded`/`unfolded`).

Lane-OFFSET BlockSpec views at C=64 are illegal in Mosaic (last block dim must
be ≡0 mod 128 or span the dim — measured round 4, "viewed64"). But a 128-wide
block at a 128-aligned offset is legal and contains exactly TWO C=64 heads
side by side. This kernel takes (1, bq, 128) q blocks / (1, T, 128) k/v blocks
directly out of the fused qkv — zero reshape/transpose/split copies in HBM —
and computes the two heads' attentions per program with in-register lane
slices, writing the (bq, 128) output pair straight into the (B, T, N*C) out.

Run ON TPU: timeout 3000 python scripts/bench_attn_pair_r4.py
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

from vdiff_tpu.ops.attention import _xla_attention, spatial_attention_qkv

ITERS = 10


def _pair_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, C: int):
    """(bq, 2C) q block vs (T, 2C) k/v: two independent C-wide heads."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    outs = []
    for h in range(2):
        sl = slice(h * C, (h + 1) * C)
        s = jnp.dot(q[:, sl], k[:, sl].T, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.dot(p, v[:, sl], preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def pair_attention_qkv(qkv, num_heads: int, C: int, bq: int):
    B, T, threeNC = qkv.shape
    N = num_heads
    NC = N * C
    assert (2 * C) == 128 and NC % 128 == 0 and N % 2 == 0
    nblk = NC // 128  # head pairs
    scale = 1.0 / math.sqrt(C)
    spec_q = pl.BlockSpec((1, bq, 128), lambda b, p, i: (b, i, p), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, T, 128), lambda b, p, i: (b, 0, nblk + p), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, T, 128), lambda b, p, i: (b, 0, 2 * nblk + p), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pair_fwd_kernel, scale=scale, C=C),
        grid=(B, nblk, T // bq),
        in_specs=[spec_q, spec_k, spec_v],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, p, i: (b, i, p), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, NC), qkv.dtype),
    )(qkv, qkv, qkv)


def timed(fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            (x,) = carry
            out = fn(x)
            # chain iterations through a 1-element in-place update (aliased
            # in-scan, ~free) — the out shape differs from the qkv carry
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


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    N, C = 6, 64
    for T, B, bqs in [(4096, 32, (256, 128)), (1024, 32, (512,))]:
        qkv = jnp.asarray(rng.randn(B, T, 3 * N * C) * 0.3, jnp.bfloat16)

        # correctness vs the fused XLA reference at T=1024; at T=4096 the XLA
        # path would materialize 12.9 GB of f32 logits (OOM) — compare against
        # the current native sub-lane path instead (itself parity-tested)
        if T <= 1024:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            tok = lambda a: a.reshape(B, T, N, C)
            want = _xla_attention(tok(q), tok(k), tok(v))
        else:
            want = spatial_attention_qkv(qkv, N, train=False)
        flops = 2 * 2 * B * N * T * T * C

        t_cur = timed(lambda x: spatial_attention_qkv(x, N, train=False), qkv)
        print(f"T={T} B={B}: current path {t_cur*1e3:8.2f} ms  {flops/t_cur/1e12:6.1f} TF/s",
              flush=True)

        for bq in bqs:
            try:
                got = pair_attention_qkv(qkv, N, C, bq)
                err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
                t = timed(lambda x, bq=bq: pair_attention_qkv(x, N, C, bq), qkv)
                print(f"  pair bq={bq}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s  "
                      f"({t_cur/t:.2f}x)  max|d|={err:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  pair bq={bq}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
