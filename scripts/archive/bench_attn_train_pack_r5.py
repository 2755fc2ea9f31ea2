"""Round-5: adjudicate the packed TRAINING path per celeba shape.

The first integrated run REGRESSED celeba train (110.4 → 101.9 img/s/chip), so
this decomposes fwd+bwd per variant at both training attention shapes:

  A. folded (pre-r5): split + head-transpose, flash_attention_trainable
  B. packed (r5): pack_attention_trainable (packed fwd; packed bwd where the
     q-block fits, else folded-bwd fallback)
  C. packed fwd + folded bwd forced (isolates the packed backward kernel)

Run ON TPU: timeout 3000 python scripts/bench_attn_train_pack_r5.py
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


def timed_vjp(fn, qkv):
    def run_once(x):
        out, vjp = jax.vjp(fn, x)
        (dx,) = vjp(out)
        return jnp.sum(dx.astype(jnp.float32))

    @jax.jit
    def run(x):
        def body(carry, _):
            (x,) = carry
            s = (run_once(x) * 1e-12).astype(x.dtype)
            return (x.at[0, 0, 0].add(s),), None

        (x,), _ = jax.lax.scan(body, (x,), None, length=ITERS)
        return jnp.sum(x.astype(jnp.float32))

    jax.device_get(run(qkv))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(qkv))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def folded_train(qkv, N, C):
    """Pre-r5 training branch: fold → flash_attention_trainable → unfold."""
    B, T, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
    out = A.flash_attention_trainable(fold(q), fold(k), fold(v))
    return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    N, C = 6, 64
    for T, B in [(1024, 32), (4096, 32)]:
        qkv = jnp.asarray(rng.randn(B, T, 3 * N * C) * 0.3, jnp.bfloat16)
        # fwd 2 matmuls + bwd 5 (dp, ds·k, ds·q, p·do, recomputed s) per head
        flops = (2 + 5) * 2 * B * N * T * T * C

        # grad parity packed-vs-folded first (bf16, loose)
        gA = jax.vjp(lambda x: folded_train(x, N, C), qkv)[1](
            jnp.ones((B, T, N * C), qkv.dtype))[0]
        gB = jax.vjp(lambda x: A.pack_attention_trainable(x, N, C), qkv)[1](
            jnp.ones((B, T, N * C), qkv.dtype))[0]
        err = float(jnp.max(jnp.abs(gA.astype(jnp.float32) - gB.astype(jnp.float32))))

        tA = timed_vjp(lambda x: folded_train(x, N, C), qkv)
        tB = timed_vjp(lambda x: A.pack_attention_trainable(x, N, C), qkv)
        bq_bwd = A._pick_qblk_pack_bwd(T, C)
        line = (f"T={T} B={B}: folded {tA*1e3:7.2f} ms {flops/tA/1e12:5.1f} TF/s | "
                f"packed(bwd bq={bq_bwd}) {tB*1e3:7.2f} ms {flops/tB/1e12:5.1f} TF/s "
                f"({tA/tB:.2f}x) | max|dg|={err:.2e}")
        if bq_bwd:
            orig = A._pick_qblk_pack_bwd
            A._pick_qblk_pack_bwd = lambda t, c: 0
            try:
                tC = timed_vjp(lambda x: A.pack_attention_trainable(x, N, C), qkv)
                line += f" | packfwd+foldbwd {tC*1e3:7.2f} ms ({tA/tC:.2f}x)"
            finally:
                A._pick_qblk_pack_bwd = orig
        print(line, flush=True)


if __name__ == "__main__":
    main()
