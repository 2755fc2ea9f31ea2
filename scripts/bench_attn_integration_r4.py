"""Round-4 integration check for the trainable attention kernels.

After integrating (a) native-dtype matmul operands in ``_attn_bwd_kernel_qblk``
(scripts/bench_attn_bwd_r4.py: +7.8% at T=4096/C=64, bit-exact) and (b) the
inference q-block budget for the training FORWARD at large T
(``_pick_qblk_fwd`` → bq=512 ran 76 TF/s in the sampler trace vs the training
picker's bq=64 at 53 TF/s), this times the REAL product entry point —
``jax.vjp`` of ``flash_attention_trainable`` — at the two celeba training
attention shapes and prints ms + TF/s per shape.

Prior per-op baselines from the round-4 train-step trace
(scripts/trace_celeba_r4.py, B=32 no-remat): T=4096 fwd 15.5 ms, bwd 41.2 ms.

Run ON TPU: timeout 3000 python scripts/bench_attn_integration_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.ops.attention import (
    _pick_qblk, _pick_qblk_fwd, flash_attention_trainable,
)

ITERS = 10


def timed(fn, *args):
    """Scan ITERS iterations inside ONE jit (axon dispatch is a network
    roundtrip per call — python-loop timing measures the tunnel, not the
    chip; same pattern as scripts/bench_attn_bwd_r4.py). ``fn`` must map its
    args to a same-structure tuple so the scan can chain them."""
    @jax.jit
    def run(*a):
        def body(carry, _):
            return fn(*carry), None
        out, _ = jax.lax.scan(body, a, None, length=ITERS)
        return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)

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
    for (B, N, T, C) in [(32, 6, 4096, 64), (32, 6, 1024, 64)]:
        BN = B * N
        mk = lambda: jnp.asarray(rng.randn(BN, T, C), jnp.bfloat16)
        q, k, v, do = mk(), mk(), mk(), mk()
        print(f"shape BN={BN} T={T} C={C}: fwd bq={_pick_qblk_fwd(T, C) or _pick_qblk(T, C)}"
              f" bwd bq={_pick_qblk(T, C)}", flush=True)

        fwd_flops = 2 * 2 * BN * T * T * C
        bwd_flops = 5 * 2 * BN * T * T * C

        t_f = timed(
            lambda q_, k_, v_: (flash_attention_trainable(q_, k_, v_), k_, v_), q, k, v)
        print(f"  fwd       : {t_f*1e3:8.2f} ms  {fwd_flops/t_f/1e12:6.1f} TF/s", flush=True)

        def fwd_bwd(q_, k_, v_, do_):
            out, vjp = jax.vjp(lambda a, b, c: flash_attention_trainable(a, b, c), q_, k_, v_)
            dq, dk, dv = vjp(do_)
            return dq, dk, dv, do_

        t_fb = timed(fwd_bwd, q, k, v, do)
        t_b = t_fb - t_f
        print(f"  fwd+bwd   : {t_fb*1e3:8.2f} ms  (bwd ≈ {t_b*1e3:.2f} ms, "
              f"{bwd_flops/t_b/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
