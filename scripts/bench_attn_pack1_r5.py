"""Round-5: one-head-per-program packed attention (pack1) vs the shipped paths.

The multi-head packed kernels keep every sub-lane head's (bq, T) score tile
live per program, capping T=4096/C=64 at bq=128 fwd (53.4 TF/s measured,
scripts/bench_attn_pack_r5.py) and leaving it with NO packed backward at all
(the training dispatch falls back to the folded layout — ~300 MB of
fold/unfold copies per direction, trace-billed 18.6% of the celeba train
step). pack1 moves the head loop into the grid's innermost dim (pl.when over
static lane slices, full-width accumulating stores), so one head's tile is
live at a time:
  * fwd can take the folded kernel's proven q-block (bq=512 at T=4096 ran
    76 TF/s in-model, scripts/trace_celeba_r4.py) with zero copies;
  * T=4096 gets a real packed BACKWARD (bq=64).

Measures at celeba's two training shapes (B=32, N=6, C=64, bf16):
  fwd:      current dispatch | pack1 at its picker bq and one step down
  fwd+bwd:  current training dispatch | pack1 fwd + pack1 bwd at swept bq

MEASURED (chip, 2026-08-19, pre-wiring — "current dispatch" was the
all-heads-per-program pack family; pack1 superseded it on these numbers):
  T=1024 fwd:  dispatch 3.87 ms | pack bq=256 3.78 | pack1 bq=512 3.58 (win)
  T=1024 train: dispatch 6.50 ms | pack1 f512/b256 5.64 (1.15x) | f512/b128 6.32
  T=4096 fwd:  dispatch 15.48 ms | pack bq=256 14.52 | pack1 bq=512 14.19 (win)
  T=4096 train: dispatch(folded) 57.46 ms | pack1 f512/b64 64.85 (LOSS → the
    _PACK1_BWD_MIN_BQ=128 training gate keeps T=4096 folded)
All variants bit-exact vs dispatch (max|d|=0.0).

Run ON TPU: timeout 4800 python scripts/bench_attn_pack1_r5.py
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
B, N, C = 32, 6, 64


def timed(fn, x):
    @jax.jit
    def run(x):
        def body(carry, _):
            (x,) = carry
            out = fn(x)
            s = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(x.dtype)
            return (x.at[0, 0, 0].add(s),), None

        (x,), _ = jax.lax.scan(body, (x,), None, length=ITERS)
        return jnp.sum(x.astype(jnp.float32))

    try:
        jax.device_get(run(x))
    except Exception as e:  # noqa: BLE001 — report compile/OOM per variant
        return None, f"{type(e).__name__}: {str(e)[:140]}"
    t0 = time.perf_counter()
    jax.device_get(run(x))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, None


def timed_vjp(fn, x):
    def once(x):
        out, vjp = jax.vjp(fn, x)
        (dx,) = vjp(out)
        return dx

    @jax.jit
    def run(x):
        def body(carry, _):
            (x,) = carry
            dx = once(x)
            s = (jnp.sum(dx.astype(jnp.float32)) * 1e-12).astype(x.dtype)
            return (x.at[0, 0, 0].add(s),), None

        (x,), _ = jax.lax.scan(body, (x,), None, length=ITERS)
        return jnp.sum(x.astype(jnp.float32))

    try:
        jax.device_get(run(x))
    except Exception as e:  # noqa: BLE001
        return None, f"{type(e).__name__}: {str(e)[:140]}"
    t0 = time.perf_counter()
    jax.device_get(run(x))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, None


def report(name, dt_err, T, flops):
    dt, err = dt_err
    if dt is None:
        print(f"  {name:32s}: FAILED {err}", flush=True)
        return
    print(f"  {name:32s}: {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TF/s", flush=True)


def pack1_trainable(bq_fwd, bq_bwd):
    """fn(qkv) differentiable via the pack1 kernels at EXPLICIT bq picks (the
    product path, pack1_attention_trainable, uses the pickers — this helper
    exists to sweep bq around them)."""

    @jax.custom_vjp
    def f(qkv):
        return A._pack1_fwd_call(qkv, N, C, bq_fwd)

    def fwd(qkv):
        return f(qkv), qkv

    def bwd(qkv, g):
        dq, dk, dv = A._pack1_bwd_call(qkv, g, N, C, bq_bwd)
        return (jnp.concatenate(
            [dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1),)

    f.defvjp(fwd, bwd)
    return f


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(5)

    for T in (1024, 4096):
        qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.3,
                          jnp.bfloat16)
        # attention matmul FLOPs: 2 matmuls × 2·T²·C per head × B·N (fwd);
        # bwd ≈ 2.5× fwd (5 matmuls incl. s recompute)
        f_fwd = 2 * 2 * T * T * C * B * N
        f_tot = f_fwd * 3.5

        print(f"T={T}:", flush=True)
        # -- forward variants
        cur = lambda x: A.spatial_attention_qkv(x, N, use_flash=True, train=False)
        report("fwd current dispatch", timed(cur, qkv), T, f_fwd)
        want = cur(qkv)

        bq1 = A._pick_qblk_pack1(T, C)
        cands = [bq1] + ([bq1 // 2] if bq1 >= 256 else [])
        if T == 4096 and 512 not in cands:
            cands.insert(0, 512)  # probe the folded kernel's proven pick
        for bq in cands:
            if bq and T % bq == 0:
                fn = lambda x, bq=bq: A._pack1_fwd_call(x, N, C, bq)
                try:
                    got = fn(qkv)
                    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
                except Exception as e:  # noqa: BLE001
                    print(f"  fwd pack1 bq={bq:3d}                : FAILED "
                          f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                    continue
                report(f"fwd pack1 bq={bq} (max|d|={d:.1e})", timed(fn, qkv), T, f_fwd)

        # -- training (fwd+bwd) variants
        cur_t = lambda x: A.spatial_attention_qkv(x, N, use_flash=True, train=True)
        report("train current dispatch", timed_vjp(cur_t, qkv), T, f_tot)

        bqb = A._pick_qblk_pack1_bwd(T, C)
        for bq_f, bq_b in {(bq1, bqb), (bq1, max(32, bqb // 2) if bqb else 0)}:
            if bq_f and bq_b:
                fn = pack1_trainable(bq_f, bq_b)
                report(f"train pack1 f{bq_f}/b{bq_b}", timed_vjp(fn, qkv), T, f_tot)

        # kv-blocked backward (flash-style, lse+out residuals) at the picker
        # pair and one bq step down — the candidate for shapes the full-row
        # backward loses (T=4096)
        bq_kv, bkv = A._pick_qblk_pack1_kv(T, C)
        if bq_kv:
            fn = lambda x: A.pack1_attention_trainable_kv(x, N, C)
            try:
                g = jax.vjp(fn, qkv)[1](fn(qkv))[0]
                cur_g = jax.vjp(cur_t, qkv)[1](cur_t(qkv))[0]
                d = float(jnp.max(jnp.abs(g.astype(jnp.float32) - cur_g.astype(jnp.float32))))
            except Exception as e:  # noqa: BLE001
                print(f"  train pack1-kv: FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)
            else:
                report(f"train pack1-kv f{bq1}/b{bq_kv}x{bkv} (max|dg|={d:.1e})",
                       timed_vjp(fn, qkv), T, f_tot)


if __name__ == "__main__":
    main()
