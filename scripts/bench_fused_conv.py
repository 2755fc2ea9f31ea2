"""Benchmark the fused GN→SiLU→conv3x3 Pallas kernel vs the XLA composition
at the flagship UNet shapes.

Per-dispatch timing through the axon tunnel pays a ~27 ms RPC round trip that
drowns ~1 ms kernels, so each op is chained K times inside ONE jitted
``lax.scan`` with the output carried as the next input (GN renormalizes every
iteration, so values stay bounded and no iteration can be hoisted or CSE'd).

Run ON TPU: python scripts/bench_fused_conv.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vdiff_tpu.ops.conv3x3 import fused_gn_silu_conv3x3
from vdiff_tpu.ops.groupnorm import gn_film_silu_reference

ITERS = 50


def xla_chain(x, k, b, gamma, beta, fs, fsc, skip):
    h = gn_film_silu_reference(x, gamma, beta, fs, fsc, num_groups=32, eps=1e-6,
                               apply_silu=True)
    out = jax.lax.conv_general_dilated(
        h, k.astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + b.astype(out.dtype)
    if skip is not None:
        out = out + skip
    return out


def timed_scan(op, x, c_in, c_out):
    """Median seconds per op application, chained in one jit."""

    def chain(out):
        if c_in == c_out:
            return out
        reps = c_in // c_out
        return jnp.concatenate([out] * reps, axis=-1)

    @jax.jit
    def run(x0):
        def body(carry, _):
            return chain(op(carry)), None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out

    jax.block_until_ready(run(x))  # compile + warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    B = 128
    rng = np.random.RandomState(0)
    for (H, W, C, CO, film, has_skip) in [
        (32, 32, 256, 256, True, True),   # L0 conv2
        (32, 32, 256, 256, False, False), # L0 conv1
        (32, 32, 512, 256, True, True),   # L0 up-path conv (concat in)
        (16, 16, 256, 256, True, True),   # L1 conv2
        (8, 8, 256, 256, True, True),     # L2 conv2
    ]:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, C, CO) * 0.05, jnp.float32)
        b = jnp.asarray(rng.randn(CO) * 0.1, jnp.float32)
        gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
        fs = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
        fsc = jnp.asarray(rng.randn(B, C) * 0.1, jnp.float32) if film else None
        skip = jnp.asarray(rng.randn(B, H, W, CO), jnp.bfloat16) if has_skip else None

        gn_args = (gamma, beta, fs, fsc)
        fused_op = lambda x: fused_gn_silu_conv3x3(x, k, b, *gn_args, skip)
        xla_op = lambda x: xla_chain(x, k, b, *gn_args, skip)

        err = float(jnp.max(jnp.abs(
            jax.jit(fused_op)(x).astype(jnp.float32) - jax.jit(xla_op)(x).astype(jnp.float32))))
        tf = timed_scan(fused_op, x, C, CO)
        tx = timed_scan(xla_op, x, C, CO)
        flops = B * H * W * 9 * C * CO * 2
        print(
            f"{H}x{W} C{C}->{CO} film={int(film)} skip={int(has_skip)}: "
            f"fused {tf*1e6:8.1f} us ({flops/tf/1e12:6.1f} TF/s)  "
            f"xla {tx*1e6:8.1f} us ({flops/tx/1e12:6.1f} TF/s)  "
            f"speedup {tx/tf:.2f}x  max|d|={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
