"""Round-4 celeba efficiency attack, step 2: quantify the non-128-multiple
channel lane-padding tax with single-op microbenchmarks on the v5e.

The celeba UNet's levels run at 192/384/576/768 channels (configs/celeba.json,
reference configs/celeba.json); 192 = 1.5 lanes and 576 = 4.5 lanes force the
MXU to pad the conv output dim to 256/640 — useful-work ceilings of 75%/90% on
those convs IF the padding is real. This probe measures, per (channels, res):

  a) conv3x3 C->C at the native channel count
  b) conv3x3 at the lane-rounded count (256/640) — MORE FLOPs, no padding

If (b) is FASTER in wall-clock, zero-padding the weights (math-preserving) is
a win and the UNet should compute in padded channels. Also times GN and the
t-FiLM dense at both widths to see whether non-conv ops care.

Run ON TPU: timeout 1800 python scripts/celeba_pad_probe_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 32
N_ITERS = 50  # chained inside one jitted scan — python-loop timing lies here


def _time_scan(fn, *args):
    """Wall time per application of fn, measured over a jitted scan chain."""

    @jax.jit
    def chain(x0):
        def body(x, _):
            return fn(x), ()
        y, _ = jax.lax.scan(body, x0, None, length=N_ITERS)
        # scalar result: device_get of a multi-MB array ships through the
        # tunnel HTTP and poisons the measurement (see memory notes)
        return jnp.sum(y.astype(jnp.float32))

    x0 = args[0]
    jax.device_get(chain(x0))  # compile + warmup
    t0 = time.perf_counter()
    jax.device_get(chain(x0))
    return (time.perf_counter() - t0) / N_ITERS


def bench_conv(res, cin, cout, dtype=jnp.bfloat16):
    k = jax.random.normal(jax.random.key(0), (3, 3, cin, cout), dtype) * 0.02
    x = jax.random.normal(jax.random.key(1), (B, res, res, cin), dtype)

    def conv(x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # fold back to cin so the scan chains; the mean term consumes every
        # output channel so XLA cannot simplify slice(conv) -> conv(sliced k)
        # and skip the tail channels (applied to ALL variants — fair compare)
        return y[..., :cin] + y.mean(axis=-1, keepdims=True)

    dt = _time_scan(conv, x)
    flops = 2 * B * res * res * 9 * cin * cout
    print(f"conv3x3 {res}x{res} {cin:>4}->{cout:<4} {dt*1e6:9.1f} us "
          f"{flops/dt/1e12:7.1f} TF/s", flush=True)
    return dt


def bench_gn(res, c, dtype=jnp.bfloat16):
    from vdiff_tpu.ops.groupnorm import gn_film_silu

    x = jax.random.normal(jax.random.key(1), (B, res, res, c), dtype)
    g = jnp.ones((c,), dtype)
    b = jnp.zeros((c,), dtype)

    def gn(x):
        return gn_film_silu(x, g, b, num_groups=32, eps=1e-6)

    dt = _time_scan(gn, x)
    byts = 2 * x.size * x.dtype.itemsize
    print(f"gn      {res}x{res} {c:>4}       {dt*1e6:9.1f} us "
          f"{byts/dt/1e9:7.1f} GB/s", flush=True)


def main():
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    # level-0/2 shapes (the non-aligned ones) + their lane-rounded variants,
    # and the aligned 384/768 for calibration
    for res, c, cpad in [(64, 192, 256), (32, 384, 384), (16, 576, 640), (8, 768, 768)]:
        t_nat = bench_conv(res, c, c)
        if cpad != c:
            t_pad = bench_conv(res, c, cpad)       # padded output only
            t_pad2 = bench_conv(res, cpad, cpad)   # padded both sides
            print(f"  -> pad win (out only): {t_nat/t_pad:5.2f}x   "
                  f"(both): {t_nat/t_pad2:5.2f}x", flush=True)
    for res, c in [(64, 192), (16, 576)]:
        bench_gn(res, c)
        bench_gn(res, 256 if c == 192 else 640)


if __name__ == "__main__":
    main()
