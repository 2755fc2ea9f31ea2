"""Round-4c: re-measure the celeba bench lines after the attention-kernel
integration (native-dtype bwd operands + inference q-block budget for the
training forward, vdiff_tpu/ops/attention.py; kernel-level: T=4096 fwd+bwd
56.7 -> 44.1 ms for B=32, scripts/bench_attn_integration_r4.py).

Runs exactly the two celeba sections of bench.py (same harness, same JSON
lines) without paying for the CIFAR compiles.

Run ON TPU: timeout 4000 python scripts/bench_celeba_r4c.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import bench_celeba_sampling, bench_celeba_train


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    params = bench_celeba_sampling(on_tpu)
    bench_celeba_train(on_tpu, params)


if __name__ == "__main__":
    main()
