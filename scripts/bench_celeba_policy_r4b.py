"""Round-4 celeba train follow-up: bench_celeba_policy_r4.py found no-remat
now FITS at B=32 (107.2 img/s vs full remat's 85.8 — the r2 "OOM without
remat" verdict predates uint16 dropout, bf16 GN storage, native-width
sub-lane attention and state donation). Sweep the no-remat batch frontier
and the conv-policy large-batch corner to pick the one-chip recipe.

Run ON TPU: timeout 5400 python scripts/bench_celeba_policy_r4b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_celeba_policy_r4 import bench_one  # noqa: E402


def main():
    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    for remat, policy, B in [
        (False, None, 48),
        (False, None, 64),
        (True, "conv", 128),
    ]:
        bench_one(remat, policy, B)


if __name__ == "__main__":
    main()
