"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-idiomatic 'fake backend' the reference lacks (SURVEY.md §4):
multi-device semantics are exercised without hardware via
``xla_force_host_platform_device_count``.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity tests compare against the fp32 torch reference (its default config
# sets allow_tf32=false): force full-f32 matmuls — JAX's DEFAULT precision is
# bf16-class on both TPU and this CPU backend (~1e-1 abs error on 128-dot).
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
