"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-idiomatic 'fake backend' the reference lacks (SURVEY.md §4):
multi-device semantics are exercised without hardware.

NB: env vars alone are not enough here — this environment presets
``JAX_PLATFORMS=axon`` (the real-TPU tunnel) and installed pytest plugins can
import jax before this conftest runs, so we use ``jax.config.update`` which
takes effect any time before backend initialization.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare against the fp32 torch reference (its default config
# sets allow_tf32=false): force full-f32 matmuls — JAX's DEFAULT precision is
# bf16-class on both TPU and CPU backends (~1e-1 abs error on a 128-dot).
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.device_count() >= 8, (
    f"expected a virtual 8-device CPU mesh, got {jax.devices()}"
)
