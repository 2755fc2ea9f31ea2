"""Capture a jax.profiler trace of the DDIM sampler step on TPU and print the
op-level time breakdown (parsed on-box via the tensorboard profile plugin —
no TensorBoard UI needed).

Run ON TPU: python scripts/trace_sampler.py [batch]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    from bench import _flagship

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"backend: {jax.default_backend()}  B={B}", flush=True)
    model, diffusion = _flagship(on_tpu=True)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": params}, x_t, t_, y_, train=False)

    labels = (jnp.arange(B, dtype=jnp.float32) % 10) + 1

    @jax.jit
    def sample(r):
        return diffusion.p_sample(denoise_fn, (B, 32, 32, 3), r, label=labels, use_ddim=True)

    jax.block_until_ready(sample(jax.random.key(1)))  # compile + warmup

    import shutil

    logdir = "/tmp/sampler_trace"
    shutil.rmtree(logdir, ignore_errors=True)  # one trace per run
    with jax.profiler.trace(logdir):
        jax.block_until_ready(sample(jax.random.key(2)))

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print(f"xplane files: {xplanes}", flush=True)
    if not xplanes:
        return

    # NOTE: tensorboard_plugin_profile's converter has a broken protobuf
    # import on this box; xprof's is the working one
    from xprof.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
        except Exception as e:
            print(f"[{tool}] failed: {type(e).__name__}: {e}")
            continue
        out = f"/tmp/sampler_{tool}.json"
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] -> {out} ({os.path.getsize(out)} bytes)", flush=True)


if __name__ == "__main__":
    main()
