"""Round-4 celeba efficiency attack, step 1: trace BOTH the celeba sampler
and the remat train step on TPU and print per-category time/FLOP-rate tables
(VERDICT r3 next #1 — celeba runs at ~45%/'27%' MFU vs cifar's 76%/59%;
find exactly where the non-conv / low-rate time is before changing code).

Run ON TPU: timeout 3000 python scripts/trace_celeba_r4.py [sampler|train]
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def summarize(path, top_ops=18):
    """Print a per-category table + top self-time ops from an hlo_stats JSON
    (gviz DataTable layout: {cols: [{label}...], rows: [{c: [{v}...]}...]})."""
    with open(path) as f:
        data = json.loads(f.read())
    # index BOTH the label and the id of each column (tool versions differ on
    # which spelling they emit — "HLO op category" label vs "category" id)
    idx = {}
    for i, c in enumerate(data["cols"]):
        for key in (c.get("label"), c.get("id")):
            if key:
                idx.setdefault(key, i)

    def col(row, *names, default=None):
        for n in names:
            if n in idx:
                v = row["c"][idx[n]]
                return None if v is None else v.get("v")
        return default

    rows = data["rows"]
    cat_time, cat_flops = {}, {}
    ops = []
    for r in rows:
        cat = col(r, "HLO op category", "category") or "?"
        # SELF time — total_time double-counts loop bodies into the while op
        t = float(col(r, "Total self time (us)", "total_self_time", default=0) or 0)
        occ = float(col(r, "#Occurrences", "occurrences", default=1) or 1)
        gfs = float(col(r, "Model GFLOP/s", "model_flop_rate", default=0) or 0)
        bw = float(col(r, "Measured memory BW (GiB/s)", "measured_memory_bw", default=0) or 0)
        bound = col(r, "Bound by", "bound_by") or "?"
        name = col(r, "HLO op name", "hlo_op_name") or "?"
        src = re.sub(r"<[^>]*>", "", col(r, "Source Info", "source_info") or "")
        cat_time[cat] = cat_time.get(cat, 0.0) + t
        cat_flops[cat] = cat_flops.get(cat, 0.0) + t * gfs  # GF
        ops.append((t, occ, gfs, bw, bound, cat, name, src))

    total = sum(cat_time.values()) or 1.0
    print(f"\n=== {path}: total device self time {total/1e3:.2f} ms ===")
    print(f"{'category':<28}{'ms':>9}{'%':>7}{'TF/s':>8}")
    for cat in sorted(cat_time, key=cat_time.get, reverse=True):
        t = cat_time[cat]
        # cat_flops = Σ t(us)·gfs(GF/s): /t gives the time-weighted average
        # GF/s, /1e3 converts to TF/s (matches the per-op gfs/1e3 below)
        rate = cat_flops[cat] / t / 1e3 if t else 0.0
        print(f"{cat:<28}{t/1e3:>9.2f}{100*t/total:>6.1f}%{rate:>8.1f}")
    print("\ntop ops by self time:")
    for t, occ, gfs, bw, bound, cat, name, src in sorted(ops, reverse=True)[:top_ops]:
        print(f"  {t/1e3:8.2f} ms  x{occ:<5.0f} {gfs/1e3:7.2f} TF/s {bw:6.0f} GiB/s "
              f"[{cat}|{bound}] {name}  {src}")


def trace_sampler():
    import dataclasses

    from bench import _celeba

    B = 32
    unet, diffusion = _celeba(on_tpu=True)
    diffusion = dataclasses.replace(diffusion, sample_timesteps=8)
    model = unet(remat=False)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    y = jnp.zeros((B, 40), jnp.float32)

    @jax.jit
    def sample(p, r):
        def denoise(xt, t, y_):
            return model.apply({"params": p}, xt, t, y_, train=False)
        return diffusion.p_sample(denoise, (B, 64, 64, 3), r, label=y, use_ddim=True)

    jax.device_get(sample(params, jax.random.key(1)))

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/celeba_trace_r4")
    with jax.profiler.trace(logdir):
        jax.device_get(sample(params, jax.random.key(2)))
    for p in parse_trace(logdir, "/tmp/celeba_r4", tools=("hlo_stats",)):
        summarize(p)


def trace_train():
    from bench import _celeba
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    B = 32
    unet, diffusion = _celeba(on_tpu=True)
    # no-remat is the round-4 winning recipe (scripts/bench_celeba_policy_r4.py:
    # 107.2 img/s vs 85.8 full-remat at B=32) — trace what we ship
    model = unet(remat=False)
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params),
                       ema_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1,
                           use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, 64, 64, 3), jnp.float32, -1, 1)
    y = (jax.random.uniform(jax.random.key(2), (B, 40)) < 0.5).astype(jnp.float32)
    K = 2

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(st, r):
        def body(s, k):
            s, loss = step(s, x, y, k)
            return s, loss
        return jax.lax.scan(body, st, jax.random.split(r, K))

    # device_get, not block_until_ready — the tunnel's block_until_ready has
    # been observed returning early (memory notes / bench.py), which here
    # would close the profiler context before the step finished
    state, losses = steps(state, jax.random.key(3))
    jax.device_get(losses)

    from trace_common import fresh_logdir, parse_trace

    logdir = fresh_logdir("/tmp/celeba_train_trace_r4")
    with jax.profiler.trace(logdir):
        state, losses = steps(state, jax.random.key(4))
        jax.device_get(losses)
    for p in parse_trace(logdir, "/tmp/celeba_train_r4", tools=("hlo_stats",)):
        summarize(p)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    print(f"backend: {jax.default_backend()}", flush=True)
    if which in ("sampler", "both"):
        trace_sampler()
    if which in ("train", "both"):
        trace_train()
