"""Headline benchmark: CIFAR-10 samples/sec/chip at 256-step DDIM, plus a
training-throughput line (img/s/chip on the same flagship config) and the
celeba.json-scale (301M-param, 64x64) sampling/training lines.

Runs the flagship conditional UNet (cifar10_cond.json shapes: hid=256,
ch_mult [1,1,1], 3 res blocks, attn (F,T,T)) through the full jitted
lax.scan DDIM sampler (CFG disabled at w=0, matching the FID-2.58 headline
condition) and reports throughput. Before that, it runs the full jitted train
step (loss + grad + Adam + EMA, bf16 activations, rbg PRNG — train.py's TPU
defaults) on synthetic batches and reports img/s/chip.

``vs_baseline``: the reference publishes no throughput numbers (SURVEY.md §6),
so baselines are documented engineering estimates of the torch reference on an
A100 at fp32 (its shipped config: allow_tf32=false). Sampling: ~32
GFLOPs/UNet-forward × 256 steps ≈ 8.2 TFLOPs/sample; at ~35% fp32 utilization
(6.8 TF/s) → ≈ 0.83 samples/s. Training: ~3× forward FLOPs/image ≈ 96 GFLOPs;
at the same utilization → ≈ 71 img/s.

Prints one JSON line per metric; the HEADLINE (sampling) line is LAST:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# deterministic platform pin (the hosted sitecustomize clobbers JAX_PLATFORMS;
# see vdiff_tpu/__init__.py) — bench.py touches jax before importing vdiff_tpu
if os.environ.get("VDIFF_JAX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VDIFF_JAX_PLATFORM"])

BASELINE_SAMPLES_PER_SEC = 0.83  # torch reference, A100 fp32 estimate (see docstring)
BASELINE_TRAIN_IMG_PER_SEC = 71.0  # same estimate applied to the train step

# v5e bf16 peak (datasheet 197 TF/s bf16) — every line also reports MEASURED
# utilization: model_tf_per_sec = XLA-cost-analysis FLOPs of the executed
# program (so remat recompute counts as work; scan bodies scaled by their
# static trip counts — see _compile_with_flops) / wall time / chips, and
# mfu = model_tf_per_sec / peak (TPU runs only; meaningless for CPU smoke).
V5E_BF16_PEAK_TFS = 197.0


def _compile_with_flops(jitted, *args, scan_trips=1):
    """AOT-compile once; return ``(runnable, flops)``.

    The compiled executable is returned (and used by the caller for warmup
    AND timing) so cost analysis does not pay a second compile — a plain
    ``jitted.lower().compile()`` result never lands in jit's dispatch cache,
    and celeba-scale compiles take minutes on this box. Falls back to the
    jit wrapper (flops=None) if AOT compilation fails.

    ``scan_trips``: XLA ``cost_analysis()`` counts a ``while``/``scan`` body
    ONCE, not × trip count — BENCH_r04's mfu fields were wrong by exactly the
    trip count (×256 sampler scan / ×n_steps train scan; VERDICT r4 weak #1).
    Callers whose program is dominated by one top-level scan pass its static
    trip count here and the body-once FLOPs are scaled to whole-program FLOPs.
    (Non-scan prologue ops — the initial noise draw, state plumbing — are also
    scaled, but they are FLOPs-negligible vs one UNet step.) Pinned by
    tests/test_bench.py::test_compile_with_flops_counts_scan_trips, which
    fails both if the multiply is dropped AND if XLA starts counting trips
    itself (the multiply would then double-count and must be removed)."""
    try:
        c = jitted.lower(*args).compile()
    except Exception:
        return jitted, None
    try:
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        f = f * scan_trips if f > 0 else None
    except Exception:
        f = None
    return c, f


def _util_fields(flops_per_exec, execs_per_sec, on_tpu):
    """{model_tf_per_sec, mfu} for a bench line (VERDICT r3 next #5)."""
    if not flops_per_exec:
        return {}
    tfs = flops_per_exec * execs_per_sec / 1e12 / jax.device_count()
    # 4 significant decimals below 1 TF/s so CPU smoke lines don't print a
    # misleading 0.0 (they are documented as meaningless for MFU anyway)
    fields = {"model_tf_per_sec": round(tfs, 1 if tfs >= 1 else 4)}
    if on_tpu:
        fields["mfu"] = round(tfs / V5E_BF16_PEAK_TFS, 3)
    return fields

# celeba.json (301.38M params, 64x64): forward = 207.46 GFLOPs/image (XLA cost
# analysis, scripts/celeba_probe_tpu.py). Same A100-fp32 estimate method:
# sampling 207.46 GF x 256 steps = 53.1 TF/sample at 6.8 TF/s → 0.128/s;
# training ~3x fwd = 622 GF/img → 10.9 img/s.
BASELINE_CELEBA_SAMPLES_PER_SEC = 0.128
BASELINE_CELEBA_TRAIN_IMG_PER_SEC = 10.9


def bench_session_canary(on_tpu: bool):
    """Chip-rate canary: a jitted 64-trip ``lax.scan`` of 4096³ bf16 matmuls.
    The chain stays on-device — a Python loop of single matmul dispatches
    through the axon tunnel is dispatch-latency-bound and reads ~1 TF/s on a
    healthy chip (RUNLOG_TPU.md r5, same failure mode as
    scripts/check_train_timing.py). Rounds 4-5 saw ~10% TRAIN-side-only
    session-to-session swings (celeba train 99.8-110.4 on identical code);
    this line pins each BENCH artifact's session speed so cross-round deltas
    are attributable to code vs chip state."""
    n = 4096 if on_tpu else 64
    trips = 64 if on_tpu else 2
    x = (jnp.ones((n, n), jnp.bfloat16) / n)
    w = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(c, _):
            # rescale keeps the chained values finite in bf16
            return jnp.dot(c, w, preferred_element_type=jnp.bfloat16) * (1.0 / n), None
        return jax.lax.scan(body, x, None, length=trips)[0]

    jax.device_get(chain(x, w))  # compile + warm
    t0 = time.perf_counter()
    out = chain(x, w)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    tfs = round(2 * n**3 * trips / dt / 1e12 / jax.device_count(), 3)
    print(json.dumps({
        "metric": "session_canary_matmul_tf_per_sec", "value": tfs,
        "unit": "TF/s/chip",
        "note": "v5e bf16 peak 197; r5-era healthy sessions ~170-190",
    }), flush=True)


def _flagship(on_tpu: bool):
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule

    hid = 256 if on_tpu else 32
    model = UNet(
        in_channels=3,
        hid_channels=hid,
        out_channels=3,
        ch_multipliers=(1, 1, 1),
        num_res_blocks=3,
        apply_attn=(False, True, True),
        drop_rate=0.2,
        num_heads=1,
        num_classes=10,
        use_flash=on_tpu,
        dtype=jnp.bfloat16 if on_tpu else None,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=256 if on_tpu else 4,
        model_out_type="v",
        model_var_type="fixed_medium",
        reweight_type="snr_trunc",
        loss_type="mse",
        intp_frac=0.3,
        w_guide=0.0,  # headline FID 2.58 condition (w=0): no CFG doubling
        p_uncond=0.1,
    )
    return model, diffusion


def bench_train(on_tpu: bool):
    """Full train step (cifar10_cond recipe: CFG dropout, EMA, grad clip) on
    synthetic batches — the reproducible artifact behind the ~1070 img/s/chip
    round-1 number (VERDICT r1 missing #4).

    The K steps are chained inside ONE jitted ``lax.scan``: timing a Python
    loop of donated-state dispatches under the axon tunnel is unreliable —
    ``block_until_ready`` on the chain returns early and reports a ~7x
    impossible throughput (cross-checked in scripts/check_train_timing.py)."""
    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")  # train.py default
    model, diffusion = _flagship(on_tpu)
    # B=192 is the measured throughput optimum (scripts/bench_train_r3.py:
    # 1174 @ 192 vs 1151 @ 128 vs 1149 @ 256 with f32-mask dropout; the
    # uint16 EfficientDropout stack lands ~1197 @ 192)
    batch = 192 if on_tpu else 8
    optimizer = make_optimizer(lr=2e-4, warmup=5000, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step_fn = make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1,
                              use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (batch, 32, 32, 3), jnp.float32, -1, 1)
    y = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1
    n_steps = 20 if on_tpu else 2

    @jax.jit
    def scan_steps(state, rng):
        def body(st, k):
            st, loss = step_fn(st, x, y, k)
            return st, loss
        return jax.lax.scan(body, state, jax.random.split(rng, n_steps))

    # scan_trips: the jitted program is ONE lax.scan over n_steps train steps;
    # cost analysis counts the body (= one step) once
    run, flops = _compile_with_flops(scan_steps, state, jax.random.key(2),
                                     scan_trips=n_steps)
    state, losses = run(state, jax.random.key(2))  # warmup
    jax.device_get(losses)  # forced sync (see bench_sampling note)
    t0 = time.perf_counter()
    state, losses = run(state, jax.random.key(3))
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / n_steps
    img_per_sec_chip = batch / dt / jax.device_count()
    value = round(img_per_sec_chip, 1)
    print(
        json.dumps(
            {
                "metric": "cifar10_train_img_per_sec_per_chip_bf16",
                "value": value,
                "unit": "img/s/chip",
                "vs_baseline": round(value / BASELINE_TRAIN_IMG_PER_SEC, 2),
                **_util_fields((flops or 0) / n_steps, 1 / dt, on_tpu),
            }
        ),
        flush=True,
    )


def bench_sampling(on_tpu: bool, w_guide: float, metric: str, baseline: float,
                   baseline_key: str = "vs_baseline"):
    """256-step DDIM sampling throughput. ``w_guide=0`` is the headline FID-2.58
    condition; ``w_guide=0.1`` exercises the CFG-doubled path (two model
    evaluations per step via concat doubling).

    Batches are the measured throughput optima on v5e (scripts/
    bench_sampling_batch.py sweeps — per-sample efficiency decreases with
    batch at these shapes; absolute values are from the revisions the sweeps
    ran at): w=0 optimum B=64 (17.0 vs 16.4 @ B=128); CFG optimum B=32
    (8.97 vs 8.56 @ B=64 — the doubled forward then runs at the
    effective-64 sweet spot)."""
    import dataclasses

    batch = (32 if w_guide else 64) if on_tpu else 4
    model, diffusion = _flagship(on_tpu)
    if w_guide:
        diffusion = dataclasses.replace(diffusion, w_guide=w_guide)

    rng = jax.random.key(0)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init({"params": rng, "dropout": rng}, x, jnp.zeros((1,)), jnp.zeros((1,)))[
        "params"
    ]

    def denoise_fn(x_t, t_, y_):
        return model.apply({"params": params}, x_t, t_, y_, train=False)

    labels = (jnp.arange(batch, dtype=jnp.float32) % 10) + 1

    @jax.jit
    def sample(r):
        return diffusion.p_sample(
            denoise_fn, (batch, 32, 32, 3), r, label=labels, use_ddim=True
        )

    # compile + warmup (device_get forces real completion — the tunnel's
    # block_until_ready has been observed returning early in other setups;
    # these numbers are cross-validated against on-chip xprof traces).
    # scan_trips: p_sample is ONE lax.scan over the DDIM timesteps; cost
    # analysis counts the body (= one denoiser forward + step math) once
    run, flops = _compile_with_flops(sample, jax.random.key(1),
                                     scan_trips=diffusion.sample_timesteps)
    jax.device_get(run(jax.random.key(1)))

    n_runs = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(jax.random.key(2 + i))
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / n_runs

    n_chips = jax.device_count()
    samples_per_sec_chip = batch / dt / n_chips
    value = round(samples_per_sec_chip, 3)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": "samples/s/chip",
                baseline_key: round(value / baseline, 2),
                **_util_fields(flops, 1 / dt, on_tpu),
            }
        ),
        flush=True,
    )


def _celeba(on_tpu: bool):
    """celeba.json shapes (reference configs/celeba.json): 301.38M params,
    64x64, multitag CFG, 'both' head, head_dim=64 → padded sub-lane flash.
    CPU smoke uses a structurally-identical miniature."""
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule

    def unet(remat):
        if on_tpu:
            return UNet(
                in_channels=3, hid_channels=192, out_channels=6,
                ch_multipliers=(1, 2, 3, 4), num_res_blocks=3,
                apply_attn=(False, True, True, True), embedding_dim=768,
                drop_rate=0.1, head_dim=64, num_classes=40, multitags=True,
                use_flash=True, dtype=jnp.bfloat16, remat=remat,
            )
        return UNet(
            in_channels=3, hid_channels=32, out_channels=6, ch_multipliers=(1, 2),
            num_res_blocks=1, apply_attn=(False, True), drop_rate=0.1, head_dim=16,
            num_classes=40, multitags=True, use_flash=False, remat=remat,
        )

    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=256 if on_tpu else 2,
        model_out_type="both", model_var_type="fixed_large",
        reweight_type="snr_trunc", loss_type="mse", w_guide=0.0, p_uncond=0.1,
    )
    return unet, diffusion


def bench_celeba_sampling(on_tpu: bool):
    """256-step DDIM at the celeba.json shape — the reference's second
    headline config (README.md:190-239). Params ride as a jit ARGUMENT: a
    closed-over 301M tree embeds as constants and exceeds the axon tunnel's
    remote_compile request limit (HTTP 413)."""
    unet, diffusion = _celeba(on_tpu)
    model = unet(remat=False)
    # B=32 is the measured optimum with the native-width sub-lane kernels
    # (scripts/celeba_probe_r3b.py: 1.674 samples/s/chip @ B=32 vs 1.588
    # @ B=64 — the batch sweep is monotone down here too)
    B = 32 if on_tpu else 2
    res = 64
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, res, res, 3)), jnp.zeros((1,)), jnp.zeros((1, 40)),
    )["params"]
    y = jnp.zeros((B, 40), jnp.float32)

    @jax.jit
    def sample(p, r):
        def denoise(xt, t, y_):
            return model.apply({"params": p}, xt, t, y_, train=False)
        return diffusion.p_sample(denoise, (B, res, res, 3), r, label=y, use_ddim=True)

    run, flops = _compile_with_flops(sample, params, jax.random.key(1),
                                     scan_trips=diffusion.sample_timesteps)
    jax.device_get(run(params, jax.random.key(1)))  # warmup
    n_runs = 2 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(params, jax.random.key(2 + i))
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / n_runs
    value = round(B / dt / jax.device_count(), 3)
    print(json.dumps({
        "metric": "celeba_samples_per_sec_per_chip_ddim256",
        "value": value, "unit": "samples/s/chip",
        "vs_baseline": round(value / BASELINE_CELEBA_SAMPLES_PER_SEC, 2),
        **_util_fields(flops, 1 / dt, on_tpu),
    }), flush=True)
    return params


def bench_celeba_train(on_tpu: bool, params):
    """celeba.json train step at B=48 WITHOUT remat — the round-4 winning
    recipe (scripts/bench_celeba_policy_r4.py: no-remat 107.2 img/s vs 100.9
    selective-remat vs 85.8 full-remat; round-2's OOM that forced remat
    predates the uint16 dropout masks, bf16 GN-backward storage, native-width
    sub-lane attention, and state donation that freed the HBM) at the
    round-5 measured batch optimum (scripts/celeba_batch_probe_r5.py,
    same-session sweep after the kv-blocked packed backward: B=32 122.4 /
    B=48 126.8 / B=64 123.5 img/s/chip). The TrainState is donated —
    input+output states of the 301M model are ~4.8 GB each and coexist
    without donation (OOM)."""
    import functools

    from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

    unet, diffusion = _celeba(on_tpu)
    model = unet(remat=False)
    B = 48 if on_tpu else 2
    res = 64
    optimizer = make_optimizer(lr=3e-4, warmup=1000, grad_norm=1.0)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step_fn = make_train_step(model, diffusion, optimizer, timesteps=0,
                              num_accum=1, use_cfg=True, use_ema=True)
    x = jax.random.uniform(jax.random.key(1), (B, res, res, 3), jnp.float32, -1, 1)
    y = (jax.random.uniform(jax.random.key(2), (B, 40)) < 0.5).astype(jnp.float32)
    n_steps = 8 if on_tpu else 2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_steps(st, r):
        def body(s, k):
            s, loss = step_fn(s, x, y, k)
            return s, loss
        return jax.lax.scan(body, st, jax.random.split(r, n_steps))

    # compile BEFORE any execution: the state is donated, lowering a deleted
    # buffer is not safe. The returned executable is reused for warmup+timing
    # (single compile). No remat → cost-analysis FLOPs are model FLOPs.
    # scan_trips: one lax.scan over n_steps train steps (body counted once).
    run, flops = _compile_with_flops(scan_steps, state, jax.random.key(3),
                                     scan_trips=n_steps)
    state, losses = run(state, jax.random.key(3))
    jax.device_get(losses)
    t0 = time.perf_counter()
    state, losses = run(state, jax.random.key(4))
    jax.device_get(losses)
    dt = (time.perf_counter() - t0) / n_steps
    value = round(B / dt / jax.device_count(), 1)
    print(json.dumps({
        # supersedes r01-r03's "..._per_chip_remat" line (recipe change:
        # remat retired, same model/batch/step semantics)
        "metric": "celeba_train_img_per_sec_per_chip",
        "value": value, "unit": "img/s/chip",
        "vs_baseline": round(value / BASELINE_CELEBA_TRAIN_IMG_PER_SEC, 2),
        **_util_fields((flops or 0) / n_steps, 1 / dt, on_tpu),
    }), flush=True)


def _attempt(fn, name, tries=2):
    """Run a bench section, retrying through transient axon-tunnel flakes
    ('remote_compile ... Broken pipe' etc. — RUNLOG_TPU.md); a section that
    still fails prints an *_error line instead of killing the later sections
    (the headline must print LAST). Returns the section's value or None."""
    for i in range(1, tries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — unattended driver run
            print(json.dumps({"metric": f"{name}_error", "attempt": i,
                              "error": str(e)[:200]}), flush=True)
    return None


def main():
    on_tpu = jax.default_backend() == "tpu"
    _attempt(lambda: bench_session_canary(on_tpu), "session_canary")
    _attempt(lambda: bench_train(on_tpu), "train_bench")
    # celeba lines are best-effort: a tunnel flake on the 301M compiles must
    # not kill the cifar10 headline line

    def celeba():
        celeba_params = bench_celeba_sampling(on_tpu)
        bench_celeba_train(on_tpu, celeba_params)

    _attempt(celeba, "celeba_bench", tries=1)
    # CFG-guided sampling (w=0.1, the FID-3.12 condition): ~2x model FLOPs/step.
    # No measured reference CFG number exists, so the ratio is against the w=0
    # estimate halved (2x FLOPs) — reported as vs_baseline_est, not vs_baseline
    _attempt(lambda: bench_sampling(
        on_tpu, w_guide=0.1,
        metric="cifar10_samples_per_sec_per_chip_ddim256_cfg0.1",
        baseline=BASELINE_SAMPLES_PER_SEC / 2,
        baseline_key="vs_baseline_est",
    ), "cfg_bench")
    # HEADLINE (must be the LAST line): w=0 sampling — retried hardest, and a
    # terminal failure raises so the driver sees a non-zero exit
    for i in range(3):
        try:
            bench_sampling(
                on_tpu, w_guide=0.0,
                metric="cifar10_samples_per_sec_per_chip_ddim256",
                baseline=BASELINE_SAMPLES_PER_SEC,
            )
            break
        except Exception as e:  # noqa: BLE001
            if i == 2:
                raise
            print(json.dumps({"metric": "headline_bench_error", "attempt": i + 1,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
