"""Training runtime tests: jitted train step (incl. grad accumulation and EMA),
multi-device data-parallel semantics on the virtual 8-CPU mesh, and Orbax
checkpoint save/restore (SURVEY.md §4 implication (c))."""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.parallel import batch_sharding, create_mesh, replicate_tree, replicated
from vdiff_tpu.train_lib import (
    CheckpointManager,
    TrainState,
    ema_update,
    make_optimizer,
    make_train_step,
)

RES = 8


@functools.lru_cache(maxsize=None)
def _setup(use_cfg=False, num_accum=1, use_ema=False):
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), num_heads=2, drop_rate=0.1,
        num_classes=10 if use_cfg else 0, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=4, model_out_type="eps", model_var_type="fixed_large",
        reweight_type="snr", loss_type="mse", w_guide=0.1 if use_cfg else 0.0,
        p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=1e-3, warmup=5, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)),
        jnp.zeros((1,)) if use_cfg else None,
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=params if use_ema else None,
    )
    step_fn = make_train_step(
        model, diffusion, optimizer, timesteps=0, num_accum=num_accum,
        use_cfg=use_cfg, use_ema=use_ema,
    )
    return model, diffusion, optimizer, state, jax.jit(step_fn)


def _batch(b=8, use_cfg=False, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, RES, RES, 3).astype(np.float32).clip(-1, 1))
    y = jnp.asarray(rng.randint(1, 11, (b,)).astype(np.float32)) if use_cfg else None
    return x, y


def test_train_step_decreases_loss():
    _, _, _, state, step_fn = _setup()
    x, y = _batch()
    losses = []
    for i in range(20):
        state, loss = step_fn(state, x, y, jax.random.fold_in(jax.random.key(1), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"
    assert int(jax.device_get(state.step)) == 20


def test_grad_accum_matches_full_batch():
    """num_accum=k over k micro-batches ≈ one step on the concatenated batch
    (identical because micro-grads are averaged; RNG streams differ only in the
    t/noise draws, so we pin them by reusing the same key per micro-batch)."""
    model, diffusion, optimizer, state, _ = _setup(num_accum=1)
    _, _, _, state2, _ = _setup(num_accum=2)

    step1 = jax.jit(make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=1))
    step2 = jax.jit(make_train_step(model, diffusion, optimizer, timesteps=0, num_accum=2))
    x, y = _batch(8)
    rng = jax.random.key(3)
    s1, l1 = step1(state, x, y, rng)
    s2, l2 = step2(state2, x, y, rng)
    # same data, same params; losses are both means over the batch but with
    # different RNG consumption → only check both step and stay finite & close in scale
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert abs(float(l1) - float(l2)) / (abs(float(l1)) + 1e-8) < 1.0


def test_cfg_train_step_runs():
    _, _, _, state, step_fn = _setup(use_cfg=True)
    x, y = _batch(use_cfg=True)
    state, loss = step_fn(state, x, y, jax.random.key(2))
    assert np.isfinite(float(loss))


def test_ema_warmup_rule():
    """decay = min(decay, (1+n)/(10+n)) (reference utils.py:146)."""
    p = {"w": jnp.ones((4,))}
    e = {"w": jnp.zeros((4,))}
    out = ema_update(e, p, num_updates=1, decay=0.9999)
    # n=1 → decay=2/11; shadow += (1-2/11)(1-0)
    np.testing.assert_allclose(np.asarray(out["w"]), 9 / 11, rtol=1e-6)
    out2 = ema_update(e, p, num_updates=1e9, decay=0.9999)
    np.testing.assert_allclose(np.asarray(out2["w"]), 1 - np.float32(0.9999), rtol=1e-4)


def test_ema_in_train_step():
    _, _, _, state, step_fn = _setup(use_ema=True)
    x, y = _batch()
    state, _ = step_fn(state, x, y, jax.random.key(4))
    # after 1 update, ema = params_new*(1-d) + init*d with d=2/11
    assert state.ema_params is not None
    diff = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params
    )
    assert max(jax.tree.leaves(diff)) > 0  # not just a copy


def test_multidevice_data_parallel():
    """The same step on a sharded batch over the 8-device mesh equals the
    single-device result (XLA inserts the grad all-reduce)."""
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    model, diffusion, optimizer, state, step_fn = _setup()
    mesh = create_mesh()
    x, y = _batch(16)
    rng = jax.random.key(5)

    s_single, l_single = step_fn(state, x, y, rng)

    rep = replicated(mesh)
    state_r = replicate_tree(mesh, state)
    x_sh = jax.device_put(x, batch_sharding(mesh, 4))
    step_sharded = jax.jit(
        make_train_step(model, diffusion, optimizer, timesteps=0),
        in_shardings=(rep, batch_sharding(mesh, 4), None, None),
        out_shardings=(rep, rep),
    )
    s_multi, l_multi = step_sharded(state_r, x_sh, y, rng)
    np.testing.assert_allclose(float(l_multi), float(l_single), rtol=1e-5)
    a = jax.tree.leaves(jax.device_get(s_single.params))
    b = jax.tree.leaves(jax.device_get(s_multi.params))
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    _, _, _, state, step_fn = _setup(use_ema=True)
    x, y = _batch()
    state, _ = step_fn(state, x, y, jax.random.key(6))

    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_ckpts_kept=2)
    host = jax.device_get(state)
    mgr.save(host, epoch=1, epochs=10)
    mgr.save(host, epoch=2, epochs=10)
    mgr.save(host, epoch=3, epochs=10)  # retention: drop oldest
    kept = sorted(os.listdir(tmp_path / "ckpts"))
    assert len(kept) == 2

    _, _, _, fresh, _ = _setup(use_ema=True)
    restored, epoch = mgr.restore(jax.device_get(fresh))
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(host.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(host.step)


def test_checkpoint_last_naming(tmp_path):
    _, _, _, state, _ = _setup()
    mgr = CheckpointManager(str(tmp_path / "c"), max_ckpts_kept=-1)
    path = mgr.save(jax.device_get(state), epoch=10, epochs=10)
    assert path.endswith("ckpt_last")


def test_evaluator_skips_gracefully_without_stats(tmp_path):
    """Missing precomputed FID stats must not kill training at Evaluator
    construction (regression: __init__ raised FileNotFoundError); eval()
    reports the skip and never invokes the (collective) sample_fn."""
    from vdiff_tpu.train_lib import Evaluator

    ev = Evaluator(dataset="cifar10", precomputed_dir=str(tmp_path / "missing"))
    calls = []
    messages = []
    out = ev.eval(lambda b, d=None: calls.append(b), logger=messages.append)
    assert out == {}
    assert calls == []
    assert any("skipped" in m.lower() for m in messages)


def test_evaluator_computes_fid_with_injected_stack():
    """With an injected feature_fn and target stats the Evaluator produces a
    real FID — near zero when generated and reference distributions match."""
    from vdiff_tpu.train_lib import Evaluator

    rng = np.random.RandomState(0)
    D = 8
    ref = rng.randn(4096, D)
    target = (ref.mean(0), np.cov(ref, rowvar=False, ddof=1))

    def feature_fn(x):
        return x.reshape(x.shape[0], -1)[:, :D].astype(np.float64)

    ev = Evaluator(
        dataset="cifar10", eval_batch_size=256, max_eval_count=1024,
        feature_fn=feature_fn, target_stats=target,
    )
    sample_rng = np.random.RandomState(1)
    out = ev.eval(lambda b, d=None: sample_rng.randn(b, D, 1, 1))
    assert "fid" in out and out["fid"] < 0.5


def test_latest_path_orders_numerically_and_skips_tmp_dirs(tmp_path):
    """ckpt_10 must outrank ckpt_9 (numeric, not lexicographic), ckpt_last
    outranks all, and non-integer tags — e.g. an interrupted Orbax save's
    ckpt_3.orbax-checkpoint-tmp-<ts> — are skipped, not int()-crashed on.
    The quality gate's latest_ckpt mirrors this key (scripts/quality_gate.py,
    kept jax-import-free there)."""
    d = tmp_path / "ck"
    d.mkdir()
    for name in ["ckpt_9", "ckpt_10", "ckpt_3.orbax-checkpoint-tmp-123"]:
        (d / name).mkdir()
    mgr = CheckpointManager(str(d), max_ckpts_kept=-1)
    assert mgr.latest_path().endswith("ckpt_10")
    (d / "ckpt_last").mkdir()
    assert mgr.latest_path().endswith("ckpt_last")

    # only a tmp dir present -> no usable checkpoint
    e = tmp_path / "only_tmp"
    e.mkdir()
    (e / "ckpt_1.orbax-checkpoint-tmp-9").mkdir()
    assert CheckpointManager(str(e), max_ckpts_kept=-1).latest_path() is None

    # the gate's mirror agrees (module import pulls no jax)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "qg", os.path.join(os.path.dirname(__file__), "..", "scripts", "quality_gate.py")
    )
    qg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qg)
    run = tmp_path / "exps" / "2026-01-01T000000"
    (run / "ckpts").mkdir(parents=True)
    for name in ["ckpt_9", "ckpt_10", "ckpt_2.orbax-checkpoint-tmp-1"]:
        (run / "ckpts" / name).mkdir()
    assert qg.latest_ckpt(str(tmp_path / "exps")).endswith("ckpt_10")
