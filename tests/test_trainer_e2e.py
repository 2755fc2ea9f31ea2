"""End-to-end Trainer smoke test on the synthetic dataset (SURVEY.md §4
implication (d)): epochs run, images render, checkpoints save and resume."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdiff_tpu.data import ArrayDataset, DataLoader
from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.train_lib import Trainer


def _tiny_trainer(tmp_path, epochs=2, use_cfg=True):
    rng = np.random.RandomState(0)
    ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=rng.randint(1, 5, (32,)).astype(np.int64),
    )
    loader = DataLoader(ds, batch_size=16, seed=0)
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(True,), num_heads=1, drop_rate=0.0,
        num_classes=4 if use_cfg else 0, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.1 if use_cfg else 0.0, p_uncond=0.1,
    )
    return Trainer(
        model=model,
        diffusion=diffusion,
        timesteps=0,
        epochs=epochs,
        trainloader=loader,
        optimizer_config=dict(lr=1e-3, warmup=2),
        use_cfg=use_cfg,
        use_ema=True,
        num_accum=1,
        shape=(8, 8, 3),
        ckpt_intv=1,
        max_ckpts_kept=2,
        image_intv=1,
        eval_intv=1000,
        num_save_images=4,
        seed=0,
    )


def test_trainer_end_to_end(tmp_path):
    trainer = _tiny_trainer(tmp_path)
    image_dir = str(tmp_path / "images")
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(image_dir, exist_ok=True)
    trainer.train(evaluator=None, ckpt_dir=ckpt_dir, image_dir=image_dir, use_ddim=True)

    assert len(glob.glob(os.path.join(image_dir, "*.png"))) == 2
    assert len(os.listdir(ckpt_dir)) == 2  # retention keeps 2
    assert float(jax.device_get(trainer.state.step)) == 2 * 2  # 2 epochs x 2 batches
    stats = trainer.current_stats
    assert np.isfinite(stats["loss"])

    # resume into a fresh trainer
    trainer2 = _tiny_trainer(tmp_path, epochs=3)
    trainer2.load_checkpoint(ckpt_dir=ckpt_dir)
    assert trainer2.start_epoch == 2
    for a, b in zip(
        jax.tree.leaves(jax.device_get(trainer2.state.params)),
        jax.tree.leaves(jax.device_get(trainer.state.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_sample_fn_over_mesh(tmp_path):
    """num_save_images divisible by the 8-device mesh → shard_map path."""
    trainer = _tiny_trainer(tmp_path)
    out = trainer.sample_fn(batch_size=16, use_ddim=True)
    assert out.shape == (16, 8, 8, 3)
    assert np.all(np.isfinite(out))
    # per-shard rng folding must give distinct shards
    assert not np.allclose(out[:2], out[2:4])


def test_trainer_sample_labels_balanced(tmp_path):
    trainer = _tiny_trainer(tmp_path)
    labels = np.asarray(trainer.sample_labels())
    assert labels.shape == (4,)
    assert set(labels.tolist()) == {1.0, 2.0, 3.0, 4.0}


def test_sample_fn_pads_non_divisible_batch(tmp_path):
    """B=10 over the 8-device mesh: padded to 16 on-device, sliced back to 10."""
    trainer = _tiny_trainer(tmp_path)
    out = trainer.sample_fn(batch_size=10, use_ddim=True)
    assert out.shape == (10, 8, 8, 3)
    assert np.all(np.isfinite(out))


def _tiny_multitag_trainer(tmp_path, num_tags=4):
    rng = np.random.RandomState(0)
    ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=(rng.rand(32, num_tags) < 0.5).astype(np.float32),
    )
    loader = DataLoader(ds, batch_size=16, seed=0)
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(True,), num_heads=1, drop_rate=0.0,
        num_classes=num_tags, multitags=True, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.1, p_uncond=0.1,
    )
    return Trainer(
        model=model, diffusion=diffusion, timesteps=0, epochs=1,
        trainloader=loader, optimizer_config=dict(lr=1e-3), use_cfg=True,
        num_accum=1, shape=(8, 8, 3), num_save_images=4, seed=0,
    )


def test_sample_fn_multitag_label_padding(tmp_path):
    """Multitag labels are (B, K); B=10 over the 8-device mesh pads to 16 —
    the pad must preserve label rank (regression: 1-D zeros crashed here)."""
    trainer = _tiny_multitag_trainer(tmp_path)
    labels = jnp.asarray((np.random.RandomState(1).rand(10, 4) < 0.5).astype(np.float32))
    out = trainer.sample_fn(label=labels, batch_size=10, use_ddim=True)
    assert out.shape == (10, 8, 8, 3)
    assert np.all(np.isfinite(out))


def test_multitag_sample_labels_draws_tag_rows(tmp_path):
    trainer = _tiny_multitag_trainer(tmp_path)
    labels = np.asarray(trainer.sample_labels())
    assert labels.shape == (4, 4)
    assert set(np.unique(labels)).issubset({0.0, 1.0})


def test_in_training_eval_samples_conditionally(tmp_path):
    """The in-training FID must sample the HEADLINE condition for CFG models:
    class-conditional labels drawn per eval batch, guidance w=0 (reference
    generate.py:118-136; its own Evaluator passes an int as labels —
    train_utils.py:375 — so this is intent, not translation)."""
    import dataclasses

    from vdiff_tpu.train_lib import Evaluator

    trainer = _tiny_trainer(tmp_path, epochs=1)
    trainer.eval_intv = 1

    rng = np.random.RandomState(0)
    D = 8
    ref = rng.randn(1024, D)
    ev = Evaluator(
        dataset="cifar10", eval_batch_size=8, max_eval_count=8,
        feature_fn=lambda x: x.reshape(x.shape[0], -1)[:, :D].astype(np.float64),
        target_stats=(ref.mean(0), np.cov(ref, rowvar=False, ddof=1)),
        diffusion=dataclasses.replace(trainer.diffusion, w_guide=0.0),
    )

    seen = []
    orig = trainer.sample_fn

    def spy(label=None, batch_size=None, use_ddim=False, diffusion=None, seed_key=None):
        seen.append((label, diffusion))
        return orig(label=label, batch_size=batch_size, use_ddim=use_ddim,
                    diffusion=diffusion, seed_key=seed_key)

    trainer.sample_fn = spy
    trainer.train(evaluator=ev, use_ddim=True)

    eval_calls = [(y, d) for y, d in seen if d is not None]
    assert len(eval_calls) == 2  # max_eval_count 8 + batch 8 → two batches
    for y, d in eval_calls:
        assert y is not None, "CFG model must eval-sample conditionally"
        y = np.asarray(y)
        assert y.shape == (8,)
        assert set(np.unique(y)).issubset({1.0, 2.0, 3.0, 4.0})
        assert d.w_guide == 0.0  # headline FID condition: conditional, w=0
    # label draws differ across eval batches (per-batch rng folding)
    assert not np.array_equal(np.asarray(eval_calls[0][0]), np.asarray(eval_calls[1][0]))

    # unconditional models keep sampling label-free
    trainer_u = _tiny_trainer(tmp_path, epochs=1, use_cfg=False)
    trainer_u.eval_intv = 1
    seen_u = []
    orig_u = trainer_u.sample_fn

    def spy_u(label=None, batch_size=None, use_ddim=False, diffusion=None, seed_key=None):
        seen_u.append((label, diffusion))
        return orig_u(label=label, batch_size=batch_size, use_ddim=use_ddim,
                      diffusion=diffusion, seed_key=seed_key)

    trainer_u.sample_fn = spy_u
    ev2 = Evaluator(
        dataset="cifar10", eval_batch_size=8, max_eval_count=8,
        feature_fn=lambda x: x.reshape(x.shape[0], -1)[:, :D].astype(np.float64),
        target_stats=(ref.mean(0), np.cov(ref, rowvar=False, ddof=1)),
    )
    trainer_u.train(evaluator=ev2, use_ddim=True)
    assert all(y is None for y, d in seen_u if d is None)


def test_sample_fn_cache_keys_on_diffusion_config(tmp_path):
    """Two distinct diffusion configs must never share a compiled sampler
    (the old id()-based key could collide after GC)."""
    import dataclasses

    trainer = _tiny_trainer(tmp_path)
    d1 = trainer.diffusion
    d2 = dataclasses.replace(d1, sample_timesteps=3)
    a = trainer.sample_fn(batch_size=16, use_ddim=True, diffusion=d1)
    b = trainer.sample_fn(batch_size=16, use_ddim=True, diffusion=d2)
    keys = list(trainer._sample_jit)
    assert len(keys) == 2 and keys[0] != keys[1]
    # same config object again → cache hit, no third entry
    trainer.sample_fn(batch_size=16, use_ddim=True, diffusion=d1)
    assert len(trainer._sample_jit) == 2
    # an equal-valued copy must also hit (value semantics, not identity)
    d1_copy = dataclasses.replace(d1)
    trainer.sample_fn(batch_size=16, use_ddim=True, diffusion=d1_copy)
    assert len(trainer._sample_jit) == 2
    assert a.shape == b.shape == (16, 8, 8, 3)
