"""FSDP / ZeRO-3 state sharding (beyond-parity: the reference only replicates
the model per device — train.py:129-156 DDP). Verifies on the 8-device CPU mesh
that (a) the leaf placement rule is sane, (b) an FSDP step computes the same
update as the replicated step while storing ~1/8 the state per device, and
(c) the Trainer wiring (jit shardings, sampling, Orbax roundtrip) works with
``fsdp=True`` end-to-end."""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vdiff_tpu.diffusion import GaussianDiffusion
from vdiff_tpu.models.unet import UNet
from vdiff_tpu.ops.numerics import get_logsnr_schedule
from vdiff_tpu.parallel import batch_sharding, create_mesh, replicate_tree, replicated
from vdiff_tpu.parallel.fsdp import (
    leaf_partition_spec,
    state_bytes_per_device,
    state_shardings,
)
from vdiff_tpu.train_lib import TrainState, make_optimizer, make_train_step

RES = 8


def test_leaf_partition_spec_rules():
    # scalars and small leaves stay replicated
    assert leaf_partition_spec((), 8) == P()
    assert leaf_partition_spec((512,), 8) == P()  # bias < min_size
    # conv kernels: trailing-most divisible dim (O of HWIO) — NEVER the input
    # dim, which the concat-free split path slices (round-4 GSPMD rule; a
    # slice along the sharded dim forces involuntary full rematerialization)
    assert leaf_partition_spec((3, 3, 256, 256), 8) == P(None, None, None, "data")
    assert leaf_partition_spec((3, 3, 512, 256), 8) == P(None, None, None, "data")
    # ...unless only the input dim divides
    assert leaf_partition_spec((3, 3, 512, 255), 8) == P(None, None, "data", None)
    # attention token-matmul kernels: contracting dim (dim 2) — output-dim
    # sharding made HSDP's backward dqkv/d(out) concats fall back to full
    # activation rematerialization
    assert leaf_partition_spec((1, 1, 256, 768), 8, path="mid_attn/proj_in/kernel") \
        == P(None, None, "data", None)
    assert leaf_partition_spec((1, 1, 256, 256), 8, path="mid_attn/proj_out/kernel") \
        == P(None, None, "data", None)
    # rank-2 dense kernels: input dim (the FiLM fc's shift/scale split lives
    # on the output dim)
    assert leaf_partition_spec((1024, 512), 8, min_size=0) == P("data", None)
    # nothing divisible -> replicated even when large
    assert leaf_partition_spec((3, 3, 255, 255), 8) == P()
    # min_size override shards small leaves too
    assert leaf_partition_spec((64, 64), 8, min_size=0) == P("data", None)


@functools.lru_cache(maxsize=None)
def _setup():
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), num_heads=2, drop_rate=0.1,
        num_classes=0, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"),
        sample_timesteps=4, model_out_type="eps", model_var_type="fixed_large",
        reweight_type="snr", loss_type="mse", w_guide=0.0, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=1e-3, warmup=5, grad_norm=1.0)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)), None,
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    step_fn = make_train_step(
        model, diffusion, optimizer, timesteps=0, num_accum=1,
        use_cfg=False, use_ema=True,
    )
    return model, diffusion, optimizer, state, step_fn


def test_fsdp_step_matches_replicated():
    """Sharding the state must not change the math: params/EMA after one step
    equal the replicated-state result; per-device state bytes shrink ~8x."""
    assert jax.device_count() >= 8
    model, diffusion, optimizer, state, step_fn = _setup()
    mesh = create_mesh()
    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.randn(16, RES, RES, 3).astype(np.float32).clip(-1, 1))
    rng = jax.random.key(7)

    rep = replicated(mesh)
    bsh = batch_sharding(mesh, 4)
    x_sh = jax.device_put(x, bsh)

    state_r = replicate_tree(mesh, state)
    step_rep = jax.jit(
        step_fn, in_shardings=(rep, bsh, None, None), out_shardings=(rep, rep)
    )
    s_rep, l_rep = step_rep(state_r, x_sh, None, rng)

    # min_size=0: the test model is tiny, shard every divisible leaf
    shardings = state_shardings(mesh, state, min_size=0)
    state_f = jax.device_put(state, shardings)
    bytes_rep = state_bytes_per_device(state_r)
    bytes_fsdp = state_bytes_per_device(state_f)
    assert bytes_fsdp < bytes_rep / 3, (bytes_fsdp, bytes_rep)

    step_fsdp = jax.jit(
        step_fn, in_shardings=(shardings, bsh, None, None),
        out_shardings=(shardings, rep),
    )
    s_fsdp, l_fsdp = step_fsdp(state_f, x_sh, None, rng)

    np.testing.assert_allclose(float(l_fsdp), float(l_rep), rtol=1e-6)
    for name, tree_a, tree_b in (
        ("params", s_rep.params, s_fsdp.params),
        ("ema", s_rep.ema_params, s_fsdp.ema_params),
    ):
        for a, b in zip(jax.tree.leaves(jax.device_get(tree_a)),
                        jax.tree.leaves(jax.device_get(tree_b))):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=name)
    # the updated state keeps its FSDP placement (no silent re-replication)
    assert state_bytes_per_device(s_fsdp) < bytes_rep / 3


def test_hsdp_step_matches_replicated():
    """Hybrid (data=4, fsdp=2) mesh: batch over all 8 devices, state sharded
    only within pairs — same update as the replicated run, state bytes halved."""
    assert jax.device_count() >= 8
    from vdiff_tpu.parallel import FSDP_AXIS, resolve_fsdp_axis

    model, diffusion, optimizer, state, step_fn = _setup()
    mesh2 = create_mesh(fsdp_size=2)
    assert mesh2.axis_names == ("data", "fsdp") and mesh2.shape["fsdp"] == 2
    assert resolve_fsdp_axis(mesh2) == FSDP_AXIS

    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.randn(16, RES, RES, 3).astype(np.float32).clip(-1, 1))
    rng = jax.random.key(7)

    # replicated single-jit result as the gold trajectory
    s_gold, l_gold = jax.jit(step_fn)(state, x, None, rng)

    bsh = batch_sharding(mesh2, 4)  # splits the batch over data AND fsdp axes
    rep = replicated(mesh2)
    shardings = state_shardings(mesh2, state, min_size=0)
    state_h = jax.device_put(state, shardings)
    x_sh = jax.device_put(x, bsh)
    step_hsdp = jax.jit(
        step_fn, in_shardings=(shardings, bsh, None, None),
        out_shardings=(shardings, rep),
    )
    s_hsdp, l_hsdp = step_hsdp(state_h, x_sh, None, rng)

    np.testing.assert_allclose(float(l_hsdp), float(l_gold), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_gold.params)),
                    jax.tree.leaves(jax.device_get(s_hsdp.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    # state is stored once per fsdp group of 2 -> per-device bytes ~1/2 of full
    total = sum(np.asarray(l).nbytes for l in jax.tree.leaves(jax.device_get(state)))
    assert state_bytes_per_device(s_hsdp) < 0.75 * total


def test_hsdp_no_involuntary_activation_remat(capfd):
    """Compiling the full CFG train step under a hybrid (data, fsdp) mesh must
    not hit GSPMD "[SPMD] Involuntary full rematerialization" fallbacks
    (VERDICT r3 #3): with the old largest-dim placement, the backward's
    dqkv/d(shift,scale) concats inherited feature shardings the partitioner
    could only satisfy by replicating activation-sized tensors every step.
    The round-4 placement rule (parallel/fsdp.py docstring) eliminates every
    such fallback on the hybrid mesh — pinned here via fd-level stderr capture
    (the warning is C++ glog output). Exact dryrun_multichip HSDP config:
    CFG + multiclass + dropout + grad accum, up-path splits + attention."""
    assert jax.device_count() >= 8
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1, 2),
        num_res_blocks=1, apply_attn=(False, True), drop_rate=0.1, num_heads=1,
        num_classes=10, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=4,
        model_out_type="v", model_var_type="fixed_medium",
        reweight_type="snr_trunc", loss_type="mse", intp_frac=0.3,
        w_guide=0.1, p_uncond=0.1,
    )
    optimizer = make_optimizer(lr=2e-4, warmup=10, grad_norm=1.0)
    step_fn = make_train_step(model, diffusion, optimizer, timesteps=0,
                              num_accum=2, use_cfg=True, use_ema=True)
    rng = jax.random.key(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, RES, RES, 3)), jnp.zeros((1,)), jnp.zeros((1,)),
    )["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    mesh2 = create_mesh(fsdp_size=2)
    shardings = state_shardings(mesh2, state, min_size=0)
    bsh = batch_sharding(mesh2, 4)
    from jax.sharding import NamedSharding

    ysh = NamedSharding(mesh2, P(("data", "fsdp")))
    step = jax.jit(step_fn, in_shardings=(shardings, bsh, ysh, None),
                   out_shardings=(shardings, replicated(mesh2)))
    x = jax.device_put(jnp.zeros((32, RES, RES, 3)), bsh)
    y = jax.device_put(jnp.ones((32,)), ysh)
    capfd.readouterr()  # drop anything buffered before the compile
    _, loss = step(jax.device_put(state, shardings), x, y, rng)
    jax.block_until_ready(loss)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]


def _fsdp_trainer(epochs=2):
    from vdiff_tpu.data import ArrayDataset, DataLoader
    from vdiff_tpu.train_lib import Trainer

    rng = np.random.RandomState(0)
    ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=rng.randint(1, 5, (32,)).astype(np.int64),
    )
    loader = DataLoader(ds, batch_size=16, seed=0)
    # hid 64 -> the mid conv kernels (3,3,64,64) clear MIN_SHARD_SIZE, so the
    # default Trainer placement genuinely shards
    model = UNet(
        in_channels=3, hid_channels=64, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(True,), num_heads=1, drop_rate=0.0,
        num_classes=4, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.1, p_uncond=0.1,
    )
    return Trainer(
        model=model, diffusion=diffusion, timesteps=0, epochs=epochs,
        trainloader=loader, optimizer_config=dict(lr=1e-3, warmup=2),
        use_cfg=True, use_ema=True, num_accum=1, shape=(8, 8, 3),
        ckpt_intv=1, max_ckpts_kept=2, image_intv=1000, eval_intv=1000,
        num_save_images=4, seed=0, fsdp=True,
    )


def test_fsdp_trainer_end_to_end(tmp_path):
    """Trainer(fsdp=True): sharded steps run, a conv kernel is actually
    distributed, sampling reshards transparently, checkpoints roundtrip."""
    trainer = _fsdp_trainer()
    x, y = next(iter(trainer.trainloader))
    loss = trainer.step(x, y)
    assert np.isfinite(float(jax.device_get(loss)))
    assert int(jax.device_get(trainer.state.step)) == 1

    # at least one param leaf is genuinely sharded over the mesh
    shard_counts = [
        len({s.index for s in leaf.addressable_shards})
        for leaf in jax.tree.leaves(trainer.state.params)
    ]
    assert max(shard_counts) == 8, shard_counts

    # sampling consumes the sharded EMA params (jit reshards at the boundary)
    imgs = trainer.sample_fn(label=jnp.ones((4,), jnp.float32), batch_size=4,
                             use_ddim=True)
    assert imgs.shape == (4, 8, 8, 3) and np.isfinite(imgs).all()

    # Orbax roundtrip: save the sharded state, restore into a fresh fsdp Trainer
    from vdiff_tpu.train_lib import CheckpointManager

    ckpt_dir = str(tmp_path / "ckpts")
    trainer.ckpt_manager = CheckpointManager(ckpt_dir, max_ckpts_kept=2)
    trainer.save_checkpoint(epoch=1)

    trainer2 = _fsdp_trainer(epochs=3)
    trainer2.load_checkpoint(ckpt_dir=ckpt_dir)
    assert trainer2.start_epoch == 1
    assert int(jax.device_get(trainer2.state.step)) == 1
    for a, b in zip(jax.tree.leaves(jax.device_get(trainer2.state.params)),
                    jax.tree.leaves(jax.device_get(trainer.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored placement is the FSDP one: per-device bytes strictly below the
    # full (replicated) state footprint
    total_state = sum(
        np.asarray(l).nbytes for l in jax.tree.leaves(jax.device_get(trainer2.state))
    )
    assert state_bytes_per_device(trainer2.state) < 0.8 * total_state


def test_hsdp_trainer_step_and_sampling(tmp_path):
    """Trainer(fsdp_size=2) builds the hybrid mesh and both the train step and
    the multi-axis shard_map sampler run on it."""
    import vdiff_tpu.train_lib as tl
    from vdiff_tpu.data import ArrayDataset, DataLoader

    rng = np.random.RandomState(0)
    ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=rng.randint(1, 5, (32,)).astype(np.int64),
    )
    loader = DataLoader(ds, batch_size=16, seed=0)
    model = UNet(
        in_channels=3, hid_channels=64, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(True,), num_heads=1, drop_rate=0.0,
        num_classes=4, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.1, p_uncond=0.1,
    )
    trainer = tl.Trainer(
        model=model, diffusion=diffusion, timesteps=0, epochs=2,
        trainloader=loader, optimizer_config=dict(lr=1e-3, warmup=2),
        use_cfg=True, use_ema=True, num_accum=1, shape=(8, 8, 3),
        ckpt_intv=1, max_ckpts_kept=2, image_intv=1000, eval_intv=1000,
        num_save_images=4, seed=0, fsdp_size=2,
    )
    assert trainer.mesh.axis_names == ("data", "fsdp")
    x, y = next(iter(trainer.trainloader))
    loss = trainer.step(x, y)
    assert np.isfinite(float(jax.device_get(loss)))

    imgs = trainer.sample_fn(label=jnp.arange(1, 9, dtype=jnp.float32) % 4 + 1,
                             batch_size=8, use_ddim=True)
    assert imgs.shape == (8, 8, 8, 3) and np.isfinite(imgs).all()
