"""Worker process for the 2-process CPU-cluster test (test_distributed.py).

Exercises the code paths that only exist when ``jax.process_count() > 1`` —
the TPU-pod analogue of the reference's torchrun bring-up
(reference train.py:129-156):

* ``jax.distributed.initialize`` against a local coordinator
* ``shard_batch`` → ``make_array_from_process_local_data`` global assembly
* ``sync_global_devices`` named barriers
* the dataloader's unconditional download barrier (incl. the all-processes-
  missing case, which must raise cleanly rather than deadlock)
* a global-mesh jitted train step + the collective ``sample_fn`` (all_gather
  to a replicated result readable on every process)
* ``Evaluator.eval`` driving the collective sample_fn on every process
  (end-to-end proof of the eval-deadlock fix) with an injected feature stack
* CFG/multitag sampling under the sharded sampler, incl. the rank-preserving
  (B, K) label pad for non-divisible batches
* leader-gated checkpoint save, restored by the non-leader
* FSDP over the global mesh: cross-host sharded state, the collective
  sharded Orbax save/restore, and sampling from sharded EMA params
* tensor-parallel + spatially-partitioned serving forwards over the GLOBAL
  mesh (params / activations sharded across both processes), equal to a
  purely local unsharded forward

Prints ``WORKER_OK <pid>`` on success; any assertion/exception fails the
parent test via the exit code.
"""

import os
import sys


def main():
    coordinator, num_procs, pid, tmpdir = sys.argv[1:5]
    num_procs, pid = int(num_procs), int(pid)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from vdiff_tpu.parallel import create_mesh, shard_batch, sync_global_devices

    mesh = create_mesh()
    assert mesh.devices.size == 4 * num_procs

    # --- global-array assembly from process-local shards -------------------
    local = np.full((8, 3), float(pid), np.float32)  # half the global batch
    garr = shard_batch(mesh, local)
    assert garr.shape == (16, 3)
    total = jax.jit(lambda a: jnp.sum(a))(garr)
    # processes 0 and 1 contribute 8*3*pid each → 24
    np.testing.assert_allclose(float(total), 24.0)

    sync_global_devices("phase_1")

    # --- dataloader: distributed barrier + per-process sharding ------------
    from vdiff_tpu.data import get_dataloader

    loader, _ = get_dataloader(
        "synthetic", batch_size=16, split="train", val_size=0.0, random_seed=0,
        root=tmpdir, drop_last=True, distributed=True, is_leader=pid == 0,
    )
    xb, yb = next(iter(loader))
    assert xb.shape[0] == 8, xb.shape  # world-divided batch

    # all-processes-missing dataset: every process must pass the download
    # barrier and fail CLEANLY (pre-fix: only failing processes entered the
    # named barrier → heterogeneous state deadlocked)
    try:
        get_dataloader(
            "cifar10", batch_size=16, split="train", val_size=0.0, random_seed=0,
            root=os.path.join(tmpdir, "definitely_missing"), drop_last=True,
            distributed=True, is_leader=pid == 0,
        )
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass

    sync_global_devices("phase_2")

    # --- global-mesh Trainer: train step, collective sampling, checkpoint --
    from vdiff_tpu.data import ArrayDataset, DataLoader
    from vdiff_tpu.diffusion import GaussianDiffusion
    from vdiff_tpu.models.unet import UNet
    from vdiff_tpu.ops.numerics import get_logsnr_schedule
    from vdiff_tpu.train_lib import Trainer

    rng = np.random.RandomState(0)
    ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=rng.randint(1, 5, (32,)).astype(np.int64),
    )
    loader = DataLoader(ds, batch_size=16, seed=0, process_index=pid, process_count=num_procs)
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(False,), num_heads=1, drop_rate=0.0,
        num_classes=0, use_flash=False,
    )
    diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.0, p_uncond=0.0,
    )
    trainer = Trainer(
        model=model, diffusion=diffusion, timesteps=0, epochs=1,
        trainloader=loader, optimizer_config=dict(lr=1e-3, warmup=2),
        shape=(8, 8, 3), num_save_images=0, seed=0, mesh=mesh,
    )

    for i, (x, y) in enumerate(loader):
        loss = trainer.step(x, None)
    assert np.isfinite(float(jax.device_get(loss)))

    # collective sampling: ALL processes call together; the replicated result
    # must be identical everywhere (this is the eval-deadlock fix's contract)
    out = trainer.sample_fn(batch_size=16, use_ddim=True)
    assert out.shape == (16, 8, 8, 3)
    gathered = multihost_utils.process_allgather(np.asarray(out, np.float64).mean())
    np.testing.assert_allclose(gathered[0], gathered[1], rtol=0, atol=0)

    # non-divisible batch: padded shard path instead of a one-process jit hang
    out10 = trainer.sample_fn(batch_size=10, use_ddim=True)
    assert out10.shape == (10, 8, 8, 3)

    # --- Evaluator.eval under multi-process: every process drives the
    # collective sample_fn; only the FID math is host-side. This is the
    # end-to-end proof of the train_lib eval-deadlock fix (the reference's
    # leader-only Evaluator + all_gather-inside-sample_fn hangs here).
    from vdiff_tpu.train_lib import Evaluator

    feat_rng = np.random.RandomState(42)  # identical on every process
    ref_feats = feat_rng.randn(512, 8)
    target_stats = (ref_feats.mean(0), np.cov(ref_feats, rowvar=False, ddof=1))
    evaluator = Evaluator(
        dataset="synthetic", eval_batch_size=16, max_eval_count=16,
        feature_fn=lambda im: im.reshape(im.shape[0], -1)[:, :8].astype(np.float64),
        target_stats=target_stats,
    )
    eval_out = evaluator.eval(
        lambda b, d=None: trainer.sample_fn(label=None, batch_size=b, use_ddim=True, diffusion=d)
    )
    assert np.isfinite(eval_out["fid"]), eval_out
    fids = multihost_utils.process_allgather(np.float64(eval_out["fid"]))
    np.testing.assert_allclose(fids[0], fids[1], rtol=0, atol=0)

    sync_global_devices("phase_3")

    # --- CFG + multitag sampling under multi-process: guided doubling inside
    # the shard_map'd sampler, (B, K) label sharding, and the rank-preserving
    # pad for a non-divisible batch
    mt_ds = ArrayDataset(
        images=rng.randint(0, 256, (32, 8, 8, 3), np.uint8),
        targets=(rng.rand(32, 4) < 0.5).astype(np.float32),
    )
    mt_loader = DataLoader(mt_ds, batch_size=16, seed=0, process_index=pid, process_count=num_procs)
    mt_model = UNet(
        in_channels=3, hid_channels=32, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(False,), num_heads=1, drop_rate=0.0,
        num_classes=4, multitags=True, use_flash=False,
    )
    mt_diffusion = GaussianDiffusion(
        logsnr_fn=get_logsnr_schedule("cosine"), sample_timesteps=2,
        model_out_type="eps", model_var_type="fixed_large", reweight_type="snr",
        loss_type="mse", w_guide=0.1, p_uncond=0.1,
    )
    mt_trainer = Trainer(
        model=mt_model, diffusion=mt_diffusion, timesteps=0, epochs=1,
        trainloader=mt_loader, optimizer_config=dict(lr=1e-3), use_cfg=True,
        shape=(8, 8, 3), num_save_images=0, seed=0, mesh=mesh,
    )
    x, y = next(iter(mt_loader))
    mt_trainer.step(x, y)
    tags = jnp.asarray((np.random.RandomState(7).rand(10, 4) < 0.5).astype(np.float32))
    mt_out = mt_trainer.sample_fn(label=tags, batch_size=10, use_ddim=True)
    assert mt_out.shape == (10, 8, 8, 3)
    assert np.all(np.isfinite(mt_out))
    mt_gathered = multihost_utils.process_allgather(np.asarray(mt_out, np.float64).mean())
    np.testing.assert_allclose(mt_gathered[0], mt_gathered[1], rtol=0, atol=0)

    # collective checkpoint: every process joins the Orbax save (its internal
    # barriers mismatch under a leader-only call), writes are leader-gated
    ckpt_dir = os.path.join(tmpdir, "ckpts")
    from vdiff_tpu.train_lib import CheckpointManager

    trainer.ckpt_manager = CheckpointManager(ckpt_dir, 1)
    trainer.save_checkpoint(epoch=1)
    trainer.load_checkpoint(ckpt_dir=ckpt_dir)
    assert trainer.start_epoch == 1

    sync_global_devices("phase_4")

    # --- FSDP under real multi-process: the TrainState sharded over the
    # GLOBAL 8-device mesh (each host only addresses its 4 shards), the
    # collective sharded Orbax save (no device_get — a host copy of a
    # non-fully-addressable array is impossible), and restore straight to
    # the sharded placement. hid 64 so the mid conv kernels clear
    # MIN_SHARD_SIZE and genuinely shard.
    f_model = UNet(
        in_channels=3, hid_channels=64, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(False,), num_heads=1, drop_rate=0.0,
        num_classes=0, use_flash=False,
    )
    f_trainer = Trainer(
        model=f_model, diffusion=diffusion, timesteps=0, epochs=1,
        trainloader=loader, optimizer_config=dict(lr=1e-3, warmup=2),
        use_ema=True, shape=(8, 8, 3), num_save_images=0, seed=0, mesh=mesh,
        fsdp=True,
    )
    n_sharded = sum(
        1 for l in jax.tree.leaves(f_trainer.state.params)
        if not l.sharding.is_fully_replicated
    )
    assert n_sharded > 0, "FSDP placement never sharded a leaf"
    x, _ = next(iter(loader))
    f_loss = f_trainer.step(x, None)
    assert np.isfinite(float(jax.device_get(f_loss)))

    # collective sampling consumes the cross-host sharded EMA params
    f_out = f_trainer.sample_fn(batch_size=8, use_ddim=True)
    assert f_out.shape == (8, 8, 8, 3) and np.isfinite(f_out).all()

    # sharded save → restore; verify via a replicated global reduction
    # (device_get of the full FSDP state is invalid per-host by design)
    def gnorm(tree):
        return float(jax.jit(
            lambda t: sum(jnp.vdot(l, l).real for l in jax.tree.leaves(t))
        )(tree))

    norm_before = gnorm(f_trainer.state.params)
    f_trainer.ckpt_manager = CheckpointManager(os.path.join(tmpdir, "fsdp_ckpts"), 1)
    f_trainer.save_checkpoint(epoch=1)
    f_trainer.load_checkpoint(ckpt_dir=os.path.join(tmpdir, "fsdp_ckpts"))
    assert f_trainer.start_epoch == 1
    assert int(jax.device_get(f_trainer.state.step)) == 1
    np.testing.assert_allclose(gnorm(f_trainer.state.params), norm_before, rtol=1e-12)

    sync_global_devices("phase_5")

    # --- Tensor-parallel + spatially-partitioned serving ACROSS HOSTS: the
    # modes generate.py exposes as --tp/--spatial-shard, here with the params
    # (resp. activations) sharded over the GLOBAL 8-device mesh spanning both
    # processes — each host addresses only half the shards, the forward is
    # collective, and the replicated output must match a purely local
    # (unsharded, single-device) forward of the same params.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vdiff_tpu.parallel.spatial import spatial_constraint
    from vdiff_tpu.parallel.tp import create_tp_mesh, tp_shard_params

    tp_model = UNet(
        in_channels=3, hid_channels=64, out_channels=3, ch_multipliers=(1,),
        num_res_blocks=1, apply_attn=(True,), num_heads=1, drop_rate=0.0,
        num_classes=0, use_flash=False,
    )
    tp_key = jax.random.key(11)  # same key on every process → identical init
    tp_params = jax.device_get(tp_model.init(
        {"params": tp_key}, np.zeros((1, 8, 8, 3), np.float32),
        np.zeros((1,), np.float32), None,
    )["params"])
    xb = np.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)

    def tp_fwd(p, x_):
        return tp_model.apply(
            {"params": p}, x_, jnp.full((x_.shape[0],), 0.5, jnp.float32), None,
            train=False,
        )

    # local single-device reference (host-local arrays → non-collective jit)
    out_ref = np.asarray(jax.device_get(jax.jit(tp_fwd)(tp_params, xb)))

    tp_mesh = create_tp_mesh()  # global: all 8 devices across both processes
    assert tp_mesh.devices.size == 4 * num_procs
    tp_sharded = tp_shard_params(tp_mesh, tp_params)
    assert sum(
        1 for l in jax.tree.leaves(tp_sharded)
        if not l.sharding.is_fully_replicated
    ) > 0, "TP placement never sharded a kernel"
    rep_tp = NamedSharding(tp_mesh, P())
    out_tp = jax.device_get(
        jax.jit(tp_fwd, out_shardings=rep_tp)(tp_sharded, jnp.asarray(xb))
    )
    np.testing.assert_allclose(np.asarray(out_tp), out_ref, rtol=2e-5, atol=2e-5)

    def sp_fwd(p, x_):
        return tp_fwd(p, spatial_constraint(x_, tp_mesh))

    out_sp = jax.device_get(
        jax.jit(sp_fwd, out_shardings=rep_tp)(
            jax.device_put(tp_params, rep_tp), jnp.asarray(xb)
        )
    )
    np.testing.assert_allclose(np.asarray(out_sp), out_ref, rtol=2e-5, atol=2e-5)

    sync_global_devices("done")
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
