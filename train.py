"""Training CLI — same flag surface as the reference ``train.py`` (lines
284-338), TPU-native semantics.

Mapping of GPU-specific flags (reference train.py:226-260):
  --distributed     → multi-process JAX (``jax.distributed.initialize``); a
                      single process already uses every local TPU chip through
                      the data-parallel mesh, so this is only needed multi-host.
  --allow-bf16      → bfloat16 compute dtype in the UNet (params stay f32)
  --allow-tf32/fp16 → accepted for CLI parity; XLA:TPU computes f32 matmuls in
                      bf16-pass precision by default (nearest equivalent)
  --cudnn-benchmark → accepted, no-op (XLA autotunes convolutions)
  --use-xformers    → maps to the fused/Pallas attention path (use_flash)
"""

import dataclasses
import os
from datetime import datetime, timezone

import jax
import jax.numpy as jnp

from vdiff_tpu import DATA_INFO, Trainer, get_dataloader, seed_all
from vdiff_tpu.factory import (
    DEFAULT_CONFIG_PATH,
    build_diffusion,
    build_unet,
    load_experiment_config,
    resolve_section,
)
from vdiff_tpu.train_lib import Evaluator

# 3-level precedence schema (CLI > experiment JSON > defaults): one row per
# config field; "op": "OR" marks store_true flags whose False falls back to
# the config, "arg" names the CLI attribute when it differs.
OR = {"op": "OR"}
SCHEMA = {
    "data": {"root": {"arg": "data_root"}},
    "conditional": {"use_cfg": OR, "w_guide": {}, "p_uncond": {}},
    "train": {
        "epochs": {}, "seed": {}, "batch_size": {}, "beta1": {}, "beta2": {},
        "weight_decay": {}, "lr": {}, "grad_norm": {}, "warmup": {},
        "use_ema": OR, "ema_decay": {}, "ckpt_intv": {}, "image_intv": {},
        "num_save_images": {}, "max_ckpts_kept": {},
        # parity no-op: determinism is recovered from (seed, step) — see
        # train_lib RNG design
        "save_rng_state": OR,
    },
    "diffusion": {
        "logsnr_schedule": {}, "logsnr_min": {}, "logsnr_max": {},
        "train_timesteps": {}, "sample_timesteps": {}, "reweight_type": {},
        "model_out_type": {}, "model_var_type": {}, "intp_frac": {},
        "loss_type": {}, "allow_rescale": OR, "x0eps_coef": OR,
    },
    "model": {"use_xformers": OR},
    "speedup": {
        "cudnn_benchmark": OR,  # parity no-op: XLA autotunes convolutions
        "allow_tf32": OR, "allow_fp16": OR, "allow_bf16": OR,
    },
}


def apply_precision_flags(speedup, prng_impl, logger):
    """Map the reference's GPU precision flags onto XLA semantics.

    Reference fp32-default/tf32-opt-in (train.py:239-260) becomes
    HIGHEST/HIGH/DEFAULT matmul precision; bf16 compute implies DEFAULT.
    Returns the UNet activation dtype.
    """
    if speedup.allow_bf16:
        matmul_precision = "default"
    elif speedup.allow_tf32:
        matmul_precision = "high"
    else:
        matmul_precision = "highest"
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    logger(f"bf16 compute: {'ON' if speedup.allow_bf16 else 'OFF'}; "
           f"matmul precision: {matmul_precision}")

    # counter-based rbg PRNG: threefry dropout-mask generation costs ~18% of
    # the train step on v5e (902 → 1068 img/s with rbg); statistically fine
    # for dropout/noise streams
    try:
        jax.config.update("jax_default_prng_impl", prng_impl)
        logger(f"PRNG impl: {prng_impl}")
    except Exception as e:
        logger(f"PRNG impl unchanged: {e}")
    return jnp.bfloat16 if speedup.allow_bf16 else None


def make_experiment_dirs(exp_dir, exp_name, is_leader):
    # every process must agree on the run directory: checkpoint saving is a
    # collective (Orbax coordinates across hosts over ONE shared path), so the
    # timestamp is process-0's, broadcast to everyone
    ts_us = int(datetime.now().timestamp() * 1e6)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        import numpy as np

        ts_us = int(multihost_utils.broadcast_one_to_all(np.int64(ts_us)))
    # UTC formatting: hosts with differing TZ env must still derive the SAME
    # directory name from the broadcast instant
    timestamp = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H%M%S%f"
    )
    exp_dir = os.path.join(exp_dir, f"dpm_{exp_name}", timestamp)
    ckpt_dir = os.path.join(exp_dir, "ckpts")
    image_dir = os.path.join(exp_dir, "images")
    if is_leader:
        os.makedirs(image_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
    return exp_dir, ckpt_dir, image_dir


def main(args):
    if args.distributed and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process fallback
            print(f"jax.distributed.initialize() skipped: {e}")

    is_leader = jax.process_index() == 0

    def logger(msg, **kwargs):
        if is_leader:
            print(msg, **kwargs)

    config, default_name = load_experiment_config(args.config_path, args.default_config_path)
    exp_name = args.exp_name or default_name
    r = {s: resolve_section(config, args, s, fields) for s, fields in SCHEMA.items()}
    data, cond, train, model_r, speedup = r["data"], r["conditional"], r["train"], r["model"], r["speedup"]

    dataset = config["data"]["name"]
    root = os.path.expandvars(os.path.expanduser(data.root))
    info = DATA_INFO[dataset]
    image_shape = info["resolution"] + (info["channels"],)  # NHWC
    multitags = info.get("multitags", False)
    num_classes = info.get("num_classes", 0) if cond.use_cfg else 0

    seed_all(train.seed)

    diffusion, train_timesteps = build_diffusion(
        config["diffusion"], w_guide=cond.w_guide, p_uncond=cond.p_uncond
    )
    dtype = apply_precision_flags(speedup, args.prng_impl, logger)
    model = build_unet(
        config["model"],
        in_channels=info["channels"],
        model_out_type=config["diffusion"]["model_out_type"],
        num_classes=num_classes,
        multitags=multitags,
        use_flash=bool(model_r.use_xformers) or jax.default_backend() == "tpu",
        dtype=dtype,
        remat=args.remat,
        remat_policy=args.remat_policy,
    )

    trainloader, sampler = get_dataloader(
        dataset,
        batch_size=train.batch_size,
        split="all" if dataset == "celeba" else "train",
        val_size=0.0,
        random_seed=train.seed,
        root=root,
        drop_last=True,
        distributed=jax.process_count() > 1,
        is_leader=is_leader,
        num_workers=args.num_workers,
    )

    exp_dir, ckpt_dir, image_dir = make_experiment_dirs(args.exp_dir, exp_name, is_leader)
    logger(f"Checkpoints → {os.path.abspath(ckpt_dir)} every {train.ckpt_intv} epoch(s)")
    logger(f"Images (x{train.num_save_images}) → {os.path.abspath(image_dir)} "
           f"every {train.image_intv} epoch(s)")

    trainer = Trainer(
        model=model,
        diffusion=diffusion,
        timesteps=train_timesteps,
        epochs=train.epochs,
        trainloader=trainloader,
        sampler=sampler,
        optimizer_config=dict(lr=train.lr, beta1=train.beta1, beta2=train.beta2,
                              weight_decay=train.weight_decay, warmup=train.warmup),
        use_cfg=cond.use_cfg,
        use_ema=train.use_ema,
        grad_norm=train.grad_norm,
        num_accum=args.num_accum,
        shape=image_shape,
        ckpt_intv=train.ckpt_intv,
        max_ckpts_kept=train.max_ckpts_kept,
        image_intv=train.image_intv,
        num_save_images=train.num_save_images,
        eval_intv=args.eval_intv,
        ema_decay=train.ema_decay,
        seed=train.seed,
        fsdp=args.fsdp,
        fsdp_size=args.fsdp_size,
    )
    evaluator = None
    if args.eval:
        # in-training FID matches the headline condition: class-conditional
        # sampling at w=0 (reference generate.py's default FID protocol) —
        # pass a zero-guidance diffusion so CFG models skip the concat
        # doubling while the Trainer draws real labels
        eval_diffusion = (
            dataclasses.replace(diffusion, w_guide=0.0) if cond.use_cfg else None
        )
        evaluator = Evaluator(
            dataset=dataset, diffusion=eval_diffusion, mesh=trainer.mesh
        )

    # elastic relaunch: resume is forced on under distributed (reference
    # train.py:214-224)
    if args.resume or args.distributed:
        try:
            trainer.load_checkpoint(ckpt_path=args.from_ckpt, ckpt_dir=args.from_ckpt or ckpt_dir)
            logger("Successfully loaded checkpoint!")
        except FileNotFoundError:
            logger("Checkpoint file does not exist!")
            logger("Starting from scratch...")

    if is_leader:
        import json

        os.makedirs(exp_dir, exist_ok=True)
        with open(os.path.join(exp_dir, "config.json"), "w") as f:
            config["args"] = vars(args)
            json.dump(config, f, indent=2)

    logger("Training starts...", flush=True)
    trainer.train(evaluator, ckpt_dir=ckpt_dir, image_dir=image_dir, use_ddim=args.use_ddim)


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument("--data_root", type=str, help="root directory of datasets")
    parser.add_argument("--epochs", type=int, help="total number of training epochs")
    parser.add_argument("--lr", type=float, help="learning rate")
    parser.add_argument("--beta1", type=float, help="beta_1 in Adam")
    parser.add_argument("--beta2", type=float, help="beta_2 in Adam")
    parser.add_argument("--weight-decay", type=float, help="decoupled weight_decay factor in Adam")
    parser.add_argument("--batch-size", type=int)
    parser.add_argument("--num-accum", type=int, default=1, help="number of batches before weight update, a.k.a. gradient accumulation")
    parser.add_argument("--train-timesteps", type=int, help="number of diffusion steps for training (0 indicates continuous training)")
    parser.add_argument("--sample-timesteps", type=int, help="number of diffusion steps for sampling")
    parser.add_argument("--logsnr-schedule", choices=["linear", "sigmoid", "cosine", "legacy"])
    parser.add_argument("--logsnr-max", type=float)
    parser.add_argument("--logsnr-min", type=float)
    parser.add_argument("--model-out-type", type=str, choices=["x_0", "x0", "eps", "both", "v"])
    parser.add_argument("--model-var-type", type=str, choices=["fixed_small", "fixed_large", "fixed_medium"])
    parser.add_argument("--reweight-type", type=str, choices=["constant", "snr", "snr_trunc", "snr_1plus"])
    parser.add_argument("--loss-type", type=str, choices=["kl", "mse"])
    parser.add_argument("--intp-frac", type=float)
    parser.add_argument("--w-guide", type=float, help="classifier-free guidance strength")
    parser.add_argument("--p-uncond", type=float, help="probability of unconditional training")
    parser.add_argument("--num-workers", type=int, default=4, help="number of workers for data loading")
    parser.add_argument("--train-device", type=str, default="tpu")
    parser.add_argument("--eval-device", type=str, default="tpu")
    parser.add_argument("--image-intv", type=int)
    parser.add_argument("--num-save-images", type=int, help="number of images to generate & save")
    parser.add_argument("--use-ddim", action="store_true", help="whether to use DDIM sampler")
    parser.add_argument("--config-path", required=True, type=str)
    parser.add_argument("--default-config-path", default=DEFAULT_CONFIG_PATH, type=str)
    parser.add_argument("--exp-dir", type=str, default="./exps")
    parser.add_argument("--exp-name", type=str)
    parser.add_argument("--ckpt-intv", type=int, help="frequency of saving a checkpoint")
    parser.add_argument("--save-rng-state", action="store_true", help="(parity) determinism derives from (seed, step)")
    parser.add_argument("--seed", type=int, help="random seed")
    parser.add_argument("--resume", action="store_true", help="to resume training from a checkpoint")
    parser.add_argument("--from-ckpt", type=str, help="from which checkpoint to resume")
    parser.add_argument("--eval", action="store_true", help="whether to evaluate fid during training")
    parser.add_argument("--eval-intv", type=int, default=128, help="frequency of evaluating the model")
    parser.add_argument("--ema-decay", type=float, help="decay factor of ema")
    parser.add_argument("--distributed", action="store_true", help="multi-host training (jax.distributed)")
    parser.add_argument("--cudnn-benchmark", action="store_true", help="(parity no-op: XLA autotunes)")
    parser.add_argument("--allow-tf32", action="store_true", help="(parity) XLA default matmul precision")
    parser.add_argument("--allow-fp16", action="store_true", help="(parity) see --allow-bf16")
    parser.add_argument("--allow-bf16", action="store_true", help="bfloat16 compute in the UNet")
    parser.add_argument("--use-xformers", action="store_true", help="use the fused/Pallas attention path")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params/Adam moments/EMA over the data axis (ZeRO-3; "
                             "state memory ~/n_devices — pairs with --remat for the "
                             "celeba-scale model on small slices)")
    parser.add_argument("--fsdp-size", type=int, default=0,
                        help="hybrid HSDP: shard the state only within groups of this "
                             "many devices (a 2-D (data, fsdp) mesh keeps param "
                             "all-gathers inside an ICI neighborhood); implies --fsdp")
    parser.add_argument("--remat", action="store_true",
                        help="gradient checkpointing per UNet block (activation memory ~/depth, "
                             "+~1/3 recompute FLOPs; needed for the celeba-scale model on one chip)")
    parser.add_argument("--remat-policy", type=str, default=None, choices=["conv"],
                        help="selective remat: save conv/matmul outputs, recompute only "
                             "elementwise chains in the backward (more memory than --remat "
                             "alone, near-zero recompute FLOPs); enables checkpointing by "
                             "itself, no --remat needed")
    parser.add_argument("--prng-impl", type=str, default="rbg", choices=["rbg", "threefry2x32"],
                        help="PRNG implementation (rbg is ~18%% faster per train step on TPU)")
    parser.add_argument("--max-ckpts-kept", type=int, help="maximum number of checkpoints to keep on disk (none for no cap)")
    parser.add_argument("--use-cfg", action="store_true", help="whether to use classifier-free guidance")
    parser.add_argument("--use-ema", action="store_true", help="whether to use exponential moving average")
    parser.add_argument("--allow-rescale", action="store_true", help="whether to adjust t per the schedule remap (pure, not in-place)")
    parser.add_argument("--x0eps-coef", action="store_true", help="whether the posterior mean should be expressed in terms of x0 and eps")

    main(parser.parse_args())
