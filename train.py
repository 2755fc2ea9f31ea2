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

import json
import os
from datetime import datetime
from functools import partial

import jax
import jax.numpy as jnp

from vdiff_tpu import (
    DATA_INFO,
    GaussianDiffusion,
    Trainer,
    UNet,
    fill_with_defaults,
    get_dataloader,
    get_logsnr_schedule,
    seed_all,
    update_config,
)
from vdiff_tpu.train_lib import Evaluator

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vdiff_tpu", "configs")


def main(args):
    if args.distributed and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process fallback
            print(f"jax.distributed.initialize() skipped: {e}")

    def logger(msg, **kwargs):
        if jax.process_index() == 0:
            print(msg, **kwargs)

    config_path = args.config_path
    exp_name = args.exp_name or os.path.splitext(os.path.basename(config_path))[0]
    with open(config_path, "r") as f:
        config: dict = json.load(f)
    with open(args.default_config_path, "r") as f:
        defaults: dict = json.load(f)
    fill_with_defaults(config, defaults)

    # --- data ---
    update_data = partial(update_config, old_config=config.get("data", {}), new_config=args)
    dataset = config["data"]["name"]
    root = update_data("root", "data_root")
    root = os.path.expandvars(os.path.expanduser(root))

    in_channels = DATA_INFO[dataset]["channels"]
    image_res = DATA_INFO[dataset]["resolution"]
    image_shape = image_res + (in_channels,)  # NHWC

    # --- conditional ---
    update_cond = partial(update_config, old_config=config.get("conditional", {}), new_config=args)
    use_cfg = update_cond("use_cfg", logical_op="OR")
    w_guide = update_cond("w_guide")
    p_uncond = update_cond("p_uncond")
    multitags = DATA_INFO[dataset].get("multitags", False)
    num_classes = DATA_INFO[dataset].get("num_classes", 0) if use_cfg else 0

    # --- train ---
    update_train = partial(update_config, old_config=config.get("train", {}), new_config=args)
    epochs = update_train("epochs")
    seed = update_train("seed")
    batch_size = update_train("batch_size")
    beta1, beta2 = update_train("beta1"), update_train("beta2")
    weight_decay = update_train("weight_decay")
    lr = update_train("lr")
    grad_norm = update_train("grad_norm")
    warmup = update_train("warmup")
    use_ema = update_train("use_ema", logical_op="OR")
    ema_decay = update_train("ema_decay")
    ckpt_intv = update_train("ckpt_intv")
    image_intv = update_train("image_intv")
    num_save_images = update_train("num_save_images")
    max_ckpts_kept = update_train("max_ckpts_kept")
    update_train("save_rng_state", logical_op="OR")  # parity no-op: determinism
    # is recovered from (seed, step) — see train_lib RNG design

    seed_all(seed)

    # --- diffusion ---
    update_diff = partial(update_config, old_config=config.get("diffusion", {}), new_config=args)
    logsnr_schedule = update_diff("logsnr_schedule")
    logsnr_min, logsnr_max = update_diff("logsnr_min"), update_diff("logsnr_max")
    train_timesteps = update_diff("train_timesteps")
    sample_timesteps = update_diff("sample_timesteps")
    reweight_type = update_diff("reweight_type")
    model_out_type = update_diff("model_out_type")
    model_var_type = update_diff("model_var_type")
    intp_frac = update_diff("intp_frac")
    loss_type = update_diff("loss_type")
    allow_rescale = update_diff("allow_rescale", logical_op="OR")
    x0eps_coef = update_diff("x0eps_coef", logical_op="OR")

    t_rescale = (train_timesteps == 0) and allow_rescale
    logsnr_fn = get_logsnr_schedule(
        logsnr_schedule, logsnr_min=logsnr_min, logsnr_max=logsnr_max, rescale=t_rescale
    )

    diffusion = GaussianDiffusion(
        logsnr_fn=logsnr_fn,
        sample_timesteps=sample_timesteps,
        model_out_type=model_out_type,
        model_var_type=model_var_type,
        reweight_type=reweight_type,
        loss_type=loss_type,
        intp_frac=intp_frac,
        w_guide=w_guide,
        p_uncond=p_uncond,
        x0eps_coef=x0eps_coef,
    )

    # --- model ---
    update_model = partial(update_config, old_config=config.get("model", {}), new_config=args)
    use_flash = bool(update_model("use_xformers", logical_op="OR"))

    if "in_channels" in config["model"]:
        assert config["model"]["in_channels"] == in_channels
    else:
        config["model"]["in_channels"] = in_channels
    if "out_channels" not in config["model"]:
        out_channels = 2 * in_channels if model_out_type == "both" else in_channels
        config["model"]["out_channels"] = out_channels

    # --- speedup ---
    update_speedup = partial(update_config, old_config=config.get("speedup", {}), new_config=args)
    update_speedup("cudnn_benchmark", logical_op="OR")
    allow_tf32 = update_speedup("allow_tf32", logical_op="OR")
    update_speedup("allow_fp16", logical_op="OR")
    allow_bf16 = update_speedup("allow_bf16", logical_op="OR")
    dtype = jnp.bfloat16 if allow_bf16 else None
    # reference precision semantics (train.py:239-260): fp32 default; tf32
    # opt-in. TPU mapping: HIGHEST = true f32 accumulation, HIGH ≈ bf16_3x
    # (tf32-class), DEFAULT = bf16 inputs. bf16 compute implies DEFAULT.
    if allow_bf16:
        matmul_precision = "default"
    elif allow_tf32:
        matmul_precision = "high"
    else:
        matmul_precision = "highest"
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    logger(f"bf16 compute: {'ON' if allow_bf16 else 'OFF'}; matmul precision: {matmul_precision}")

    # counter-based rbg PRNG: threefry dropout-mask generation costs ~18% of
    # the train step on v5e (902 → 1068 img/s with rbg); statistically fine
    # for dropout/noise streams
    try:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
        logger(f"PRNG impl: {args.prng_impl}")
    except Exception as e:
        logger(f"PRNG impl unchanged: {e}")

    model_cfg = {k: v for k, v in config["model"].items() if k != "use_xformers"}
    model = UNet(
        num_classes=num_classes,
        multitags=multitags,
        use_flash=use_flash or jax.default_backend() == "tpu",
        dtype=dtype,
        **model_cfg,
    )

    trainloader, sampler = get_dataloader(
        dataset,
        batch_size=batch_size,
        split="all" if dataset == "celeba" else "train",
        val_size=0.0,
        random_seed=seed,
        root=root,
        drop_last=True,
        distributed=jax.process_count() > 1,
        is_leader=jax.process_index() == 0,
    )

    timestamp = datetime.now().strftime("%Y-%m-%dT%H%M%S%f")
    exp_dir = os.path.join(args.exp_dir, f"dpm_{exp_name}", timestamp)
    ckpt_dir = os.path.join(exp_dir, "ckpts")
    image_dir = os.path.join(exp_dir, "images")
    is_leader = jax.process_index() == 0
    if is_leader:
        os.makedirs(image_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
    logger(f"Checkpoints → {os.path.abspath(ckpt_dir)} every {ckpt_intv} epoch(s)")
    logger(f"Images (x{num_save_images}) → {os.path.abspath(image_dir)} every {image_intv} epoch(s)")

    trainer = Trainer(
        model=model,
        diffusion=diffusion,
        timesteps=train_timesteps,
        epochs=epochs,
        trainloader=trainloader,
        sampler=sampler,
        optimizer_config=dict(lr=lr, beta1=beta1, beta2=beta2, weight_decay=weight_decay, warmup=warmup),
        use_cfg=use_cfg,
        use_ema=use_ema,
        grad_norm=grad_norm,
        num_accum=args.num_accum,
        shape=image_shape,
        ckpt_intv=ckpt_intv,
        max_ckpts_kept=max_ckpts_kept,
        image_intv=image_intv,
        num_save_images=num_save_images,
        eval_intv=args.eval_intv,
        ema_decay=ema_decay,
        seed=seed,
    )
    evaluator = Evaluator(dataset=dataset) if args.eval else None

    # elastic relaunch: resume is forced on under distributed (reference
    # train.py:214-224)
    resume = args.resume or args.distributed
    if resume:
        try:
            trainer.load_checkpoint(ckpt_path=args.from_ckpt, ckpt_dir=args.from_ckpt or ckpt_dir)
            logger("Successfully loaded checkpoint!")
        except FileNotFoundError:
            logger("Checkpoint file does not exist!")
            logger("Starting from scratch...")

    if is_leader:
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
    parser.add_argument("--model-out-type", type=str, choices=["x_0", "eps", "both", "v"])
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
    parser.add_argument("--default-config-path", default=os.path.join(DEFAULT_CONFIG_DIR, "defaults.json"), type=str)
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
    parser.add_argument("--prng-impl", type=str, default="rbg", choices=["rbg", "threefry2x32"],
                        help="PRNG implementation (rbg is ~18%% faster per train step on TPU)")
    parser.add_argument("--max-ckpts-kept", type=int, help="maximum number of checkpoints to keep on disk (none for no cap)")
    parser.add_argument("--use-cfg", action="store_true", help="whether to use classifier-free guidance")
    parser.add_argument("--use-ema", action="store_true", help="whether to use exponential moving average")
    parser.add_argument("--allow-rescale", action="store_true", help="whether to adjust t per the schedule remap (pure, not in-place)")
    parser.add_argument("--x0eps-coef", action="store_true", help="whether the posterior mean should be expressed in terms of x0 and eps")

    main(parser.parse_args())
