"""Bulk sampling CLI for metric computation — same flags as the reference
``generate.py``. Sampling runs as one jitted lax.scan per batch on TPU; PNG
writing is overlapped with device compute via a thread pool
(reference generate.py:111-150).

Accepts both checkpoint formats: this framework's Orbax directories and the
reference's torch ``.pt`` files (auto-converted via models/convert.py)."""

if __name__ == "__main__":
    import os
    import json
    import math
    import uuid
    from datetime import datetime
    from argparse import ArgumentParser
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np
    import jax
    import jax.numpy as jnp
    from tqdm import trange
    from PIL import Image

    from vdiff_tpu import (
        DATA_INFO,
        GaussianDiffusion,
        UNet,
        fill_with_defaults,
        get_logsnr_schedule,
    )
    from vdiff_tpu.models.convert import torch_unet_to_flax

    DEFAULT_CONFIG_DIR = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vdiff_tpu", "configs"
    )

    parser = ArgumentParser()
    parser.add_argument("--data-root", type=str, default="~/datasets")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--total-size", type=int, default=50000)
    parser.add_argument("--default-config-path", default=os.path.join(DEFAULT_CONFIG_DIR, "defaults.json"), type=str)
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--save-dir", type=str, default="./images/eval")
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--use-ddim", action="store_true")
    parser.add_argument("--sample-timesteps", type=int, default=1024)
    parser.add_argument("--uncond", action="store_true")
    parser.add_argument("--w-guide", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    # --- load checkpoint (orbax dir or torch .pt) ---
    ckpt_path = args.ckpt_path
    torch_state_dict = None
    flax_payload = None
    if os.path.isdir(ckpt_path):
        import orbax.checkpoint as ocp

        flax_payload = ocp.StandardCheckpointer().restore(ckpt_path)
        keys = set(flax_payload.keys())
        param_tree = (
            flax_payload["ema_params"]
            if args.use_ema and "ema_params" in keys
            else flax_payload["params"]
        )
        head_keys = set(param_tree.keys())
    else:
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu")
        torch_state_dict = (
            ckpt["ema"]["shadow"] if args.use_ema else ckpt["model"]
        )
        for k in list(torch_state_dict.keys()):
            if k.startswith("module."):
                torch_state_dict[k.split(".", maxsplit=1)[1]] = torch_state_dict.pop(k)
        head_keys = {k.split(".")[0] for k in torch_state_dict.keys()}

    # CFG inferred from presence of class_embed params (reference generate.py:44)
    use_cfg = "class_embed" in head_keys

    config_path = args.config_path
    exp_name = os.path.splitext(os.path.basename(config_path))[0]
    with open(config_path, "r") as f:
        config: dict = json.load(f)
    with open(args.default_config_path, "r") as f:
        defaults: dict = json.load(f)
    fill_with_defaults(config, defaults)
    dataset = config["data"]["name"]

    data_root = os.path.expandvars(os.path.expanduser(args.data_root))
    in_channels = DATA_INFO[dataset]["channels"]
    image_res = DATA_INFO[dataset]["resolution"][0]
    multitags = DATA_INFO[dataset].get("multitags", False)
    if use_cfg:
        num_classes = DATA_INFO[dataset]["num_classes"]
        w_guide = 0.0 if args.uncond else args.w_guide
    else:
        num_classes = 0
        w_guide = 0.0

    diffusion_kwargs = dict(config["diffusion"])
    logsnr_schedule = diffusion_kwargs.pop("logsnr_schedule")
    logsnr_max = diffusion_kwargs.pop("logsnr_max")
    logsnr_min = diffusion_kwargs.pop("logsnr_min")
    logsnr_fn = get_logsnr_schedule(
        logsnr_schedule, logsnr_min, logsnr_max, rescale=diffusion_kwargs.pop("allow_rescale", False)
    )
    diffusion_kwargs["sample_timesteps"] = args.sample_timesteps
    diffusion_kwargs.pop("train_timesteps", None)

    diffusion = GaussianDiffusion(logsnr_fn=logsnr_fn, w_guide=w_guide, **diffusion_kwargs)

    model_out_type = diffusion_kwargs.get("model_out_type", "both")
    out_channels = (2 if model_out_type == "both" else 1) * in_channels
    model_cfg = {k: v for k, v in config["model"].items() if k != "use_xformers"}
    model = UNet(
        out_channels=out_channels,
        num_classes=num_classes,
        multitags=multitags,
        **model_cfg,
    )
    if torch_state_dict is not None:
        params = torch_unet_to_flax(torch_state_dict, model)
    else:
        params = param_tree

    timestamp = datetime.now().strftime("%Y-%m-%dT%H%M%S%f")
    save_dir = os.path.join(args.save_dir, exp_name, timestamp)
    os.makedirs(save_dir, exist_ok=True)
    batch_size = args.batch_size
    total_size = args.total_size
    num_eval_batches = math.ceil(total_size / batch_size)
    shape = (batch_size, image_res, image_res, in_channels)

    with open(os.path.join(save_dir, "args.txt"), "w") as f:
        json.dump(vars(args), f)

    def save_one(arr):
        img = arr[..., 0] if arr.shape[-1] == 1 else arr
        with Image.fromarray(img, mode="L" if arr.shape[-1] == 1 else "RGB") as im:
            im.save(f"{save_dir}/{uuid.uuid4()}.png")

    # label stream (reference generate.py:118-136)
    uncond = args.uncond
    label_rng = np.random.RandomState(args.seed)
    if multitags:
        from vdiff_tpu.data import load_celeba_index

        _, attrs, _ = load_celeba_index(data_root, split="all")

        def next_labels(n):
            if uncond:
                return jnp.zeros((n, num_classes), jnp.float32)
            return jnp.asarray(attrs[label_rng.randint(len(attrs), size=(n,))], jnp.float32)
    elif use_cfg:

        def next_labels(n):
            if uncond:
                return jnp.zeros((n,), jnp.float32)
            return jnp.asarray(label_rng.randint(num_classes, size=(n,)) + 1, jnp.float32)
    else:

        def next_labels(n):
            return None

    @jax.jit
    def sample_batch(rng, labels):
        def denoise_fn(x_t, t_, y_):
            return model.apply({"params": params}, x_t, t_, y_, train=False)

        return diffusion.p_sample(denoise_fn, shape, rng, label=labels, use_ddim=args.use_ddim)

    base_key = jax.random.key(args.seed)
    with ThreadPoolExecutor(max_workers=os.cpu_count()) as pool:
        for i in trange(num_eval_batches):
            n = min(batch_size, total_size - i * batch_size)
            x = sample_batch(jax.random.fold_in(base_key, i), next_labels(batch_size))
            x = np.asarray(jax.device_get(x))[:n]
            x = np.clip(x * 127.5 + 127.5, 0, 255).astype(np.uint8)
            pool.map(save_one, list(x))
