"""Offline metrics CLI over a directory of generated images — same flags as
the reference ``eval.py`` plus an ``nll`` metric (bits/dim via the full
per-timestep VLB scan, reference diffusion.py:555-576, which upstream only
exposes as a library call).

FID features run batched on the accelerator through the Flax FID-InceptionV3;
P&R uses the Flax VGG16 features with blocked pairwise distances. The ``nll``
mode additionally needs ``--config-path``/``--ckpt-path`` to rebuild the
denoiser."""

import math
import os

import numpy as np


def iter_image_batches(folder, total_size, batch_size, rng):
    """Uniformly subsample the folder to total_size and yield uint8 batches."""
    indices = np.arange(len(folder))
    if len(folder) > total_size:
        indices = rng.choice(len(folder), size=total_size, replace=False)
    for s in range(0, len(indices), batch_size):
        yield folder.load_batch(indices[s : s + batch_size])


def compute_fid(batches, dataset, precomputed_dir, mesh=None):
    from tqdm import tqdm

    from vdiff_tpu.metrics import InceptionStatistics, calc_fd, get_precomputed

    istats = InceptionStatistics(
        input_transform=lambda im: (im.astype(np.float32) - 127.5) / 127.5,
        mesh=mesh,
    )
    true_mean, true_var = get_precomputed(dataset, download_dir=precomputed_dir)
    for x in tqdm(batches, desc="Computing Inception statistics"):
        istats(x)
    gen_mean, gen_var = istats.get_statistics()
    return calc_fd(gen_mean, gen_var, true_mean, true_var)


def compute_is(batches, splits, mesh=None):
    """Inception Score over the generated images (the reference publishes IS
    numbers, README.md:118, but ships no IS code — see metrics/inception_score)."""
    from tqdm import tqdm

    from vdiff_tpu.metrics.inception_score import InceptionScoreStatistics

    stats = InceptionScoreStatistics(
        input_transform=lambda im: (im.astype(np.float32) - 127.5) / 127.5,
        splits=splits,
        mesh=mesh,
    )
    for x in tqdm(batches, desc="Computing Inception-Score statistics"):
        stats(x)
    mean, std = stats.get_statistics()
    return f"{mean:.4f} +/- {std:.4f}"


def load_true_manifold(builder, dataset, root, precomputed_dir):
    """Real-data P&R manifold, cached as an npz next to the FID stats.

    celeba uses the full 202,599-image split (reference eval.py:105-107);
    others use train."""
    from vdiff_tpu.metrics.precision_recall import Manifold

    from vdiff_tpu.data import _build_dataset

    split = "all" if dataset == "celeba" else "train"
    # split is part of the cache key: the celeba manifold moved from 'train'
    # to 'all' (reference eval.py:105-107) and must not reuse stale caches
    path = os.path.join(precomputed_dir, f"pr_manifold_{dataset}_{split}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return Manifold(d["features"], d["kth"])
    manifold = builder(data=_build_dataset(dataset, root, split)).manifold
    os.makedirs(precomputed_dir, exist_ok=True)
    np.savez(path, features=manifold.features, kth=manifold.kth)
    return manifold


def compute_pr(folder, args, dataset, root, mesh=None):
    from functools import partial

    from vdiff_tpu.metrics.precision_recall import ManifoldBuilder, calc_pr

    builder = partial(
        ManifoldBuilder,
        extr_batch_size=args.eval_batch_size,
        max_sample_size=args.eval_total_size,
        row_batch_size=args.row_batch_size,
        col_batch_size=args.col_batch_size,
        nhood_size=args.nhood_size,
        mesh=mesh,
    )
    true_manifold = load_true_manifold(builder, dataset, root, args.precomputed_dir)
    gen_manifold = builder(data=folder).manifold
    precision, recall = calc_pr(
        gen_manifold, true_manifold,
        row_batch_size=args.row_batch_size, col_batch_size=args.col_batch_size,
        mesh=mesh,
    )
    decimal_places = math.ceil(math.log(args.eval_total_size, 10))
    return f"{precision:.{decimal_places}f}/{recall:.{decimal_places}f}"


def compute_nll(args, dataset, root, mesh=None):
    """Test-set bits/dim via the jitted per-timestep VLB scan. With a mesh,
    each batch is sharded over the data axis and jit partitions the
    denoiser forwards inside the scan across devices."""
    import jax
    import jax.numpy as jnp
    from tqdm import tqdm

    from vdiff_tpu import DATA_INFO
    from vdiff_tpu.data import _build_dataset
    from vdiff_tpu.native import normalize_flip
    from vdiff_tpu.factory import (
        build_diffusion,
        build_unet,
        load_checkpoint_params,
        load_experiment_config,
    )

    if not (args.config_path and args.ckpt_path):
        return "nll requires --config-path and --ckpt-path"

    params, head_keys, is_torch = load_checkpoint_params(args.ckpt_path, use_ema=args.use_ema)
    use_cfg = "class_embed" in head_keys
    config, _ = load_experiment_config(args.config_path)
    info = DATA_INFO[dataset]
    diffusion, _ = build_diffusion(config["diffusion"], w_guide=0.0, continuous_gate=False)
    model = build_unet(
        config["model"],
        in_channels=info["channels"],
        model_out_type=config["diffusion"]["model_out_type"],
        num_classes=info.get("num_classes", 0) if use_cfg else 0,
        multitags=info.get("multitags", False) if use_cfg else False,
        use_flash=jax.default_backend() == "tpu",
    )
    if is_torch:
        from vdiff_tpu.models.convert import torch_unet_to_flax

        params = torch_unet_to_flax(params, model)

    split = "test" if dataset != "celeba" else "all"
    ds = _build_dataset(dataset, root, split)
    B = args.eval_batch_size

    @jax.jit
    def bpd_batch(x, y, rng):
        def denoise_fn(x_t, t_, y_):
            return model.apply({"params": params}, x_t, t_, y_, train=False)

        # conditional checkpoints evaluate the conditional VLB: y flows through
        # (reference diffusion.py:555 calc_all_bpd takes y)
        total_bpd, _, _, _ = diffusion.calc_all_bpd(denoise_fn, x, y, rng)
        return total_bpd

    n = min(len(ds), args.eval_total_size)
    if n <= 0:
        return "no samples to evaluate (empty split or --eval-total-size 0)"
    B = min(B, n)  # small datasets: one full-sized batch at most
    if mesh is not None and B % mesh.devices.size:
        raise SystemExit(
            f"--dp needs the effective nll batch ({B}) divisible by "
            f"{mesh.devices.size} devices"
        )
    key = jax.random.key(args.seed)
    totals = []
    for s in tqdm(range(0, n - B + 1, B), desc="Computing VLB"):
        idx = np.arange(s, s + B)
        raw = ds.load_batch(idx) if hasattr(ds, "load_batch") else ds.images[idx]
        x = jnp.asarray(normalize_flip(np.ascontiguousarray(raw)))  # uint8 → [-1, 1] f32
        y = jnp.asarray(np.asarray(ds.targets)[idx], jnp.float32) if use_cfg else None
        if mesh is not None:
            # every host loads the full eval batch and the mesh is host-local
            # under multi-process (resolve_eval_mesh), so a plain device_put
            # with the batch sharding is right in both cases — shard_batch's
            # process_count()>1 branch expects a GLOBAL mesh and loader-sharded
            # per-host data, neither of which holds here
            from vdiff_tpu.parallel import batch_sharding

            x = jax.device_put(x, batch_sharding(mesh, x.ndim))
            if y is not None:
                y = jax.device_put(y, batch_sharding(mesh, y.ndim))
        totals.append(np.asarray(bpd_batch(x, y, jax.random.fold_in(key, s))))
    used = len(totals) * B
    if used < n:  # static shapes: the sub-batch tail is dropped, say so
        print(f"nll computed over {used}/{n} samples (tail < batch size dropped)")
    return float(np.concatenate(totals).mean())


def main(args):
    from vdiff_tpu import seed_all

    seed_all(args.seed)
    root = os.path.expanduser(args.root)
    dataset = args.dataset
    print(f"Dataset: {dataset}")

    img_dir = os.path.join(args.eval_dir, args.folder_name) if args.folder_name else args.eval_dir

    # --dp: metric batches (feature nets, distance tiles, the VLB scan)
    # sharded over all devices; None on one device → unchanged loops
    from vdiff_tpu.metrics.device_apply import resolve_eval_mesh

    mesh = resolve_eval_mesh(getattr(args, "dp", False))

    for metric in sorted(set(args.metrics)):
        try:
            result = _compute_metric(metric, args, dataset, root, img_dir, mesh)
        except FileNotFoundError as e:
            # metric weights/statistics are local files here (no egress);
            # missing ones skip the metric instead of killing the run
            print(f"{metric.upper()} skipped: {e}")
            continue
        if result is None:
            print(f"Unsupported metric {metric!r}! Ignore.")
            continue
        print(f"{metric.upper()}: {result}")


def _compute_metric(metric, args, dataset, root, img_dir, mesh=None):
    from vdiff_tpu.data import ImageFolder

    if metric == "nll":
        return compute_nll(args, dataset, root, mesh=mesh)
    if metric not in ("fid", "is", "pr"):
        return None
    folder = ImageFolder(img_dir)
    if len(folder) == 0:
        raise FileNotFoundError(f"no images found under '{img_dir}'")
    if metric == "pr":
        return compute_pr(folder, args, dataset, root, mesh=mesh)
    batches = iter_image_batches(
        folder, args.eval_total_size, args.eval_batch_size, np.random
    )
    if metric == "fid":
        return compute_fid(batches, dataset, args.precomputed_dir, mesh=mesh)
    return compute_is(batches, args.is_splits, mesh=mesh)


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument("--root", default="~/datasets", type=str)
    parser.add_argument("--dataset", choices=["mnist", "cifar10", "celeba", "synthetic"], default="cifar10")
    parser.add_argument("--model-device", default=0, type=int, help="(parity no-op: JAX places via the mesh)")
    parser.add_argument("--eval-device", default=0, type=int, help="(parity no-op: JAX places via the mesh)")
    parser.add_argument("--eval-batch-size", default=512, type=int)
    parser.add_argument("--eval-total-size", default=50000, type=int)
    parser.add_argument("--num-workers", default=4, type=int, help="(parity no-op: batched native decode)")
    parser.add_argument("--nhood-size", default=3, type=int)
    parser.add_argument("--row-batch-size", default=10000, type=int)
    parser.add_argument("--col-batch-size", default=10000, type=int)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--eval-dir", default="./images/eval")
    parser.add_argument("--precomputed-dir", default="./precomputed", type=str)
    parser.add_argument("--metrics", nargs="+", default=["fid", "pr"], type=str,
                        help="any of: fid, is, pr, nll (nll needs --config-path/--ckpt-path)")
    parser.add_argument("--is-splits", default=10, type=int,
                        help="number of splits for the Inception Score std")
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--folder-name", default="", type=str)
    parser.add_argument("--config-path", default="", type=str, help="experiment config (nll only)")
    parser.add_argument("--ckpt-path", default="", type=str, help="checkpoint (nll only)")
    parser.add_argument("--use-ema", action="store_true", help="EMA weights for nll")
    parser.add_argument("--dp", action="store_true",
                        help="shard metric batches (feature nets, distance tiles, "
                             "the nll VLB scan) over all devices")

    main(parser.parse_args())
