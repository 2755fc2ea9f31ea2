"""Offline metrics CLI (FID, Precision/Recall) over a directory of generated
images — same flags as the reference ``eval.py``.

FID features run batched on the accelerator through the Flax FID-InceptionV3;
P&R uses the Flax VGG16 features with blocked pairwise distances."""

if __name__ == "__main__":
    import os
    import math
    from argparse import ArgumentParser
    from functools import partial

    import numpy as np
    from PIL import Image
    from tqdm import tqdm

    from vdiff_tpu import seed_all
    from vdiff_tpu.metrics import InceptionStatistics, calc_fd, get_precomputed
    from vdiff_tpu.metrics.precision_recall import ManifoldBuilder, calc_pr

    parser = ArgumentParser()
    parser.add_argument("--root", default="~/datasets", type=str)
    parser.add_argument("--dataset", choices=["mnist", "cifar10", "celeba", "synthetic"], default="cifar10")
    parser.add_argument("--model-device", default=0, type=int)
    parser.add_argument("--eval-device", default=0, type=int)
    parser.add_argument("--eval-batch-size", default=512, type=int)
    parser.add_argument("--eval-total-size", default=50000, type=int)
    parser.add_argument("--num-workers", default=4, type=int)
    parser.add_argument("--nhood-size", default=3, type=int)
    parser.add_argument("--row-batch-size", default=10000, type=int)
    parser.add_argument("--col-batch-size", default=10000, type=int)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--eval-dir", default="./images/eval")
    parser.add_argument("--precomputed-dir", default="./precomputed", type=str)
    parser.add_argument("--metrics", nargs="+", default=["fid", "pr"], type=str)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--folder-name", default="", type=str)
    args = parser.parse_args()

    root = os.path.expanduser(args.root)
    dataset = args.dataset
    print(f"Dataset: {dataset}")

    img_dir = args.eval_dir
    if args.folder_name:
        img_dir = os.path.join(img_dir, args.folder_name)

    eval_batch_size = args.eval_batch_size
    eval_total_size = args.eval_total_size

    class ImageFolder:
        EXTS = {"jpg", "jpeg", "png", "bmp", "webp", "tiff"}

        def __init__(self, img_dir):
            self.img_dir = img_dir
            self.img_list = [
                f for f in os.listdir(img_dir) if f.split(".")[-1].lower() in self.EXTS
            ]

        def __len__(self):
            return len(self.img_list)

        def load_batch(self, indices):
            out = []
            for i in indices:
                with Image.open(os.path.join(self.img_dir, self.img_list[i])) as im:
                    out.append(np.asarray(im.convert("RGB"), np.uint8))
            return np.stack(out)

    seed_all(args.seed)

    folder = ImageFolder(img_dir)
    indices = np.arange(len(folder))
    if len(folder) > eval_total_size:
        indices = np.random.choice(len(folder), size=eval_total_size, replace=False)

    def batches():
        for s in range(0, len(indices), eval_batch_size):
            yield folder.load_batch(indices[s : s + eval_batch_size])

    def eval_fid():
        istats = InceptionStatistics(input_transform=lambda im: (im.astype(np.float32) - 127.5) / 127.5)
        true_mean, true_var = get_precomputed(dataset, download_dir=args.precomputed_dir)
        istats.reset()
        for x in tqdm(batches(), desc="Computing Inception statistics"):
            istats(x)
        gen_mean, gen_var = istats.get_statistics()
        return calc_fd(gen_mean, gen_var, true_mean, true_var)

    def eval_pr():
        decimal_places = math.ceil(math.log(eval_total_size, 10))
        str_fmt = f".{decimal_places}f"
        _builder = partial(
            ManifoldBuilder,
            extr_batch_size=eval_batch_size,
            max_sample_size=eval_total_size,
            row_batch_size=args.row_batch_size,
            col_batch_size=args.col_batch_size,
            nhood_size=args.nhood_size,
        )
        manifold_path = os.path.join(args.precomputed_dir, f"pr_manifold_{dataset}.npz")
        if not os.path.exists(manifold_path):
            from vdiff_tpu.data import _build_dataset

            true_manifold = _builder(data=_build_dataset(dataset, root, "train")).manifold
            os.makedirs(args.precomputed_dir, exist_ok=True)
            np.savez(manifold_path, features=true_manifold.features, kth=true_manifold.kth)
        else:
            from vdiff_tpu.metrics.precision_recall import Manifold

            d = np.load(manifold_path)
            true_manifold = Manifold(d["features"], d["kth"])
        gen_manifold = _builder(data=folder).manifold

        precision, recall = calc_pr(
            gen_manifold, true_manifold,
            row_batch_size=args.row_batch_size, col_batch_size=args.col_batch_size,
        )
        return f"{precision:{str_fmt}}/{recall:{str_fmt}}"

    def warning(msg):
        def print_warning():
            print(msg)

        return print_warning

    for metric in set(args.metrics):
        result = {"fid": eval_fid, "pr": eval_pr}.get(
            metric, warning("Unsupported metric passed! Ignore.")
        )()
        print(f"{metric.upper()}: {result}")
