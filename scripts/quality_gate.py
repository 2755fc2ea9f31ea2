"""Quality gate: one command running train → generate → eval through the REAL
CLIs (reference workflow README.md:94-163).

Default invocation runs end-to-end TODAY on this box: synthetic dataset, tiny
model, a handful of steps — proving the full chain (checkpoint produced by
train.py, consumed by generate.py, images scored by eval.py). Metrics whose
weights/statistics are absent (FID-Inception, VGG16, TTUR npz — no network
egress here) are skipped gracefully by eval.py and reported as such.

On weight/data-arrival day the REAL gate is argument-only — no code changes:

    python scripts/quality_gate.py \
        --config vdiff_tpu/configs/cifar10_cond.json --dataset cifar10 \
        --data-root ~/datasets --precomputed-dir ./precomputed \
        --epochs 2160 --total-size 50000 --sample-timesteps 256 \
        --batch-size 128 --metrics fid is pr

(with ``precomputed/`` holding the TTUR ``fid_stats_cifar10_train.npz`` and the
converted Inception/VGG weight npz files per vdiff_tpu/metrics/manifests.py.)
Target: FID 2.58 / IS 9.76 at w=0 (reference README.md:118).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLATFORM = ""  # set from --platform in main()


def run_stage(name, argv, env=None):
    print(f"\n=== {name}: {' '.join(argv)}", flush=True)
    env = dict(env or os.environ)
    if PLATFORM:
        # survives sitecustomize JAX_PLATFORMS clobbering (vdiff_tpu/__init__)
        env["VDIFF_JAX_PLATFORM"] = PLATFORM
    proc = subprocess.run([sys.executable] + argv, cwd=REPO, env=env)
    if proc.returncode != 0:
        print(f"quality gate FAILED at stage '{name}' (exit {proc.returncode})")
        sys.exit(proc.returncode)


def latest_ckpt(exp_root):
    """Newest run dir's newest checkpoint under exps/dpm_<name>/<timestamp>/ckpts."""
    runs = [
        os.path.join(r, d)
        for r in [exp_root]
        for d in (os.listdir(r) if os.path.isdir(r) else [])
    ]
    if not runs:
        raise FileNotFoundError(f"no runs under {exp_root}")
    # newest run by mtime (name sort would misorder non-ISO timestamps)
    ckpt_dir = os.path.join(max(runs, key=os.path.getmtime), "ckpts")
    # only integer tags + last/latest count (skips e.g. an interrupted
    # save's ckpt_3.orbax-checkpoint-tmp-<ts>); numeric epoch order
    # (ckpt_10 > ckpt_9), ckpt_last/latest outrank all — mirrors
    # CheckpointManager.latest_path (train_lib.py), duplicated here so the
    # gate driver stays jax-import-free
    cands = [
        d for d in os.listdir(ckpt_dir)
        if d.startswith("ckpt_")
        and (d.split("_", 1)[1].isdigit() or d.split("_", 1)[1] in ("last", "latest"))
    ]
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")

    def key(d):
        tag = d.split("_", 1)[1]
        return (1, 0) if tag in ("last", "latest") else (0, int(tag))

    return os.path.join(ckpt_dir, max(cands, key=key))


def main():
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--config", default="vdiff_tpu/configs/synthetic_smoke.json")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data-root", default="~/datasets")
    p.add_argument("--work-dir", default="/tmp/vdiff_quality_gate")
    p.add_argument("--precomputed-dir", default="./precomputed")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--total-size", type=int, default=16, help="images to generate")
    p.add_argument("--sample-timesteps", type=int, default=4)
    p.add_argument("--eval-total-size", type=int, default=16)
    p.add_argument("--eval-batch-size", type=int, default=16)
    p.add_argument("--metrics", nargs="+", default=["fid", "is", "pr", "nll"])
    p.add_argument("--w-guide", type=float, default=0.0, help="0 = FID-2.58 headline condition")
    p.add_argument("--skip-train", action="store_true", help="reuse the newest existing run")
    p.add_argument("--ckpt-path", default="", help="explicit checkpoint (implies --skip-train)")
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--dp", action="store_true",
                   help="shard bulk sampling and the metric batches over all devices")
    p.add_argument("--platform", default="",
                   help="pin every stage's JAX platform (e.g. 'cpu' to verify the "
                        "chain without a TPU; the plain env var is clobbered by "
                        "hosted sitecustomize overrides)")
    args = p.parse_args()
    global PLATFORM
    PLATFORM = args.platform

    exp_dir = os.path.join(args.work_dir, "exps")
    img_dir = os.path.join(args.work_dir, "images")
    os.makedirs(args.work_dir, exist_ok=True)

    # 1) train.py — real CLI, writes config dump + checkpoints + sample grids
    if not (args.skip_train or args.ckpt_path):
        run_stage("train", [
            "train.py", "--config-path", args.config, "--exp-dir", exp_dir,
            "--data_root", args.data_root, "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size), "--use-ema", "--use-ddim",
        ])

    exp_name = os.path.splitext(os.path.basename(args.config))[0]
    ckpt = args.ckpt_path or latest_ckpt(os.path.join(exp_dir, f"dpm_{exp_name}"))
    print(f"\ncheckpoint: {ckpt}")

    # 2) generate.py — bulk sampling from that checkpoint
    gen_args = [
        "generate.py", "--config-path", args.config, "--ckpt-path", ckpt,
        "--save-dir", img_dir, "--total-size", str(args.total_size),
        "--batch-size", str(min(args.batch_size, args.total_size)),
        "--sample-timesteps", str(args.sample_timesteps), "--use-ddim",
        "--w-guide", str(args.w_guide), "--data-root", args.data_root,
    ]
    if args.use_ema:
        gen_args.append("--use-ema")
    if args.dp:
        gen_args.append("--dp")
    run_stage("generate", gen_args)

    # generate.py nests images under save_dir/<config>_<suffix>/<timestamp>/;
    # evaluate THIS run's images — the newest png-bearing dir by mtime, not
    # os.walk order (which once handed a stale earlier run to eval)
    png_dirs = [
        root for root, _, files in os.walk(img_dir)
        if any(f.endswith(".png") for f in files)
    ]
    img_root = max(png_dirs, key=os.path.getmtime) if png_dirs else img_dir

    # 3) eval.py — FID / IS / P&R over the generated directory (+ nll via the
    # checkpoint); metrics lacking local weights are skipped, not fatal
    eval_args = [
        "eval.py", "--dataset", args.dataset, "--root", args.data_root,
        "--eval-dir", img_root, "--precomputed-dir", args.precomputed_dir,
        "--eval-total-size", str(args.eval_total_size),
        "--eval-batch-size", str(args.eval_batch_size),
        "--metrics", *args.metrics,
        "--config-path", args.config, "--ckpt-path", ckpt,
    ]
    if args.use_ema and "nll" in args.metrics:
        eval_args.append("--use-ema")
    if args.dp:
        eval_args.append("--dp")
    run_stage("eval", eval_args)

    print(json.dumps({"quality_gate": "ok", "checkpoint": ckpt, "images": img_root}))


if __name__ == "__main__":
    main()
