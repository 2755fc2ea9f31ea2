"""Multi-host TPU pod launcher — the TPU-native counterpart of the reference's
SLURM/torchrun launcher (scripts/job_slurm.py: 2-node × 4-GPU sbatch with c10d
rendezvous).

On Cloud TPU pods there is no rendezvous to wire up: every host runs the SAME
command and ``jax.distributed.initialize()`` discovers the slice topology from
the TPU metadata. This script emits (and optionally runs) the per-host launch:

  python scripts/launch_tpu_pod.py --tpu-name my-pod --zone us-central2-b \
      -- python train.py --config-path vdiff_tpu/configs/cifar10_cond.json \
         --distributed --use-cfg --use-ema

Fault handling mirrors the reference's elastic setup (job_slurm.py:48-57,
train.py:214-224): PYTHONFAULTHANDLER is enabled, the command is retried up to
--max-restarts times, and train.py force-enables checkpoint resume under
--distributed so relaunches continue from the last checkpoint.
"""

import argparse
import shlex
import subprocess
import sys


def build_worker_command(train_argv, max_restarts: int) -> str:
    inner = " ".join(shlex.quote(a) for a in train_argv)
    return (
        "export PYTHONFAULTHANDLER=1; "
        f"for i in $(seq 0 {max_restarts}); do "
        f"{inner} && break; "
        'echo "[launch_tpu_pod] attempt $i failed; restarting from last checkpoint"; '
        "done"
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu-name", required=True)
    parser.add_argument("--zone", required=True)
    parser.add_argument("--project", default=None)
    parser.add_argument("--max-restarts", type=int, default=3)
    parser.add_argument("--dry-run", action="store_true", help="print, don't execute")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- followed by the training command")
    args = parser.parse_args()

    train_argv = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not train_argv:
        parser.error("missing training command after --")

    worker_cmd = build_worker_command(train_argv, args.max_restarts)
    gcloud = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu_name,
        f"--zone={args.zone}", "--worker=all", f"--command={worker_cmd}",
    ]
    if args.project:
        gcloud.insert(5, f"--project={args.project}")

    print(" ".join(shlex.quote(a) for a in gcloud))
    if not args.dry_run:
        sys.exit(subprocess.call(gcloud))


if __name__ == "__main__":
    main()
