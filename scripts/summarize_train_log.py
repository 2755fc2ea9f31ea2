"""Distill a train.py stdout log (tqdm progress lines) into a compact
epoch→loss table for the committed TPU run record.

Usage: python scripts/summarize_train_log.py /tmp/tpu_flagship_train.log
"""

import re
import sys


def summarize(path):
    # final per-epoch postfix: "E/T epochs: 100%|...| S/S [...] loss=X]"
    pat = re.compile(r"(\d+)/(\d+) epochs:\s*100%.*?loss=([0-9.eE+-]+)")
    losses = {}
    with open(path, errors="replace") as f:
        for line in f:
            for m in pat.finditer(line):
                losses[int(m.group(1))] = float(m.group(3))
    return losses


if __name__ == "__main__":
    losses = summarize(sys.argv[1])
    epochs = sorted(losses)
    print(f"epochs logged: {len(epochs)} (1..{epochs[-1] if epochs else 0})")
    step = max(1, len(epochs) // 32)
    for e in epochs[::step] + ([epochs[-1]] if epochs and epochs[-1] != epochs[::step][-1] else []):
        print(f"epoch {e:4d}  loss {losses[e]:.4f}")
