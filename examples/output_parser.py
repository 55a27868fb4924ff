#!/usr/bin/env python
"""Trainer stdout parser.

The reference's benchmark scripts pipe stdout through an
``output_txt_parser.py`` that is absent from its repo
(reference: examples/4GB_script.sh:40, Cache_compare_script.sh:36,
Distribution_compare_script.sh:36). This is that tool, for our trainer's
output format: extracts per-epoch time / loss / feature-agg time / sampled
nodes, cache hit ratios, and final test accuracy.

  python examples/output_parser.py run.log            # table
  python examples/output_parser.py run.log --json     # machine-readable
"""

import argparse
import json
import re
import sys
from typing import Dict, List

EPOCH_RE = re.compile(
    r"Epoch (\d+) \| loss ([\d.eE+-]+) \| batch acc ([\d.]+|n/a) \| "
    r"Epoch Time: ([\d.]+)s \| feature agg time ([\d.]+)s \| "
    r"sampled nodes (\d+)")
CACHE_RE = re.compile(r"Cache hit ratio: ([\d.]+) \((\d+) hits / (\d+) misses\)")
ACC_RE = re.compile(r"Test accuracy: ([\d.]+)")


def parse(text: str) -> Dict:
    epochs: List[Dict] = []
    for m in EPOCH_RE.finditer(text):
        epochs.append({
            "epoch": int(m.group(1)),
            "loss": float(m.group(2)),
            "batch_acc": (float(m.group(3)) if m.group(3) != "n/a"
                          else None),
            "epoch_time_s": float(m.group(4)),
            "feature_agg_time_s": float(m.group(5)),
            "sampled_nodes": int(m.group(6)),
        })
    for i, m in enumerate(CACHE_RE.finditer(text)):
        if i < len(epochs):
            epochs[i]["cache_hit_ratio"] = float(m.group(1))
            epochs[i]["cache_hits"] = int(m.group(2))
            epochs[i]["cache_misses"] = int(m.group(3))
    acc = ACC_RE.search(text)
    out = {"epochs": epochs}
    if acc:
        out["test_accuracy"] = float(acc.group(1))
    if epochs:
        out["mean_epoch_time_s"] = sum(e["epoch_time_s"] for e in epochs) / len(epochs)
        # steady-state = skip epoch 0 (compile + cold cache)
        tail = epochs[1:] or epochs
        out["steady_epoch_time_s"] = sum(e["epoch_time_s"] for e in tail) / len(tail)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logfile", nargs="?", default="-")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    text = sys.stdin.read() if args.logfile == "-" else open(args.logfile).read()
    result = parse(text)
    if args.json:
        print(json.dumps(result, indent=2))
        return
    for e in result["epochs"]:
        hit = f"  hit={e['cache_hit_ratio']:.3f}" if "cache_hit_ratio" in e else ""
        print(f"epoch {e['epoch']}: {e['epoch_time_s']:.2f}s  "
              f"loss={e['loss']:.4f}  agg={e['feature_agg_time_s']:.2f}s"
              f"{hit}")
    if "test_accuracy" in result:
        print(f"test accuracy: {result['test_accuracy']:.4f}")
    if "steady_epoch_time_s" in result:
        print(f"steady epoch time: {result['steady_epoch_time_s']:.2f}s")


if __name__ == "__main__":
    main()
