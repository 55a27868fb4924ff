#!/usr/bin/env python
"""A/B comparison harness.

Parity with the reference's benchmark sweep scripts
(reference: examples/Cache_compare_script.sh:28-34 — nvshmem vs nccl vs
isolated backends; examples/Distribution_compare_script.sh:26-34 —
node_color vs baseline distribution; 4GB/16GB_script.sh — model x fanout x
cache-size grid), replacing SLURM job arrays with sequential in-process runs
and the absent output parser with examples/output_parser.py.

  python examples/compare.py --axis distribution --platform cpu
  python examples/compare.py --axis cache --platform cpu
  python examples/compare.py --axis model --platform cpu
"""

import argparse
import contextlib
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from output_parser import parse as parse_output  # noqa: E402


def run_config(argv):
    """Run the trainer in-process, capture + parse its stdout."""
    import train as train_mod
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_mod.main(argv)
    text = buf.getvalue()
    return parse_output(text), text


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--axis", default="distribution",
                   choices=["distribution", "cache", "model", "fanout",
                            "quantize"])
    p.add_argument("--platform", default="")
    p.add_argument("--num_nodes", type=int, default=20000)
    p.add_argument("--feature_dim", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--cache_size", type=int, default=64)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    base = ["--data", "synthetic", "--num_nodes", str(args.num_nodes),
            "--feature_dim", str(args.feature_dim),
            "--batch_size", str(args.batch_size),
            "--hidden_channels", "64", "--epochs", str(args.epochs),
            "--learning_rate", "0.01", "--eval"]
    if args.platform:
        base += ["--platform", args.platform]

    if args.axis == "distribution":
        # needs color metadata; generate once (parity with the reference's
        # offline preprocessing step before Distribution_compare)
        color_dir = tempfile.mkdtemp(prefix="coala_colors_")
        import generate_colors
        generate_colors.main(["--data", "synthetic",
                              "--num_nodes", str(args.num_nodes),
                              "--feature_dim", str(args.feature_dim),
                              "--out", color_dir])
        configs = {
            "baseline": base + ["--fan_out", "5,5", "--distribution", "baseline",
                                "--cache_size", str(args.cache_size)],
            "node_color": base + ["--fan_out", "5,5",
                                  "--distribution", "node_color",
                                  "--color_dir", color_dir,
                                  "--cache_size", str(args.cache_size)],
        }
    elif args.axis == "cache":
        configs = {
            "no_cache": base + ["--fan_out", "5,5", "--cache_size", "0"],
            f"isolated_{args.cache_size}mb": base + ["--fan_out", "5,5",
                                                     "--cache_size",
                                                     str(args.cache_size)],
            f"isolated_{4 * args.cache_size}mb": base + [
                "--fan_out", "5,5", "--cache_size", str(4 * args.cache_size)],
        }
    elif args.axis == "model":
        configs = {m: base + ["--fan_out", "5,5", "--model_type", m,
                              "--cache_size", str(args.cache_size)]
                   for m in ["sage", "gcn", "gat"]}
    elif args.axis == "quantize":
        # f32 vs int8 cache lines at the SAME MB budget (no reference
        # analogue): int8 holds ~4x the lines, so hit ratio and accuracy
        # impact are read side by side
        configs = {
            "f32_lines": base + ["--fan_out", "5,5",
                                 "--cache_size", str(args.cache_size)],
            "int8_lines": base + ["--fan_out", "5,5", "--quantize",
                                  "--cache_size", str(args.cache_size)],
        }
    else:  # fanout — the reference grid's "5,5" vs "10,5,5" axis
        configs = {f: base + ["--fan_out", f, "--cache_size", str(args.cache_size)]
                   for f in ["5,5", "10,5,5"]}

    results = {}
    for name, argv in configs.items():
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        parsed, _ = run_config(argv)
        results[name] = parsed
        st = parsed.get("steady_epoch_time_s")
        acc = parsed.get("test_accuracy")
        hits = [e.get("cache_hit_ratio") for e in parsed["epochs"]
                if "cache_hit_ratio" in e]
        print(f"{name:24s} steady_epoch={st and round(st, 3)}s "
              f"acc={acc} hit_last={hits[-1] if hits else None}",
              file=sys.stderr, flush=True)

    if args.json:
        print(json.dumps(results, indent=2))
    else:
        print(f"{'config':26s} {'epoch_s':>9s} {'test_acc':>9s} {'hit':>6s}")
        for name, r in results.items():
            hits = [e.get("cache_hit_ratio") for e in r["epochs"]
                    if "cache_hit_ratio" in e]
            print(f"{name:26s} {r.get('steady_epoch_time_s', 0):9.3f} "
                  f"{r.get('test_accuracy', float('nan')):9.4f} "
                  f"{hits[-1] if hits else float('nan'):6.3f}")


if __name__ == "__main__":
    main()
