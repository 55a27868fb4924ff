#!/usr/bin/env python
"""Turnkey real-dataset accuracy anchoring (VERDICT r2 next #4).

The reference's entire evaluation is real-dataset training with test
accuracy as the oracle (reference: examples/sbatch_ssd_gnn_train.py:178-193,
270-289). This environment has no datasets and no egress, so this script is
the standing harness: the moment data (or egress for the ogb package's
downloader) exists, one invocation anchors a real accuracy number into
BASELINE.json "published" — no further plumbing needed.

  python examples/anchor.py                 # BASELINE config #1: GraphSAGE
                                            # 2-layer fanout 5,5 batch 1024
                                            # on ogbn-arxiv
  python examples/anchor.py --root /data/ogb
  python examples/anchor.py --data preprocessed --path DIR --num_classes C
                                            # any csc_*.npy artifact dir
                                            # (create_csc_graph.py output)
  python examples/anchor.py --check         # probe: report what's available

Exit codes: 0 = anchored, 2 = no dataset available (actionable message).
The offline CI path (tests/test_anchor.py) exercises the full flow on a
synthetic preprocessed-format directory, so the harness itself is proven
before real data ever shows up.
"""

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# expected band for config #1 (GraphSAGE fanout 5,5 minibatch on
# ogbn-arxiv): published DGL/OGB leaderboard numbers cluster at 0.69-0.72;
# anything below 0.65 is flagged as a parity failure, not recorded silently
ARXIV_OK_BAND = (0.65, 0.75)


def probe(root):
    """What can we anchor with? Returns (kind, detail)."""
    try:
        import ogb  # type: ignore  # noqa: F401
        have_ogb = True
    except ImportError:
        have_ogb = False
    raw = os.path.join(root, "ogbn_arxiv")
    have_raw = os.path.isdir(raw)
    return have_ogb, have_raw


def run_train(argv, timeout=7200):
    """Run examples/train.py with argv; return (accuracy, stdout)."""
    cmd = [sys.executable, os.path.join(HERE, "train.py")] + argv
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"train.py failed rc={out.returncode}")
    m = re.findall(r"Test accuracy: ([0-9.]+)", out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-4000:])
        raise RuntimeError("train.py printed no 'Test accuracy:' line "
                           "(was --eval dropped?)")
    return float(m[-1]), out.stdout


def write_anchor(baseline_path, dataset, accuracy, config, band=None):
    with open(baseline_path) as f:
        doc = json.load(f)
    pub = doc.setdefault("published", {})
    pub["real_anchor_dataset"] = dataset
    pub["real_anchor_accuracy"] = round(accuracy, 4)
    pub["real_anchor_config"] = config
    pub["real_anchor_utc"] = datetime.datetime.now(
        datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    if band is not None:
        pub["real_anchor_expected_band"] = list(band)
        pub["real_anchor_in_band"] = bool(band[0] <= accuracy <= band[1])
    with open(baseline_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"anchored {dataset} accuracy {accuracy:.4f} -> {baseline_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/data/ogb",
                   help="ogb dataset root (downloaded or to download into)")
    p.add_argument("--data", default="ogbn-arxiv",
                   help="ogbn-arxiv | preprocessed")
    p.add_argument("--path", default="", help="preprocessed artifact dir")
    p.add_argument("--num_classes", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--fan_out", default="5,5")
    p.add_argument("--hidden_channels", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--platform", default="",
                   help="forwarded to train.py (e.g. cpu)")
    p.add_argument("--baseline_json",
                   default=os.path.join(REPO, "BASELINE.json"))
    p.add_argument("--check", action="store_true",
                   help="probe availability and exit")
    args = p.parse_args(argv)

    if args.check or (args.data == "ogbn-arxiv" and not args.path):
        have_ogb, have_raw = probe(args.root)
        if args.check:
            print(f"ogb package: {have_ogb}; raw dir {args.root}/ogbn_arxiv: "
                  f"{have_raw}")
            return 0
        if not have_ogb and not have_raw:
            print(
                "anchor: no dataset available — the environment has no "
                "ogb package and no downloaded data under "
                f"{args.root}. When data/egress exists run either:\n"
                "  pip install ogb && python examples/anchor.py\n"
                "  (or) place create_csc_graph.py artifacts in DIR and run\n"
                "  python examples/anchor.py --data preprocessed --path DIR "
                "--num_classes C",
                file=sys.stderr)
            return 2

    train_argv = ["--data", args.data, "--epochs", str(args.epochs),
                  "--batch_size", str(args.batch_size),
                  "--fan_out", args.fan_out,
                  "--hidden_channels", str(args.hidden_channels),
                  "--learning_rate", str(args.learning_rate),
                  "--eval"]
    if args.data == "ogbn-arxiv":
        train_argv += ["--path", args.root]
    if args.path:
        train_argv += ["--path", args.path]
    if args.num_classes:
        train_argv += ["--num_classes", str(args.num_classes)]
    if args.platform:
        train_argv += ["--platform", args.platform]

    acc, _ = run_train(train_argv)
    band = ARXIV_OK_BAND if args.data == "ogbn-arxiv" else None
    config = {"data": args.data, "model": "sage",
              "fan_out": args.fan_out, "batch_size": args.batch_size,
              "hidden": args.hidden_channels, "epochs": args.epochs}
    write_anchor(args.baseline_json, args.data, acc, config, band)
    if band and not band[0] <= acc <= band[1]:
        print(f"WARNING: accuracy {acc:.4f} outside expected band {band} — "
              "investigate before publishing parity", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
