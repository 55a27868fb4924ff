#!/usr/bin/env python
"""Generate a tiny REFERENCE-FORMAT dataset fixture (VERDICT r1 item 5).

Writes the IGB raw .npy directory layout the reference trainer consumes
(reference: examples/dataloader.py:18-124 — node_feat.npy float32,
node_label_19.npy float32, paper__cites__paper/edge_index.npy [E, 2]), and
optionally the csc_*.npy preprocessed layout (create_csc_graph.py output
surface), from a learnable synthetic graph. De-risks load_igb_npy /
load_preprocessed and the coloring artifact interop offline — the env has
no real IGB/OGB data and no egress.

Usage:
  python examples/make_igb_fixture.py --out /tmp/igb_fixture \
      [--num_nodes 4000] [--dim 32] [--size tiny] [--csc]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coala_gnn_tpu.graph.datasets import synthetic_graph


def write_igb_fixture(out: str, num_nodes: int = 4000, dim: int = 32,
                      size: str = "tiny", avg_degree: int = 8,
                      seed: int = 0, csc: bool = False) -> str:
    """Returns the fixture root (pass as --path with --data igb)."""
    ds = synthetic_graph(num_nodes=num_nodes, avg_degree=avg_degree,
                         feature_dim=dim, num_classes=19, seed=seed)
    paper = os.path.join(out, size, "processed", "paper")
    cites = os.path.join(out, size, "processed", "paper__cites__paper")
    os.makedirs(paper, exist_ok=True)
    os.makedirs(cites, exist_ok=True)

    np.save(os.path.join(paper, "node_feat.npy"),
            ds.features.astype(np.float32))
    # reference stores labels as float32 (dataloader.py:80-101)
    np.save(os.path.join(paper, "node_label_19.npy"),
            ds.labels.astype(np.float32))
    # [E, 2] (src, dst) pairs from the CSC graph
    deg = np.diff(ds.graph.indptr)
    dst = np.repeat(np.arange(ds.graph.num_nodes, dtype=np.int32), deg)
    src = np.asarray(ds.graph.indices, dtype=np.int32)
    np.save(os.path.join(cites, "edge_index.npy"),
            np.stack([src, dst], axis=1))

    if csc:
        from coala_gnn_tpu.graph.csc import save_csc
        pre = os.path.join(out, "preprocessed")
        os.makedirs(pre, exist_ok=True)
        save_csc(ds.graph, pre)
        np.save(os.path.join(pre, "features.npy"),
                ds.features.astype(np.float32))
        np.save(os.path.join(pre, "labels.npy"), ds.labels.astype(np.int32))
        np.save(os.path.join(pre, "train_idx.npy"),
                ds.train_idx.astype(np.int64))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_nodes", type=int, default=4000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--size", type=str, default="tiny")
    p.add_argument("--avg_degree", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--csc", action="store_true",
                   help="also write the csc_*.npy preprocessed layout")
    a = p.parse_args()
    root = write_igb_fixture(a.out, a.num_nodes, a.dim, a.size,
                             a.avg_degree, a.seed, a.csc)
    print(f"wrote IGB-format fixture to {root}", file=sys.stderr)


if __name__ == "__main__":
    main()
