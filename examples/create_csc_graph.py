#!/usr/bin/env python
"""COO -> CSC preprocessing CLI.

Parity with the reference's offline graph converter
(reference: examples/create_csc_graph.py:276-304 — loads a COO
edge_index.npy, converts via DGL .formats('csc'), dumps
csc_indptr/csc_indices/csc_edge_ids.npy). Same artifact names/shapes, no DGL:
a direct stable counting sort (coala_gnn_tpu.graph.csc.coo_to_csc).

  python examples/create_csc_graph.py --edge_index /data/edge_index.npy \
      --num_nodes 10000000 --out /data/csc [--symmetrize]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from coala_gnn_tpu.graph.csc import coo_to_csc, save_csc


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--edge_index", type=str, required=True,
                   help=".npy COO edges, shape [2, E] or [E, 2]")
    p.add_argument("--num_nodes", type=int, default=0,
                   help="0 = infer as max id + 1")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--symmetrize", action="store_true",
                   help="add reverse edges (reference does this for OGB "
                        "citation graphs, dataloader.py:455-466)")
    args = p.parse_args(argv)

    t0 = time.perf_counter()
    edges = np.load(args.edge_index, mmap_mode="r")
    if edges.shape[0] == 2:
        src, dst = np.asarray(edges[0]), np.asarray(edges[1])
    else:
        src, dst = np.asarray(edges[:, 0]), np.asarray(edges[:, 1])
    n = args.num_nodes or int(max(src.max(), dst.max())) + 1
    if args.symmetrize:
        src, dst = (np.concatenate([src, dst]), np.concatenate([dst, src]))
    print(f"loaded {len(src)} edges over {n} nodes "
          f"in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    g = coo_to_csc(src, dst, n)
    print(f"CSC build: {time.perf_counter() - t0:.1f}s")
    save_csc(g, args.out)
    print(f"wrote csc_indptr/csc_indices/csc_edge_ids.npy to {args.out}")


if __name__ == "__main__":
    main()
