"""The native library must BUILD and expose every symbol — a silent build
failure would flip all native/oracle cross-checks into oracle-vs-oracle
no-ops (the _native() helper deliberately falls back quietly in
production)."""

import ctypes

import pytest


def test_native_lib_builds_and_exports():
    from coala_gnn_tpu.native import lib

    l = lib.get()   # raises CalledProcessError on a compile failure
    for sym in ("cg_sample_layer", "cg_sample_layer_typed",
                "cg_color_graph", "cg_color_graph_seeded",
                "cg_color_affinity", "cg_distribute_affinity",
                "cg_gather_rows_f32", "cg_gather_rows_u16"):
        assert hasattr(l, sym), f"missing native symbol {sym}"


def test_sampler_actually_uses_native(small_dataset):
    from coala_gnn_tpu.sampling.neighbor import NeighborSampler

    s = NeighborSampler(small_dataset.graph, [3], 8, seed=0)
    assert s._native is not None, "native sampler silently unavailable"
