"""bench.py must stay runnable: the driver executes it at round end.
Exercises run_resident end-to-end on a tiny CPU config (both line
formats) and checks the JSON contract fields."""

import numpy as np

import bench
from coala_gnn_tpu.graph.datasets import synthetic_graph


def _tiny(quantize):
    ds = synthetic_graph(num_nodes=3000, avg_degree=8, feature_dim=32,
                         num_classes=4, seed=0)
    return bench.run_resident(ds, B=32, fanouts=[4, 3], dim=32, hidden=32,
                              cache_mb=16, bf16=False, warmup=2, steps=4,
                              quantize=quantize)


def test_bench_run_resident_contract():
    res = _tiny(quantize=False)
    assert res["metric"] == "train_edges_per_s_per_chip"
    assert res["value"] > 0 and res["unit"] == "edges/s"
    assert 0.0 <= res["cache_hit_ratio"] <= 1.0
    assert res["config"]["cache_lines"] == "float32"
    # full prewarm at this size -> fused windows all hit
    assert res["cache_hit_ratio"] == 1.0


def test_bench_run_resident_quantized():
    res = _tiny(quantize=True)
    assert res["value"] > 0
    assert res["config"]["cache_lines"] == "int8"
    assert res["cache_hit_ratio"] == 1.0


def test_bench_run_resident_pressure_staged():
    """The capacity-pressure configuration bench.py runs on the chip:
    degree priorities + staged windows + int8 transport, capacity < nodes."""
    ds = synthetic_graph(num_nodes=3000, avg_degree=8, feature_dim=32,
                         num_classes=4, seed=0)
    res = bench.run_resident(ds, B=32, fanouts=[4, 3], dim=32, hidden=32,
                             cache_mb=1, bf16=False, warmup=2, steps=8,
                             prewarm_frac=1.0, tag="resident-pressure",
                             priorities="degree", stage_transport="int8",
                             window=4)
    assert res["value"] > 0
    assert res["config"]["stage_transport"] == "int8"
    assert res["config"]["priorities"] == "degree"
    # 1 MB at dim 32 = 2048 lines < 3000 nodes: genuine pressure — the
    # associative engine ran with partial coverage
    assert res["cache_hit_ratio"] < 1.0
