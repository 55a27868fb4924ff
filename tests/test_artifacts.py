"""Measured-artifact invariants (round-5 done-criteria as regressions).

These tests read the committed measurement artifacts and assert the
claims the docs make about them, so a future change that regenerates an
artifact below its claimed quality fails CI instead of silently shipping
a weaker number with stale prose (the r3 "never below 7.9x" incident).
Artifacts are committed JSON; the tests skip when one is absent (e.g. a
fresh clone before any on-chip run).
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(pattern):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    if not paths:
        pytest.skip(f"no artifact matching {pattern}")
    with open(paths[-1]) as f:
        return json.load(f)


def test_pressure_sweep_stability():
    """VERDICT r4 next #1 done-criteria: every budget point's MIN >= 3x
    uncached, max/min spread <= 1.5x, monotone means."""
    art = _load("PRESSURE_SWEEP_r0[5-9].json")
    assert art["complete"]
    pts = sorted(art["points"], key=lambda p: -p["cache_mb"])
    assert len(pts) >= 4
    prev_mean = float("inf")
    for p in pts:
        assert p["vs_uncached_min"] >= 3.0, p
        assert p["edges_per_s_max"] / p["edges_per_s_min"] <= 1.505, p
        assert p["edges_per_s_mean"] <= prev_mean * 1.001, p
        prev_mean = p["edges_per_s_mean"]


def test_scaling_reconciliation_exact():
    """The comm model is falsified against compiled HLO: exchange and
    grad-psum byte ratios are exactly 1.0; node_local's data plane stays
    inside host groups."""
    art = _load("SCALING_r0[5-9].json")
    rec = art["hlo_reconciliation"]["results"]
    assert {r["devices"] for r in rec} >= {4, 8}
    for res in rec:
        for row in res["lookup"]:
            assert row["ratio_hlo_over_model"] == 1.0, row
            if row["mode"] == "node_local":
                assert row["feature_a2a_within_host"] is True
                # only scalar count reductions may cross hosts
                assert row["cross_host_control_bytes"] < 64
        assert res["grad_psum"]["ratio_hlo_over_model"] == 1.0


def test_node_local_zero_overhead():
    art = _load("NODE_LOCAL_AB_r0[5-9].json")
    # never materially slower than flat sharded (>= 0.9 allows noise)
    assert art["node_local_over_sharded"] >= 0.9


def test_refscale_at_reference_shapes():
    art = _load("REFSCALE_r0[5-9].json")
    sc = art["single_chip"]
    assert sc["graph"]["num_nodes"] >= 10_000_000
    assert sc["graph"]["dim"] == 1024
    assert 0.0 < sc["hit_ratio"] < 1.0
    assert sc["measured_steps"] >= 64
    mesh = art["mesh_8dev"]
    assert mesh["devices"] == 8 and mesh["shard_topology"]


def test_affinity_gain_holds():
    art = _load("AFFINITY_AB_r0[5-9].json")
    for p in ("parts2", "parts4"):
        assert art[p]["hit_ratio_gain"] >= 0.05, p
    scale = _load("AFFINITY_AB_REFSCALE_r0[5-9].json")
    assert scale["hit_ratio_gain"] > 0.0
    assert scale["node_color"]["aggregate"] > scale["baseline"]["aggregate"]


def test_flagship_tune_has_gat_rows():
    art = _load("FLAGSHIP_TUNE_r0[5-9].json")
    gat = {k: v for k, v in art["rows"].items()
           if v["config"].get("model") == "gat"}
    assert len(gat) >= 3
    best_gat = max(v["value"] for v in gat.values())
    assert best_gat >= 7_000_000   # edges/s; r4 level is the floor
    best = max(v["value"] for v in art["rows"].values())
    assert best >= 35_000_000      # r4 flagship 40.7M minus headroom
