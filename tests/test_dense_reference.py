"""Per-layer activation validation against a dense full-graph reference.

BASELINE.md north star: "Per-layer activations allclose vs reference". The
oracle here is the exact message-passing computed over the full CSC graph
with COO segment-sums (ops/segment.py); sampling with fanout >= max in-degree
takes every edge, so the block path must reproduce the dense math exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from coala_gnn_tpu.graph.datasets import synthetic_graph
from coala_gnn_tpu.models import blocks_to_device, make_model
from coala_gnn_tpu.ops.segment import spmm_coo
from coala_gnn_tpu.sampling.neighbor import NeighborSampler


def _full_graph_edges(graph):
    deg = np.diff(graph.indptr)
    dst = np.repeat(np.arange(graph.num_nodes), deg)
    src = np.asarray(graph.indices)
    return src, dst


def test_sage_layer_matches_dense_reference():
    ds = synthetic_graph(num_nodes=400, avg_degree=6, feature_dim=16,
                         num_classes=4, seed=9)
    g = ds.graph
    max_deg = int(g.in_degrees().max())
    B = 32
    sampler = NeighborSampler(g, [max_deg], B, seed=0, use_native=False)
    seeds = ds.train_idx[:B]
    batch = sampler.sample(seeds)
    dblocks = blocks_to_device(batch.blocks)
    x = jnp.asarray(ds.features[batch.input_ids])

    model = make_model("sage", hidden=8, num_classes=8, num_layers=1)
    params = model.init(jax.random.key(0), dblocks, x)
    out_block = np.asarray(model.apply(params, dblocks, x))[:B]

    # dense reference: mean over ALL in-neighbors on the full graph
    src, dst = _full_graph_edges(g)
    feats = jnp.asarray(ds.features)
    agg = np.asarray(spmm_coo(feats, jnp.asarray(src), jnp.asarray(dst),
                              g.num_nodes))
    deg = np.maximum(g.in_degrees(), 1)[:, None]
    h_neigh = agg / deg
    p = params["params"]["layer_0"]
    W_self = np.asarray(p["fc_self"]["kernel"])
    b = np.asarray(p["fc_self"]["bias"])
    W_neigh = np.asarray(p["fc_neigh"]["kernel"])
    want = ds.features[seeds] @ W_self + b + h_neigh[seeds] @ W_neigh

    np.testing.assert_allclose(out_block, want, rtol=2e-4, atol=2e-4)


def test_gcn_layer_matches_dense_reference():
    ds = synthetic_graph(num_nodes=300, avg_degree=5, feature_dim=12,
                         num_classes=4, seed=4)
    g = ds.graph
    max_deg = int(g.in_degrees().max())
    B = 16
    sampler = NeighborSampler(g, [max_deg], B, seed=1, use_native=False)
    seeds = ds.train_idx[:B]
    batch = sampler.sample(seeds)
    dblocks = blocks_to_device(batch.blocks)
    x = jnp.asarray(ds.features[batch.input_ids])

    model = make_model("gcn", hidden=8, num_classes=8, num_layers=1)
    params = model.init(jax.random.key(0), dblocks, x)
    out_block = np.asarray(model.apply(params, dblocks, x))[:B]

    src, dst = _full_graph_edges(g)
    agg = np.asarray(spmm_coo(jnp.asarray(ds.features), jnp.asarray(src),
                              jnp.asarray(dst), g.num_nodes))
    deg = g.in_degrees().astype(np.float64)
    norm = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)[:, None]
    h = (agg * norm)
    p = params["params"]["layer_0"]["fc"]
    want = h[seeds] @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(out_block, want, rtol=2e-4, atol=2e-4)


def test_two_layer_sage_matches_dense_reference():
    """Full 2-layer model: blocks with full fanout == dense propagation."""
    ds = synthetic_graph(num_nodes=250, avg_degree=4, feature_dim=8,
                         num_classes=4, seed=5)
    g = ds.graph
    max_deg = int(g.in_degrees().max())
    B = 16
    sampler = NeighborSampler(g, [max_deg, max_deg], B, seed=2,
                              use_native=False)
    seeds = ds.train_idx[:B]
    batch = sampler.sample(seeds)
    dblocks = blocks_to_device(batch.blocks)
    x = jnp.asarray(ds.features[batch.input_ids])

    model = make_model("sage", hidden=8, num_classes=4, num_layers=2,
                       dropout=0.0)
    params = model.init(jax.random.key(3), dblocks, x)
    out_block = np.asarray(model.apply(params, dblocks, x))[:B]

    # dense: propagate layer 1 over ALL nodes, then layer 2 on seeds
    src, dst = _full_graph_edges(g)
    feats = jnp.asarray(ds.features)
    deg = np.maximum(g.in_degrees(), 1)[:, None]

    def sage_layer(h, layer, relu):
        p = params["params"][layer]
        agg = np.asarray(spmm_coo(jnp.asarray(h), jnp.asarray(src),
                                  jnp.asarray(dst), g.num_nodes)) / deg
        out = h @ np.asarray(p["fc_self"]["kernel"]) \
            + np.asarray(p["fc_self"]["bias"]) \
            + agg @ np.asarray(p["fc_neigh"]["kernel"])
        return np.maximum(out, 0) if relu else out

    h1 = sage_layer(ds.features.astype(np.float64), "layer_0", relu=True)
    h2 = sage_layer(h1, "layer_1", relu=False)
    np.testing.assert_allclose(out_block, h2[seeds], rtol=5e-3, atol=5e-4)


def test_gat_layer_matches_dense_reference():
    """Exact per-edge attention math: full-fanout block GATConv == numpy
    leaky-relu/softmax attention over ALL in-edges (VERDICT r1 item 7)."""
    from coala_gnn_tpu.models.layers import GATConv

    ds = synthetic_graph(num_nodes=300, avg_degree=5, feature_dim=12,
                         num_classes=4, seed=6)
    g = ds.graph
    max_deg = int(g.in_degrees().max())
    B = 16
    sampler = NeighborSampler(g, [max_deg], B, seed=3, use_native=False)
    seeds = ds.train_idx[:B]
    batch = sampler.sample(seeds)
    dblocks = blocks_to_device(batch.blocks)
    x = jnp.asarray(ds.features[batch.input_ids])

    H, F = 2, 8
    layer = GATConv(features=F, num_heads=H)
    params = layer.init(jax.random.key(2), dblocks[0], x)
    out_block = np.asarray(layer.apply(params, dblocks[0], x))[:B]

    p = params["params"]
    W = np.asarray(p["fc"]["kernel"]).astype(np.float64)   # [dim, H*F]
    attn_l = np.asarray(p["attn_l"]).astype(np.float64)    # [H, F]
    attn_r = np.asarray(p["attn_r"]).astype(np.float64)
    feat = (ds.features.astype(np.float64) @ W).reshape(g.num_nodes, H, F)
    el = np.einsum("nhf,hf->nh", feat, attn_l)
    er = np.einsum("nhf,hf->nh", feat, attn_r)

    def leaky(v):
        return np.where(v >= 0, v, 0.2 * v)

    want = np.zeros((B, H, F))
    for i, v in enumerate(seeds):
        nbrs = g.in_neighbors(int(v))
        if nbrs.size == 0:
            continue
        e = leaky(el[nbrs] + er[v][None, :])               # [deg, H]
        a = np.exp(e - e.max(axis=0, keepdims=True))
        a = a / a.sum(axis=0, keepdims=True)
        want[i] = np.einsum("khf,kh->hf", feat[nbrs], a)

    np.testing.assert_allclose(out_block, want, rtol=2e-4, atol=2e-4)


def test_rgcn_layer_matches_dense_reference():
    """Exact per-edge relational math: full-fanout hetero block
    RelGraphConv == numpy per-relation mean + per-relation dense."""
    from coala_gnn_tpu.models.hetero import (RelGraphConv,
                                             hetero_blocks_to_device)

    ds = synthetic_graph(num_nodes=250, avg_degree=5, feature_dim=10,
                         num_classes=4, seed=8)
    g = ds.graph
    rng = np.random.default_rng(1)
    g.edge_types = rng.integers(0, 3, g.num_edges).astype(np.int32)
    g.num_edge_types = 3
    max_deg = int(g.in_degrees().max())
    B = 16
    sampler = NeighborSampler(g, [max_deg], B, seed=4, use_native=False)
    seeds = ds.train_idx[:B]
    batch = sampler.sample(seeds)
    dblocks = hetero_blocks_to_device(batch.blocks)
    x = jnp.asarray(ds.features[batch.input_ids])

    layer = RelGraphConv(features=8, num_rels=3)
    params = layer.init(jax.random.key(5), dblocks[0], x)
    out_block = np.asarray(layer.apply(params, dblocks[0], x))[:B]

    p = params["params"]
    deg_all = np.diff(g.indptr)
    want = np.zeros((B, 8))
    for i, v in enumerate(seeds):
        lo, hi = g.indptr[int(v)], g.indptr[int(v) + 1]
        nbrs = np.asarray(g.indices[lo:hi])
        types = g.edge_types[lo:hi]
        for r in range(3):
            Wr = np.asarray(p[f"fc_r{r}"]["kernel"]).astype(np.float64)
            br = np.asarray(p[f"fc_r{r}"]["bias"]).astype(np.float64)
            sel = nbrs[types == r]
            agg = (ds.features[sel].astype(np.float64).mean(axis=0)
                   if sel.size else np.zeros(ds.features.shape[1]))
            want[i] += agg @ Wr + br   # Dense bias applies per relation
    np.testing.assert_allclose(out_block, want, rtol=2e-4, atol=2e-4)
