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
