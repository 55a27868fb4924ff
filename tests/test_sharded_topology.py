"""Mesh-sharded topology: shard build, frontier-routed sampling parity
with the replicated device sampler, and end-to-end resident training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from coala_gnn_tpu.graph.datasets import synthetic_graph
from coala_gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from coala_gnn_tpu.sampling import sharded_topology as st
from coala_gnn_tpu.sampling.device_sampler import to_device_graph


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _csc_neighbors(graph, v):
    s, e = int(graph.indptr[v]), int(graph.indptr[v + 1])
    return set(np.asarray(graph.indices[s:e]).tolist())


def test_shard_build_partitions_edges():
    ds = synthetic_graph(num_nodes=501, avg_degree=7, feature_dim=4,
                         num_classes=3, seed=0)
    n_dev = 8
    ptrs, idx, et = st.shard_topology_arrays(ds.graph, n_dev)
    rows = -(-501 // n_dev)
    assert ptrs.shape == (n_dev, rows + 1)
    assert et is None
    total = 0
    for d in range(n_dev):
        own = np.arange(d, 501, n_dev)
        deg = np.asarray(ds.graph.indptr)[own + 1] - \
            np.asarray(ds.graph.indptr)[own]
        # local offsets reproduce each owned node's degree
        ldeg = ptrs[d, 1:own.size + 1] - ptrs[d, :own.size]
        np.testing.assert_array_equal(ldeg, deg)
        total += int(deg.sum())
        # local adjacency content matches the global CSC slice per node
        for v in own[:5]:
            li = v // n_dev
            got = set(idx[d, ptrs[d, li]:ptrs[d, li + 1]].tolist())
            assert got == _csc_neighbors(ds.graph, int(v))
    assert total == ds.graph.num_edges
    # sharded, not replicated: every shard holds ~E/n_dev edges
    assert idx.shape[1] < ds.graph.num_edges


def _run_sharded_layer(mesh, graph, dst_grid, fanout, key):
    """shard_map one _sample_layer_sharded call; returns global [n_dev, n, f]
    neighbor/mask grids."""
    n_dev = mesh.devices.size
    topo = st.put_sharded_topology(graph, mesh)
    specs = jax.tree.map(lambda _: P(DATA_AXIS, None), topo)
    N = graph.num_nodes

    def body(topo, dst):
        nbr, mask, _ = st._sample_layer_sharded(
            topo.indptr[0], topo.indices[0], None, dst[0], fanout,
            jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS)),
            n_dev, N)
        return nbr[None], mask[None]

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(specs, P(DATA_AXIS)),
                           out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                           check_vma=False))
    dst_dev = jax.device_put(dst_grid,
                             NamedSharding(mesh, P(DATA_AXIS, None)))
    nbr, mask = fn(topo, dst_dev)
    return np.asarray(nbr), np.asarray(mask)


def test_sharded_layer_full_fanout_exact(mesh):
    """fanout >= max degree: slots are deterministic (sequential take-all),
    so the sharded route must reproduce each node's exact adjacency list."""
    ds = synthetic_graph(num_nodes=300, avg_degree=5, feature_dim=4,
                         num_classes=3, seed=1)
    g = ds.graph
    deg = np.asarray(g.indptr[1:]) - np.asarray(g.indptr[:-1])
    fanout = int(deg.max())
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    dst = rng.integers(0, 300, size=(n_dev, 16)).astype(np.int32)
    # include sentinel padding rows
    dst[:, -2:] = 300
    nbr, mask = _run_sharded_layer(mesh, g, dst, fanout, jax.random.key(7))
    for d in range(n_dev):
        for i, v in enumerate(dst[d]):
            m = mask[d, i].astype(bool)
            if v == 300:                       # sentinel: degree 0
                assert not m.any()
                continue
            got = set(nbr[d, i][m].tolist())
            assert got == _csc_neighbors(g, int(v))
            assert int(m.sum()) == deg[v]
            # masked slots point at dst (self), matching _sample_layer
            assert (nbr[d, i][~m] == v).all()


def test_sharded_layer_sampled_slots_are_neighbors(mesh):
    """fanout < degree: every unmasked slot must hold a true neighbor of
    its dst node (uniform-with-replacement draws at the owner)."""
    ds = synthetic_graph(num_nodes=400, avg_degree=12, feature_dim=4,
                         num_classes=3, seed=2)
    n_dev = mesh.devices.size
    rng = np.random.default_rng(1)
    dst = rng.integers(0, 400, size=(n_dev, 8)).astype(np.int32)
    nbr, mask = _run_sharded_layer(mesh, ds.graph, dst, 3, jax.random.key(3))
    deg = np.asarray(ds.graph.indptr[1:]) - np.asarray(ds.graph.indptr[:-1])
    for d in range(n_dev):
        for i, v in enumerate(dst[d]):
            m = mask[d, i].astype(bool)
            assert int(m.sum()) == min(int(deg[v]), 3)
            allowed = _csc_neighbors(ds.graph, int(v))
            assert set(nbr[d, i][m].tolist()) <= allowed


def test_resident_trainer_shard_topology_trains(mesh):
    """End-to-end: ShardedResidentTrainer(shard_topology=True) learns on
    the 8-device mesh and the fused-window path runs."""
    import coala_gnn_tpu.cache.feature_cache as fc
    from coala_gnn_tpu.cache.host_tier import HostFeatureStore
    from coala_gnn_tpu.models import make_model
    from coala_gnn_tpu.parallel.sharded_cache import ShardedFeatureCache
    from coala_gnn_tpu.parallel.sharded_resident import (
        ShardedResidentTrainer)

    n_dev = mesh.devices.size
    ds = synthetic_graph(num_nodes=4000, avg_degree=8, feature_dim=16,
                         num_classes=4, seed=5)
    store = HostFeatureStore(ds.features)
    cfg = fc.make_config(cache_mb=4, dim=16, num_shards=n_dev)
    cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode="sharded")
    model = make_model("sage", hidden=16, num_classes=4, num_layers=2,
                       dropout=0.0)
    B = 16
    rt = ShardedResidentTrainer(
        graph=ds.graph, host_fetch=store.fetch, labels=ds.labels,
        cache=cache, model=model, tx=optax.adam(1e-2), fanouts=[4, 3],
        batch_size=B, shard_topology=True)
    assert rt.shard_topology
    # per-device topology shard is ~E/n_dev, not E
    assert rt._g.indices.shape[1] < ds.graph.num_edges

    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    grid = rng.permutation(4000)[:n_dev * B].reshape(n_dev, B) \
        .astype(np.int32)
    handle = rt.begin(grid, key)
    resolved = rt.resolve(handle)
    params = model.init(jax.random.key(1),
                        jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                                     resolved[0]),
                        jnp.asarray(np.asarray(resolved[1])[0]), train=False)
    opt_state = optax.adam(1e-2).init(params)

    losses = []
    for i in range(12):
        key, k1, k2 = jax.random.split(key, 3)
        grid = rng.permutation(4000)[:n_dev * B].reshape(n_dev, B) \
            .astype(np.int32)
        handle = rt.begin(grid, k1)
        resolved = rt.resolve(handle)
        params, opt_state, loss, acc = rt.train_step(params, opt_state, k2,
                                                     resolved)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # fused window path on the sharded topology
    K = 3
    grids = np.stack([rng.permutation(4000)[:n_dev * B].reshape(n_dev, B)
                      for _ in range(K)], axis=1).astype(np.int32)
    key, kw = jax.random.split(key)
    params, opt_state, wlosses, _ = rt.train_window(params, opt_state,
                                                    grids, kw)
    assert np.isfinite(np.asarray(wlosses)).all()


def test_sharded_layer_hetero_edge_types(mesh):
    """Edge-typed graphs: the rel grid rides the same reduce-scatter and
    each unmasked slot's type matches the (dst, nbr) edge's type."""
    ds = synthetic_graph(num_nodes=200, avg_degree=5, feature_dim=4,
                         num_classes=3, seed=4)
    g = ds.graph
    rng = np.random.default_rng(2)
    g.edge_types = rng.integers(0, 3, g.num_edges).astype(np.int32)
    g.num_edge_types = 3
    deg = np.asarray(g.indptr[1:]) - np.asarray(g.indptr[:-1])
    fanout = int(deg.max())          # deterministic take-all slots
    n_dev = mesh.devices.size

    topo = st.put_sharded_topology(g, mesh)
    assert topo.edge_types is not None
    specs = jax.tree.map(lambda _: P(DATA_AXIS, None), topo)
    dst = rng.integers(0, 200, size=(n_dev, 8)).astype(np.int32)
    key = jax.random.key(11)

    def body(topo, dst):
        nbr, mask, rel = st._sample_layer_sharded(
            topo.indptr[0], topo.indices[0], topo.edge_types[0], dst[0],
            fanout, jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS)),
            n_dev, 200)
        return nbr[None], mask[None], rel[None]

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(specs, P(DATA_AXIS)),
                           out_specs=(P(DATA_AXIS),) * 3, check_vma=False))
    dst_dev = jax.device_put(dst, NamedSharding(mesh, P(DATA_AXIS, None)))
    nbr, mask, rel = (np.asarray(a) for a in fn(topo, dst_dev))

    indptr = np.asarray(g.indptr)
    for d in range(n_dev):
        for i, v in enumerate(dst[d]):
            m = mask[d, i].astype(bool)
            s, e = indptr[v], indptr[v + 1]
            # take-all order: slot k holds edge s+k, so types align exactly
            np.testing.assert_array_equal(rel[d, i][m],
                                          g.edge_types[s:e])
            assert (rel[d, i][~m] == 0).all()
