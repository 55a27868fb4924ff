"""Multi-device device-resident pipeline on the 8-device virtual mesh."""

import numpy as np
import jax
import optax
import pytest

from coala_gnn_tpu.cache import feature_cache as fc
from coala_gnn_tpu.cache.host_tier import HostFeatureStore
from coala_gnn_tpu.graph.datasets import synthetic_graph
from coala_gnn_tpu.models import make_model
from coala_gnn_tpu.parallel.mesh import make_mesh
from coala_gnn_tpu.parallel.sharded_cache import ShardedFeatureCache
from coala_gnn_tpu.parallel.sharded_resident import ShardedResidentTrainer


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_graph(num_nodes=4000, avg_degree=8, feature_dim=32,
                         num_classes=8, seed=31)
    store = HostFeatureStore(ds.features)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    cfg = fc.CacheConfig(num_sets=64, ways=fc.WAYS, dim=32,
                         cache_dim=fc.round_cache_dim(32), num_colors=0,
                         num_shards=n_dev)
    cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode="sharded")
    model = make_model("sage", hidden=24, num_classes=8, num_layers=2,
                       dropout=0.0)
    rt = ShardedResidentTrainer(graph=ds.graph, host_fetch=store.fetch,
                                labels=ds.labels, cache=cache, model=model,
                                tx=optax.adam(1e-2), fanouts=[4, 3],
                                batch_size=16)
    return ds, store, rt, model, mesh


def _seed_grid(ds, rng, n_dev, B):
    return np.stack([rng.choice(ds.train_idx, B, replace=False)
                     for _ in range(n_dev)]).astype(np.int32)


def test_sharded_resident_features_exact(setup):
    ds, store, rt, model, mesh = setup
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    for trial in range(3):
        grid = _seed_grid(ds, rng, n_dev, 16)
        h = rt.begin(grid, jax.random.key(trial))
        blocks, feats, y = rt.resolve(h)
        ids = np.asarray(h[1])
        valid = np.asarray(h[2])
        feats_np = np.asarray(feats)
        for d in range(n_dev):
            np.testing.assert_allclose(
                feats_np[d][valid[d]], ds.features[ids[d][valid[d]]],
                rtol=1e-5, atol=1e-6, err_msg=f"trial {trial} dev {d}")
        np.testing.assert_array_equal(np.asarray(y), ds.labels[grid])


def test_sharded_resident_trains_and_hits(setup):
    ds, store, rt, model, mesh = setup
    n_dev = mesh.devices.size
    rng = np.random.default_rng(1)
    params = opt = None
    key = jax.random.key(5)
    losses = []
    rt.cache.stats()
    for i in range(8):
        grid = _seed_grid(ds, rng, n_dev, 16)
        key, k1, k2 = jax.random.split(key, 3)
        resolved = rt.resolve(rt.begin(grid, k1))
        if params is None:
            import jax.numpy as jnp
            blocks0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                                   resolved[0])
            params = model.init(jax.random.key(0), blocks0,
                                jnp.asarray(np.asarray(resolved[1])[0]))
            opt = rt.tx.init(params)
        params, opt, loss, acc = rt.train_step(params, opt, k2, resolved)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    s = rt.cache.stats()
    assert s["hits"] > 0      # sharded cache serves repeat requests


def test_sharded_window_cold_cache_prefetches():
    """Cold sharded cache: the exchange-probe presample must prefetch all
    misses so the fused multi-device window runs without replay, and be
    deterministic vs a de-novo run."""
    import jax.numpy as jnp
    import optax

    ds = synthetic_graph(num_nodes=3000, avg_degree=8, feature_dim=24,
                         num_classes=4, seed=41)
    store = HostFeatureStore(ds.features)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    model = make_model("sage", hidden=16, num_classes=4, num_layers=2,
                       dropout=0.0)

    def mk():
        cfg = fc.CacheConfig(num_sets=64, ways=fc.WAYS, dim=24,
                             cache_dim=fc.round_cache_dim(24), num_colors=0,
                             num_shards=n_dev)
        cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode="sharded")
        return ShardedResidentTrainer(graph=ds.graph, host_fetch=store.fetch,
                                      labels=ds.labels, cache=cache,
                                      model=model, tx=optax.adam(1e-2),
                                      fanouts=[4, 3], batch_size=16)

    rng = np.random.default_rng(9)
    grid = np.stack([np.stack([rng.choice(ds.train_idx, 16, replace=False)
                               for _ in range(n_dev)])
                     for _ in range(3)], axis=1)      # [n_dev, K, B]

    def run(rt):
        g0 = grid[:, 0]
        resolved = rt.resolve(rt.begin(g0, jax.random.key(0)))
        blocks0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                               resolved[0])
        params = model.init(jax.random.key(0), blocks0,
                            jnp.asarray(np.asarray(resolved[1])[0]))
        opt = rt.tx.init(params)
        rt.stats()   # reset: the cold init batch above legitimately missed
        _, _, losses, edges = rt.train_window(params, opt, grid,
                                              jax.random.key(1))
        return np.asarray(losses)

    rt1, rt2 = mk(), mk()
    l1, l2 = run(rt1), run(rt2)
    assert np.isfinite(l1).all()
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    s = rt1.stats()   # fused-window hits accumulate on the trainer
    assert s["hits"] > 0
    assert s["misses"] == 0   # presample-prefetch guaranteed the window


def test_window_overflow_served_without_replay():
    """Bucket-overflow slots cannot be repaired by owner insertion; the
    presample must return them as host rows merged inside the fused window.
    A trainer with a pathologically small bucket must (a) not replay and
    (b) produce EXACTLY the losses of a trainer with roomy buckets."""
    import jax.numpy as jnp
    import optax

    ds = synthetic_graph(num_nodes=2000, avg_degree=8, feature_dim=16,
                         num_classes=4, seed=51)
    store = HostFeatureStore(ds.features)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    model = make_model("sage", hidden=16, num_classes=4, num_layers=2,
                       dropout=0.0)

    def mk(slack):
        cfg = fc.CacheConfig(num_sets=64, ways=fc.WAYS, dim=16,
                             cache_dim=fc.round_cache_dim(16), num_colors=0,
                             num_shards=n_dev)
        cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode="sharded",
                                    bucket_slack=slack)
        return ShardedResidentTrainer(graph=ds.graph, host_fetch=store.fetch,
                                      labels=ds.labels, cache=cache,
                                      model=model, tx=optax.adam(1e-2),
                                      fanouts=[4, 3], batch_size=16)

    rng = np.random.default_rng(13)
    grid = np.stack([np.stack([rng.choice(ds.train_idx, 16, replace=False)
                               for _ in range(n_dev)])
                     for _ in range(3)], axis=1)      # [n_dev, K, B]

    def run(rt):
        g0 = grid[:, 0]
        resolved = rt.resolve(rt.begin(g0, jax.random.key(0)))
        blocks0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                               resolved[0])
        params = model.init(jax.random.key(0), blocks0,
                            jnp.asarray(np.asarray(resolved[1])[0]))
        opt = rt.tx.init(params)
        rt.stats()
        _, _, losses, _ = rt.train_window(params, opt, grid,
                                          jax.random.key(2))
        return np.asarray(losses), rt.stats()

    rt_small = mk(0.02)          # bucket_cap ~1: heavy overflow
    # confirm overflow actually occurs in this configuration
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from coala_gnn_tpu.parallel.mesh import DATA_AXIS
    seeds_dev = _jax.device_put(
        np.ascontiguousarray(grid, np.int32),
        NamedSharding(mesh, P(DATA_AXIS, None, None)))
    keys = _jax.random.key_data(_jax.random.split(jax.random.key(2), 3))
    _, n_ovf, _, _ = rt_small._presample(rt_small._g, rt_small.cache.state,
                                         seeds_dev, keys)
    assert int(np.asarray(n_ovf)[0]) > 0

    l_small, s_small = run(rt_small)
    l_big, s_big = run(mk(8.0))  # roomy buckets: no overflow
    assert s_small["misses"] == 0      # overflow merged, no rollback-replay
    np.testing.assert_allclose(l_small, l_big, rtol=1e-5, atol=1e-6)


def test_sharded_fused_window(setup):
    ds, store, rt, model, mesh = setup
    n_dev = mesh.devices.size
    rng = np.random.default_rng(7)
    import jax.numpy as jnp

    # init params
    grid0 = _seed_grid(ds, rng, n_dev, 16)
    resolved = rt.resolve(rt.begin(grid0, jax.random.key(0)))
    blocks0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]), resolved[0])
    params = model.init(jax.random.key(0), blocks0,
                        jnp.asarray(np.asarray(resolved[1])[0]))
    opt = rt.tx.init(params)

    K = 3
    losses_all = []
    for w in range(4):
        grid = np.stack([_seed_grid(ds, rng, n_dev, 16) for _ in range(K)],
                        axis=1)             # [n_dev, K, B]
        params, opt, losses, edges = rt.train_window(params, opt, grid,
                                                     jax.random.key(w + 1))
        losses = np.asarray(losses)
        assert losses.shape == (K,)
        assert np.isfinite(losses).all()
        losses_all.extend(losses.tolist())
    assert losses_all[-1] < losses_all[0]


def test_sharded_hetero_resident_trains():
    """rgcn through the multi-device resident pipeline: typed blocks flow
    through shard_map stage_a and the fused window (VERDICT r1 item 8)."""
    from coala_gnn_tpu.models.hetero import make_hetero_model

    ds = synthetic_graph(num_nodes=3000, avg_degree=8, feature_dim=16,
                         num_classes=4, seed=41)
    rng = np.random.default_rng(5)
    ds.graph.edge_types = rng.integers(0, 3,
                                       ds.graph.num_edges).astype(np.int32)
    ds.graph.num_edge_types = 3
    store = HostFeatureStore(ds.features)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    cfg = fc.CacheConfig(num_sets=64, ways=fc.WAYS, dim=16,
                         cache_dim=fc.round_cache_dim(16), num_colors=0,
                         num_shards=n_dev)
    cache = ShardedFeatureCache(cfg=cfg, mesh=mesh, mode="sharded")
    model = make_hetero_model("rgcn", hidden=16, num_classes=4, num_rels=3,
                              num_layers=2, dropout=0.0)
    rt = ShardedResidentTrainer(graph=ds.graph, host_fetch=store.fetch,
                                labels=ds.labels, cache=cache, model=model,
                                tx=optax.adam(1e-2), fanouts=[4, 3],
                                batch_size=16)
    B = 16
    resolved = rt.resolve(rt.begin(_seed_grid(ds, rng, n_dev, B),
                                   jax.random.key(0)))
    assert resolved[0][0].rel is not None
    import jax.numpy as jnp
    single = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                          resolved[0])
    params = model.init(jax.random.key(1), single,
                        jnp.asarray(np.asarray(resolved[1])[0]))
    opt_state = rt.tx.init(params)
    losses = []
    for i in range(3):
        resolved = rt.resolve(rt.begin(_seed_grid(ds, rng, n_dev, B),
                                       jax.random.key(10 + i)))
        params, opt_state, loss, acc = rt.train_step(
            params, opt_state, jax.random.key(20 + i), resolved)
        losses.append(float(np.asarray(loss).reshape(-1)[0]))
    assert np.isfinite(losses).all()

    # fused window with typed blocks
    grid = np.stack([_seed_grid(ds, rng, n_dev, B) for _ in range(2)],
                    axis=1)   # [n_dev, K=2, B]
    params, opt_state, wl, we = rt.train_window(params, opt_state, grid,
                                                jax.random.key(30))
    assert np.isfinite(np.asarray(wl)).all()
