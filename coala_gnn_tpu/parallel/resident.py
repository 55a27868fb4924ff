"""Device-resident training pipeline (single device).

The endgame TPU formulation of COALA's data path: graph topology lives in
HBM, sampling + frontier dedup + cache probe + label gather run in ONE jit,
and the train step in a second — per step the host uploads only the seed
list (~4 KB) and reads back a 4-byte miss count. Replaces, on-device, the
reference's entire host pipeline: UVA sampling (COALA_GNN_DataLoader.py:162),
request build/send (cache_kernel.cu:4-17) and feature read
(ssd_gnn_cache.cuh:132-174).

Misses still resolve through the host tier (TPUs cannot reach storage), but
at steady state the cache absorbs everything and the miss path never runs.
Multi-device resident mode (shard_map around the same two stages) is the
natural extension; this class is the single-chip engine used by bench.py's
resident mode.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from coala_gnn_tpu.cache import feature_cache as fc
from coala_gnn_tpu.sampling.device_sampler import (
    DeviceGraph,
    sample_blocks_device,
    to_device_graph,
)


@dataclasses.dataclass
class ResidentTrainer:
    graph: object                 # host CSCGraph
    host_fetch: Callable          # host tier fn(ids)->rows
    labels: np.ndarray            # [num_nodes]
    cache_cfg: fc.CacheConfig
    model: object                 # flax module
    tx: optax.GradientTransformation
    fanouts: Sequence[int]
    batch_size: int
    colors: Optional[np.ndarray] = None
    dedup: bool = False   # sort-based frontier dedup costs more than the
                          # gather redundancy it saves (see device_sampler)
    direct: Optional[bool] = None  # None = auto: flat tier iff the cache
                                   # capacity covers every node (see
                                   # feature_cache "flat tier" notes)

    def __post_init__(self):
        self.g = to_device_graph(self.graph)
        self.labels_dev = jnp.asarray(self.labels.astype(np.int32))
        self.colors_dev = (jnp.asarray(self.colors.astype(np.int32))
                           if self.colors is not None else None)
        cfg, B, fanouts = self.cache_cfg, self.batch_size, list(self.fanouts)
        if self.direct is None:
            self.direct = cfg.capacity >= self.graph.num_nodes
        direct = self.direct
        if direct:
            self.cache = fc.flat_init(cfg, self.graph.num_nodes)
        else:
            self.cache = fc.init_colored_state(cfg)
        g, labels_dev, colors_dev = self.g, self.labels_dev, self.colors_dev
        model, tx = self.model, self.tx

        sentinel = self.g.num_nodes

        # engine dispatch: flat (one gather, no eviction) vs associative
        def eng_lookup(cache, ids, valid, count_stats=True, assume_hit=False):
            if direct:
                return fc.flat_lookup(cache, ids, valid,
                                      count_stats=count_stats,
                                      assume_hit=assume_hit)
            base, feats, hit = fc.lookup(cfg, cache.base, ids, valid,
                                         count_stats=count_stats)
            return (fc.ColoredCacheState(base=base,
                                         line_colors=cache.line_colors),
                    feats, hit)

        def eng_probe(cache, ids, valid):
            if direct:
                return fc.flat_probe(cache, ids, valid)
            return fc.probe(cfg, cache.base, ids, valid)

        def eng_insert(cache, ids, rows, valid, colors):
            if direct:
                return fc.flat_insert(cfg, cache, ids, rows, valid, colors)
            return fc.insert_with_colors(cfg, cache, ids, rows, valid, colors)

        self._eng_insert = eng_insert

        @jax.jit
        def stage_a(g, labels_dev, cache, seeds, key):
            blocks, ids, num = sample_blocks_device(g, seeds, fanouts, B, key,
                                                    dedup=self.dedup)
            if self.dedup:
                valid = jnp.arange(ids.shape[0]) < num
            else:
                valid = ids != sentinel
            safe = jnp.where(valid, ids, 0)
            cache, feats, hit = eng_lookup(cache, safe, valid)
            n_miss = (valid & ~hit).sum(dtype=jnp.int32)
            n_edges = sum(b.mask.sum() for b in blocks)
            y = labels_dev[seeds]
            return cache, blocks, ids, valid, feats, hit, n_miss, n_edges, y

        def loss_fn(params, key, blocks, x, y):
            logits = model.apply(params, blocks, x, train=True,
                                 rngs={"dropout": key})[:B]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits

        @jax.jit
        def stage_b(params, opt_state, key, blocks, feats, y):
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, key, blocks, feats, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = (logits.argmax(-1) == y).mean()
            return params, opt_state, loss, acc

        @jax.jit
        def eval_b(params, blocks, feats, y):
            logits = model.apply(params, blocks, feats, train=False)[:B]
            return (logits.argmax(-1) == y).sum()

        def repair(cache, feats, ids, positions, rows, colors_m):
            # merge host-fetched rows + admit them (miss path only)
            pos = jnp.where(positions >= 0, positions, feats.shape[0])
            feats = feats.at[pos].set(rows.astype(feats.dtype), mode="drop")
            miss_ids = jnp.where(positions >= 0, ids[jnp.clip(positions, 0)], 0)
            cache = eng_insert(cache, miss_ids, rows, positions >= 0,
                               colors_m)
            return cache, feats

        # ---- fused multi-step window: K steps per dispatch ---------------
        # Seeds [K, B] upload once; lax.scan runs sample+probe+train K times
        # on device. Misses read zero features inside the window, so the
        # caller must check the returned per-step miss counts and, if any
        # are nonzero, roll back to the pre-window params and replay those
        # steps through the exact begin/resolve path (train_window does
        # this). At steady state (warm cache) the window never replays and
        # per-step dispatch overhead is divided by K.
        # The window never mutates cache contents (lookups don't evict), so
        # the cache stays OUT of the scan carry and the jit outputs: no
        # multi-hundred-MB pass-through copy per window, and rollback
        # snapshots stay trivially valid. Hit/miss stats come back as
        # per-step counts and accumulate host-side (stats()).
        def window(g, labels_dev, cache, params, opt_state, seeds_grid, key):
            def body(carry, inp):
                params, opt_state = carry
                seeds, k = inp
                k1, k2 = jax.random.split(jax.random.wrap_key_data(k))
                blocks, ids, num = sample_blocks_device(g, seeds, fanouts, B,
                                                        k1, dedup=False)
                valid = ids != sentinel
                # direct tier: presample-prefetch + no-eviction make window
                # misses impossible -> skip the residency gather entirely
                _, feats, hit = eng_lookup(cache, jnp.where(valid, ids, 0),
                                           valid, count_stats=False,
                                           assume_hit=direct)
                n_hit = hit.sum(dtype=jnp.int32)
                n_miss = valid.sum(dtype=jnp.int32) - n_hit
                y = labels_dev[seeds]
                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, k2, blocks, feats, y)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                n_edges = sum(b.mask.sum() for b in blocks)
                return (params, opt_state), (loss, n_miss, n_hit, n_edges)

            keys = jax.random.split(key, seeds_grid.shape[0])
            (params, opt_state), (losses, miss, hits, edges) = jax.lax.scan(
                body, (params, opt_state),
                (seeds_grid, jax.random.key_data(keys)))
            return params, opt_state, losses, miss, hits, edges

        self._window = jax.jit(window)

        # Presample-prefetch: seeds and keys are known before the window, so
        # the (cheap) sampling + probe can run first and report exactly which
        # ids the window will miss; one repair insert then GUARANTEES the
        # fused window hits everything (lookups never evict), eliminating
        # the rollback-replay cliff when misses trickle.
        def presample(g, cache, seeds_grid, keys):
            def body(_, inp):
                seeds, k = inp
                k1, _ = jax.random.split(jax.random.wrap_key_data(k))
                _, ids, _ = sample_blocks_device(g, seeds, fanouts, B, k1,
                                                 dedup=False)
                valid = ids != sentinel
                hit = eng_probe(cache, jnp.where(valid, ids, 0), valid)
                miss_ids = jnp.where(valid & ~hit, ids, -1)
                return 0, miss_ids

            _, miss = jax.lax.scan(body, 0, (seeds_grid, keys))
            miss = miss.reshape(-1)          # [K * cap] (-1 = no miss)
            return (miss >= 0).sum(dtype=jnp.int32), miss

        self._presample = jax.jit(presample)

        def insert_rows(cache, ids_d, rows, colors_d):
            return eng_insert(cache, jnp.where(ids_d >= 0, ids_d, 0),
                              rows, ids_d >= 0, colors_d)

        self._insert_rows = {}
        self._insert_rows_fn = insert_rows

        self._stage_a = stage_a
        self._stage_b = stage_b
        self._eval_b = eval_b
        self._repair = {}
        self._repair_fn = repair
        self.hits = self.misses = 0
        self.full_coverage = False

    # ------------------------------------------------------------------
    def begin(self, seeds: np.ndarray, key) -> tuple:
        seeds_dev = jnp.asarray(np.asarray(seeds, np.int32))
        self.cache, blocks, ids, valid, feats, hit, n_miss, n_edges, y = \
            self._stage_a(self.g, self.labels_dev, self.cache, seeds_dev, key)
        try:
            n_miss.copy_to_host_async()
        except Exception:
            pass
        return (blocks, ids, valid, feats, hit, n_miss, n_edges, y)

    def resolve(self, handle) -> tuple:
        """Returns (blocks, feats, labels) with misses repaired."""
        blocks, ids, valid, feats, hit, n_miss, n_edges, y = handle
        m = int(n_miss)
        if m == 0:
            return blocks, feats, y
        # miss path: identify rows, gather on host, merge + insert
        hit_np = np.asarray(hit)
        ids_np = np.asarray(ids)
        need = (~hit_np) & np.asarray(valid)
        pos = np.flatnonzero(need)
        m_cap = 1 << max(int(pos.size) - 1, 0).bit_length()
        positions = np.full(m_cap, -1, np.int32)
        positions[: pos.size] = pos
        rows = np.zeros((m_cap, self.cache_cfg.dim), np.float32)
        rows[: pos.size] = self.host_fetch(ids_np[pos].astype(np.int64))
        colors_m = np.zeros(m_cap, np.int32)
        if self.colors is not None:
            colors_m[: pos.size] = self.colors[ids_np[pos]]
        key = m_cap
        if key not in self._repair:
            self._repair[key] = jax.jit(self._repair_fn)
        self.cache, feats = self._repair[key](
            self.cache, feats, ids, jnp.asarray(positions),
            jnp.asarray(rows), jnp.asarray(colors_m))
        return blocks, feats, y

    def train_step(self, params, opt_state, key, resolved):
        blocks, feats, y = resolved
        return self._stage_b(params, opt_state, key, blocks, feats, y)

    def _probe_window(self, seeds_dev, keys_data):
        """Dispatch the presample residency probe (no host sync). Returns
        the device miss-id array handle."""
        _, miss = self._presample(self.g, self.cache, seeds_dev, keys_data)
        try:
            miss.copy_to_host_async()
        except Exception:
            pass
        return miss

    def _repair_from_probe(self, miss) -> None:
        """Read a probe's miss ids (ONE d2h transfer) and repair them with
        a single batched insert, guaranteeing the fused window hits."""
        miss = np.asarray(miss)
        mids = np.unique(miss[miss >= 0])
        if mids.size == 0:
            return
        m_cap = 1 << max(int(mids.size) - 1, 0).bit_length()
        if m_cap not in self._insert_rows:
            self._insert_rows[m_cap] = jax.jit(self._insert_rows_fn)
        ids_p = np.full(m_cap, -1, np.int32)
        ids_p[: mids.size] = mids
        rows = np.zeros((m_cap, self.cache_cfg.dim), np.float32)
        rows[: mids.size] = self.host_fetch(mids.astype(np.int64))
        colors_d = np.zeros(m_cap, np.int32)
        if self.colors is not None:
            colors_d[: mids.size] = self.colors[mids]
        self.cache = self._insert_rows[m_cap](
            self.cache, jnp.asarray(ids_p), jnp.asarray(rows),
            jnp.asarray(colors_d))

    def _window_keys(self, seeds_grid, key):
        return jax.random.key_data(
            jax.random.split(key, seeds_grid.shape[0]))

    def _dispatch_window(self, params, opt_state, seeds_grid, key,
                         sync_miss: bool = True, prefetch: bool = True):
        """Upload seeds, prefetch misses (unless full coverage or the
        caller already repaired via a pipelined probe) and dispatch one
        fused window. Returns (params', opt', losses, miss, hits, edges).
        sync_miss starts the miss array's d2h transfer early (single-window
        callers); batched callers fold counters and transfer once instead."""
        seeds_dev = jnp.asarray(np.ascontiguousarray(seeds_grid, np.int32))
        if prefetch and not self.full_coverage:
            # full coverage -> every probe hits by construction; skip the
            # presample pass entirely (the replay net still guards).
            self._repair_from_probe(self._probe_window(
                seeds_dev, self._window_keys(seeds_grid, key)))
        out = self._window(self.g, self.labels_dev, self.cache, params,
                           opt_state, seeds_dev, key)
        if sync_miss:
            try:
                out[3].copy_to_host_async()
            except Exception:
                pass
        return out

    def _replay_window(self, params, opt_state, seeds_grid, key):
        """Precise per-step replay with miss repair (the safety net)."""
        out_losses, out_edges = [], []
        for i in range(seeds_grid.shape[0]):
            key, k1, k2 = jax.random.split(key, 3)
            resolved = self.resolve(self.begin(seeds_grid[i], k1))
            params, opt_state, loss, acc = self.train_step(
                params, opt_state, k2, resolved)
            out_losses.append(loss)
            out_edges.append(sum(b.mask.sum() for b in resolved[0]))
        return params, opt_state, jnp.stack(out_losses), jnp.stack(out_edges)

    def _count_window(self, miss, hits) -> int:
        """Fold a window's per-step counters into the stats accumulators;
        returns the window's total miss count."""
        m = int(np.asarray(miss).sum())
        self.hits += int(np.asarray(hits).sum())
        self.misses += m
        return m

    def train_window(self, params, opt_state, seeds_grid: np.ndarray, key):
        """K fused steps in one dispatch. seeds_grid int32 [K, B].

        Returns (params', opt_state', losses [K], edges [K]). The window is
        presampled and its misses prefetched first, so the fused pass is
        guaranteed to hit; the rollback-replay path remains as a safety net
        (it can only trigger if the prefetch insert itself evicted a line
        another step needed — possible only under extreme set pressure)."""
        params0, opt0 = params, opt_state
        params, opt_state, losses, miss, hits, edges = self._dispatch_window(
            params, opt_state, seeds_grid, key)
        if self._count_window(miss, hits) == 0:
            return params, opt_state, losses, edges
        # precise replay: roll back and run each step with miss repair
        return self._replay_window(params0, opt0, seeds_grid, key)

    def train_windows(self, params, opt_state, seeds_grids: np.ndarray, key):
        """M fused windows, fully asynchronous. seeds_grids int32 [M, K, B].

        Every window is dispatched back-to-back with ZERO per-window
        device->host synchronization; the miss counters of all M windows
        are folded into one [M, 2] device array and read back in a SINGLE
        transfer at the end. On a tunneled/remote device a d2h round trip
        costs tens of milliseconds — reading two counters per window made
        the dispatch loop 10x slower than the windows themselves (this is
        the r2 bench-regression root cause). Misses are already guaranteed
        impossible by presample-prefetch (associative) or full coverage
        (flat tier); if one somehow occurs, the first bad window and the
        (tainted) tail are replayed per-step.
        Returns (params', opt_state', losses [M*K], edges [M*K])."""
        M = seeds_grids.shape[0]
        keys = list(jax.random.split(key, M))
        losses_out: list = [None] * M
        edges_out: list = [None] * M
        snaps: list = [None] * M
        counters: list = [None] * M
        # Software-pipelined prefetch: the residency probe for window w+1 is
        # dispatched right after window w's repair-insert (so it sees the
        # post-repair cache) and its d2h readback overlaps window w's
        # compute — the probe round trip leaves the critical path.
        probe = None
        if not self.full_coverage:
            probe = self._probe_window(
                jnp.asarray(np.ascontiguousarray(seeds_grids[0], np.int32)),
                self._window_keys(seeds_grids[0], keys[0]))
        for w in range(M):
            snaps[w] = (params, opt_state)
            if not self.full_coverage:
                self._repair_from_probe(probe)
                if w + 1 < M:
                    probe = self._probe_window(
                        jnp.asarray(np.ascontiguousarray(seeds_grids[w + 1],
                                                         np.int32)),
                        self._window_keys(seeds_grids[w + 1], keys[w + 1]))
            params, opt_state, losses, miss, hits, edges = \
                self._dispatch_window(params, opt_state, seeds_grids[w],
                                      keys[w], sync_miss=False,
                                      prefetch=False)   # repaired above
            losses_out[w], edges_out[w] = losses, edges
            counters[w] = jnp.stack([miss.sum(), hits.sum()])
        folded = np.asarray(jnp.stack(counters))        # ONE d2h transfer
        self.misses += int(folded[:, 0].sum())
        self.hits += int(folded[:, 1].sum())
        bad = np.flatnonzero(folded[:, 0])
        if bad.size:
            # replay the first bad window and everything after it (the tail
            # consumed post-miss state)
            w0 = int(bad[0])
            params, opt_state = snaps[w0]
            for w in range(w0, M):
                params, opt_state, plosses, pedges = self._replay_window(
                    params, opt_state, seeds_grids[w], keys[w])
                losses_out[w], edges_out[w] = plosses, pedges
        return (params, opt_state, jnp.concatenate(losses_out),
                jnp.concatenate(edges_out))

    def eval_step(self, params, resolved) -> int:
        blocks, feats, y = resolved
        return int(self._eval_b(params, blocks, feats, y))

    def prewarm(self, ids: np.ndarray, chunk: int = 65536) -> None:
        cfg = self.cache_cfg
        ids = np.unique(np.asarray(ids, np.int32))
        self.full_coverage = (cfg.capacity >= self.graph.num_nodes
                              and ids.size >= self.graph.num_nodes)

        insert = jax.jit(self._insert_rows_fn)
        for lo in range(0, len(ids), chunk):
            part = ids[lo:lo + chunk]
            grid = np.full(chunk, -1, np.int32)
            grid[: part.size] = part
            rows = np.zeros((chunk, cfg.dim), np.float32)
            rows[: part.size] = self.host_fetch(part.astype(np.int64))
            colors_d = np.zeros(chunk, np.int32)
            if self.colors is not None:
                colors_d[: part.size] = self.colors[part]
            self.cache = insert(self.cache, jnp.asarray(grid),
                                jnp.asarray(rows), jnp.asarray(colors_d))
        # reset stats counters accumulated during prewarm
        self.cache = self._reset_counters(self.cache)
        self.hits = self.misses = 0

    @staticmethod
    def _reset_counters(cache):
        zero = jnp.zeros((), jnp.int32)
        if isinstance(cache, fc.FlatState):
            return cache._replace(hits=zero, misses=zero)
        return fc.ColoredCacheState(
            base=cache.base._replace(hits=zero, misses=zero),
            line_colors=cache.line_colors)

    def stats(self) -> dict:
        """Device counters (per-step path) + host accumulators (fused
        windows), reset on read (reference parity: nvshmem_cache.h:133-142)."""
        if isinstance(self.cache, fc.FlatState):
            h, m = int(self.cache.hits), int(self.cache.misses)
        else:
            h, m = int(self.cache.base.hits), int(self.cache.base.misses)
        self.cache = self._reset_counters(self.cache)
        h += self.hits
        m += self.misses
        self.hits = self.misses = 0
        return {"hits": h, "misses": m,
                "hit_ratio": h / (h + m) if (h + m) else 0.0}
