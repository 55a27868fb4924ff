"""Pallas TPU kernel: ELL (padded dense-block) gather-SpMM.

out[i, :] = sum_k w[i, k] * x[adj[i, k], :]

This is the framework's aggregation hot op in explicit kernel form, for the
regime where the feature matrix is HBM-resident and too large for XLA to
stage into VMEM. Neighbor rows stream in through a ring of async DMAs while
the VPU accumulates — the Pallas analogue of the reference's
warp-cooperative gather loop (nvshmem_cache.h:37-51 warp_memcpy + get_data
row streaming), rebuilt around the TPU DMA engine.

HBM slices must be sublane-aligned (8 rows for f32), so the feature matrix
is viewed as [S/8, 8, D] row groups; each DMA moves one 8-row group and the
kernel selects the target row in VMEM (8x overfetch — the price of aligned
DMA; fine when fanout rows are scattered anyway).

NOTE (measured on v5e, examples/bench_ops.py): for working sets that fit
VMEM (every per-batch gather in this framework), XLA's native gather runs
from VMEM-staged features at far above HBM bandwidth — the XLA formulation
in ops/aggregate.py is the production path. This kernel is for
HBM-scale operands and as the template for fused variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUF = 8          # in-flight row-group DMAs
TILE_N = 256       # dst rows per grid step
GROUP = 8          # f32 sublane alignment for HBM slices


def _kernel(fanout: int, dim: int, tile_n: int, n_valid: int,
            adj_ref, w_ref, x_hbm, out_ref, rows, sems):
    """One grid step: aggregate `tile_n` destination rows."""
    base = pl.program_id(0) * tile_n
    total = tile_n * fanout

    def start(slot, t):
        i = t // fanout
        k = t % fanout
        g = adj_ref[i, k] // GROUP
        pltpu.make_async_copy(x_hbm.at[g], rows.at[slot],
                              sems.at[slot]).start()

    for s in range(min(N_BUF, total)):
        start(s, s)

    def row_body(i, _):
        def k_body(k, acc):
            t = i * fanout + k
            slot = t % N_BUF
            idx = adj_ref[i, k]
            pltpu.make_async_copy(x_hbm.at[idx // GROUP], rows.at[slot],
                                  sems.at[slot]).wait()
            acc = acc + rows[slot, idx % GROUP][None, :] * w_ref[i, k]

            @pl.when(t + N_BUF < total)
            def _():
                start((t + N_BUF) % N_BUF, t + N_BUF)

            return acc

        acc = jax.lax.fori_loop(0, fanout, k_body,
                                jnp.zeros((1, dim), jnp.float32))

        @pl.when(base + i < n_valid)
        def _():
            out_ref[pl.ds(i, 1), :] = acc

        return 0

    jax.lax.fori_loop(0, tile_n, row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ell_spmm_pallas(x: jax.Array, adj: jax.Array, w: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """x [S, D] f32 (D multiple of 128), adj int32 [N, F], w f32 [N, F]
    -> out [N, D] f32. Weights of 0 make any slot a no-op (mask folded
    into w)."""
    n, fanout = adj.shape
    s, dim = x.shape
    tile_n = min(TILE_N, n)
    n_tiles = pl.cdiv(n, tile_n)
    n_pad = n_tiles * tile_n
    if n_pad != n:
        adj = jnp.pad(adj, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, ((0, n_pad - n), (0, 0)))
    s_pad = ((s + GROUP - 1) // GROUP) * GROUP
    xg = jnp.pad(x.astype(jnp.float32), ((0, s_pad - s), (0, 0)))
    xg = xg.reshape(s_pad // GROUP, GROUP, dim)

    out = pl.pallas_call(
        functools.partial(_kernel, fanout, dim, tile_n, n),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, fanout), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, fanout), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, GROUP, dim), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret,
    )(adj, w, xg)
    return out[:n]
