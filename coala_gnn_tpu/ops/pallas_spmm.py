"""Pallas TPU kernel: ELL (padded dense-block) gather-SpMM.

out[i, :] = sum_k w[i, k] * x[adj[i, k], :]

This is the framework's aggregation hot op in explicit kernel form. The
feature matrix stays in HBM (it never fits VMEM); neighbor rows stream in
through a ring of async DMAs (double/多-buffered) while the VPU accumulates —
the Pallas analogue of the reference's warp-cooperative gather loop
(nvshmem_cache.h:37-51 warp_memcpy + get_data row streaming), rebuilt around
the TPU DMA engine instead of warp loads.

The XLA gather-based formulation (ops/aggregate.py) is the production
default; this kernel exists to (a) own the schedule where XLA's choices are
opaque, (b) serve as the template for fused variants (e.g. gather+ReLU or
quantized lines), and (c) back the op-level roofline bench
(examples/bench_ops.py measures both and prints achieved GB/s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUF = 8          # in-flight row DMAs
TILE_N = 256       # dst rows per grid step


def _kernel(fanout: int, dim: int, tile_n: int, n_valid: int,
            adj_ref, w_ref, x_hbm, out_ref, rows, sems):
    """One grid step: aggregate `tile_n` destination rows."""
    base = pl.program_id(0) * tile_n
    total = tile_n * fanout

    def start(slot, t):
        i = t // fanout
        k = t % fanout
        idx = adj_ref[i, k]
        pltpu.make_async_copy(x_hbm.at[idx], rows.at[slot],
                              sems.at[slot]).start()

    # Warm the DMA ring.
    for s in range(min(N_BUF, total)):
        start(s, s)

    def row_body(i, _):
        def k_body(k, acc):
            t = i * fanout + k
            slot = t % N_BUF
            pltpu.make_async_copy(x_hbm.at[adj_ref[i, k]], rows.at[slot],
                                  sems.at[slot]).wait()
            acc = acc + rows[slot][None, :] * w_ref[i, k]

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
    -> out [N, D] f32. Rows of `adj` beyond N are unused; weights of 0 make
    any slot a no-op (mask folded into w)."""
    n, fanout = adj.shape
    dim = x.shape[1]
    tile_n = min(TILE_N, n)
    n_tiles = pl.cdiv(n, tile_n)
    n_pad = n_tiles * tile_n
    if n_pad != n:
        adj = jnp.pad(adj, ((0, n_pad - n), (0, 0)))
        w = jnp.pad(w, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, fanout, dim, tile_n, n),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, fanout), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, fanout), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, dim), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret,
    )(adj, w, x.astype(jnp.float32))
    return out[:n]
