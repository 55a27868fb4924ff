#!/usr/bin/env python
"""Op-level microbenchmarks: neighborhood aggregation bandwidth vs roofline.

The GNN aggregation hot op (padded gather-sum over dense blocks) is
HBM-bandwidth-bound: traffic ~= n_dst * fanout * dim * bytes (gathered rows)
+ n_dst * dim * bytes (output). This tool measures achieved GB/s on the
current backend so kernel work targets reality (SURVEY.md §7: "speed-of-light
lives here").

  python examples/bench_ops.py            # on TPU
  python examples/bench_ops.py --platform cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, warmup=1, iters=20):
    """Device-throughput timing: run `iters` executions inside ONE jit via
    fori_loop (single dispatch; per-call host RTT excluded), with the first
    operand perturbed per iteration so XLA cannot hoist the body, and a real
    host readback at the end. block_until_ready alone under-reports on
    remote/experimental backends and per-dispatch RTT would otherwise
    dominate (~6 ms on this tunnel)."""
    import jax
    import jax.numpy as jnp

    x0, rest = args[0], args[1:]

    @jax.jit
    def many(x0, *rest):
        def body(i, acc):
            xi = x0 + (i.astype(x0.dtype) * jnp.asarray(1e-30, x0.dtype)
                       if jnp.issubdtype(x0.dtype, jnp.floating) else 0)
            out = fn(xi, *rest)
            return acc + out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    for _ in range(warmup):
        float(many(x0, *rest))
    t0 = time.perf_counter()
    float(many(x0, *rest))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--n_src", type=int, default=65536)
    p.add_argument("--n_dst", type=int, default=32768)
    p.add_argument("--fanout", type=int, default=10)
    p.add_argument("--dim", type=int, default=256)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from coala_gnn_tpu.ops.aggregate import padded_gather_sum, padded_gather_sum_dense

    S, N, F, D = args.n_src, args.n_dst, args.fanout, args.dim
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    adj = jnp.asarray(rng.integers(0, S, size=(N, F)).astype(np.int32))
    w = jnp.asarray(rng.random((N, F)).astype(np.float32))

    print(f"backend={jax.default_backend()} S={S} N={N} F={F} D={D}")

    for name, fn, x, bytes_per in [
        ("gather_sum_loop f32", jax.jit(padded_gather_sum), x32, 4),
        ("gather_sum_dense f32", jax.jit(padded_gather_sum_dense), x32, 4),
        ("gather_sum_loop bf16", jax.jit(padded_gather_sum), x16, 2),
        ("gather_sum_dense bf16", jax.jit(padded_gather_sum_dense), x16, 2),
    ]:
        dt = timeit(fn, x, adj, w)
        traffic = (N * F * D + N * D) * bytes_per
        print(f"{name:24s} {dt * 1e3:8.3f} ms   {traffic / dt / 1e9:8.1f} GB/s")

    # Contiguous-block fast path (the resident pipeline's production
    # layout, ops/aggregate.py: neighbor rows at [N, N + N*F) of the layer
    # input — the weighted sum is a streaming multiply-reduce, NO gather).
    from coala_gnn_tpu.ops.aggregate import agg_sum
    xc32 = jnp.asarray(rng.normal(size=(N * (1 + F), D)).astype(np.float32))
    xc16 = xc32.astype(jnp.bfloat16)
    contig = jax.jit(lambda x, w: agg_sum(x, None, w))
    for name, x, bytes_per in [("contig agg_sum f32", xc32, 4),
                               ("contig agg_sum bf16", xc16, 2)]:
        dt = timeit(contig, x, w)
        traffic = (N * F * D + N * D) * bytes_per
        print(f"{name:24s} {dt * 1e3:8.3f} ms   {traffic / dt / 1e9:8.1f} GB/s")

    # Pallas ELL-SpMM kernel (explicit DMA schedule)
    if jax.default_backend() == "tpu":
        from coala_gnn_tpu.ops.pallas_spmm import ell_spmm_pallas
        try:
            dt = timeit(ell_spmm_pallas, x32, adj, w)
            traffic = (N * F * D + N * D) * 4
            print(f"{'pallas ell_spmm f32':24s} {dt * 1e3:8.3f} ms   "
                  f"{traffic / dt / 1e9:8.1f} GB/s")
        except Exception as e:
            print(f"pallas ell_spmm: FAILED ({type(e).__name__}: {e})")

    # plain gather (roofline probe: what the backend's gather achieves)
    flat = adj.reshape(-1)
    g = jax.jit(lambda x, i: x[i])
    for name, x, bpp in [("plain row gather f32", x32, 4),
                         ("plain row gather bf16", x16, 2)]:
        dt = timeit(g, x, flat)
        traffic = flat.shape[0] * D * bpp * 2  # read + write
        print(f"{name:24s} {dt * 1e3:8.3f} ms   {traffic / dt / 1e9:8.1f} GB/s")

    # MXU probe for context
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32)).astype(jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    dt = timeit(mm, a)
    print(f"{'bf16 4096^3 matmul':24s} {dt * 1e3:8.3f} ms   "
          f"{2 * 4096**3 / dt / 1e12:8.1f} TFLOP/s")


if __name__ == "__main__":
    main()
