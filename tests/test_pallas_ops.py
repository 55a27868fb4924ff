"""Pallas kernel correctness (interpret mode on CPU; compiled path is
exercised by examples/bench_ops.py on real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from coala_gnn_tpu.ops.pallas_spmm import ell_spmm_pallas


@pytest.mark.parametrize("shape", [(100, 40, 5, 128), (64, 300, 3, 256),
                                   (50, 17, 10, 128)])
def test_ell_spmm_matches_reference(rng, shape):
    S, N, F, D = shape
    x = rng.normal(size=(S, D)).astype(np.float32)
    adj = rng.integers(0, S, size=(N, F)).astype(np.int32)
    w = rng.random((N, F)).astype(np.float32)
    out = np.asarray(ell_spmm_pallas(jnp.asarray(x), jnp.asarray(adj),
                                     jnp.asarray(w), interpret=True))
    want = np.einsum("nfd,nf->nd", x[adj], w)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_ell_spmm_zero_weights_mask(rng):
    """Masked slots (w=0) contribute nothing regardless of adj content."""
    S, N, F, D = 30, 10, 4, 128
    x = rng.normal(size=(S, D)).astype(np.float32)
    adj = rng.integers(0, S, size=(N, F)).astype(np.int32)
    w = np.zeros((N, F), np.float32)
    w[:, 0] = 1.0
    out = np.asarray(ell_spmm_pallas(jnp.asarray(x), jnp.asarray(adj),
                                     jnp.asarray(w), interpret=True))
    np.testing.assert_allclose(out, x[adj[:, 0]], rtol=1e-6)


@pytest.mark.parametrize("shape", [(128, 48, 5, 128), (64, 33, 3, 256)])
def test_gather_sum_vmem_matches_reference(rng, shape):
    """Gen-2 VMEM-resident gather-accumulate (ops/pallas_gather.py): the
    fully-static variant — the only one Mosaic compiles (vector fori
    carries and dynamic stores crash the backend; see module docstring)."""
    from coala_gnn_tpu.ops.pallas_gather import gather_sum_vmem
    S, N, F, D = shape
    x = rng.normal(size=(S, D)).astype(np.float32)
    adj = rng.integers(0, S, size=(N, F)).astype(np.int32)
    w = rng.random((N, F)).astype(np.float32)
    out = np.asarray(gather_sum_vmem(jnp.asarray(x), jnp.asarray(adj),
                                     jnp.asarray(w), interpret=True))
    want = np.einsum("nfd,nf->nd", x[adj], w)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
