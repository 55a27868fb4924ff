"""Neighborhood aggregation over padded dense blocks.

The TPU-native replacement for DGL's ragged SpMM message passing
(reference models call SAGEConv/GraphConv/GATConv over DGL blocks,
reference: examples/models.py:71-81). With the dense ``adj [n_dst, fanout]``
block layout (see coala_gnn_tpu/sampling/neighbor.py) aggregation becomes a
small, static number of row gathers + fused multiply-adds — shapes are fully
static, XLA fuses the weighting into the gather consumer, and nothing ragged
ever reaches the device.

Two formulations:
  - ``padded_gather_sum``: unrolled loop of ``fanout`` row-gathers of
    [n_dst, dim] each — avoids materializing the [n_dst, fanout, dim]
    neighbor tensor in HBM; the right default for feature dims >= 128.
  - ``padded_gather_sum_dense``: one gather producing [n_dst, fanout, dim]
    then a weighted reduce — better for small dims / when the 3-D tensor is
    needed anyway (GAT attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def padded_gather_sum(x_src: jax.Array, adj: jax.Array,
                      weights: jax.Array) -> jax.Array:
    """out[i] = sum_k weights[i, k] * x_src[adj[i, k]].

    x_src   : [n_src, dim]
    adj     : int32 [n_dst, fanout] indices into x_src
    weights : [n_dst, fanout] (mask, normalized coefficients, or attention)
    returns : [n_dst, dim]
    """
    fanout = adj.shape[1]
    acc = jnp.zeros((adj.shape[0], x_src.shape[1]), dtype=x_src.dtype)
    for k in range(fanout):  # static unroll: fanout is small (<= ~15)
        acc = acc + x_src[adj[:, k]] * weights[:, k][:, None].astype(x_src.dtype)
    return acc


def padded_gather_sum_dense(x_src: jax.Array, adj: jax.Array,
                            weights: jax.Array) -> jax.Array:
    """Same contract as padded_gather_sum via one 3-D gather + reduce."""
    nbr = x_src[adj]                                   # [n_dst, fanout, dim]
    return jnp.einsum("nfd,nf->nd", nbr, weights.astype(x_src.dtype))


def padded_mean(x_src: jax.Array, adj: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked neighborhood mean (the SAGE 'mean' aggregator; zero for
    isolated nodes — matching DGL SAGEConv behavior on zero-degree dst)."""
    count = jnp.maximum(mask.sum(axis=1), 1.0)
    s = padded_gather_sum(x_src, adj, mask)
    return s / count[:, None].astype(s.dtype)
