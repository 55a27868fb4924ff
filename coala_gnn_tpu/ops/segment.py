"""COO/segment-sum sparse ops — the reference formulation for validation and
full-graph inference.

These mirror what DGL's generic SpMM does under the reference's conv layers
(reference: examples/models.py SAGEConv/GraphConv/GATConv) and serve as the
ground-truth oracle for the padded-block fast paths (SURVEY.md §4: per-layer
activation allclose is part of the north-star validation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spmm_coo(x_src: jax.Array, edge_src: jax.Array, edge_dst: jax.Array,
             num_dst: int, edge_weight: Optional[jax.Array] = None) -> jax.Array:
    """out[v] = sum_{(u,v) in E} w_uv * x_src[u]   (COO segment-sum SpMM)."""
    msg = x_src[edge_src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None].astype(msg.dtype)
    return jax.ops.segment_sum(msg, edge_dst, num_segments=num_dst)


def segment_softmax(scores: jax.Array, segment_ids: jax.Array,
                    num_segments: int) -> jax.Array:
    """Numerically-stable softmax of per-edge scores within each destination
    segment (the GAT attention normalization over in-edges)."""
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    e = jnp.exp(scores - seg_max[segment_ids])
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(denom[segment_ids], 1e-16)
