"""Relational (heterogeneous) conv layers and model stacks: RGCN/RSAGE/RGAT.

Re-implementations of the reference's hetero model family
(reference: examples/models.py — RGCN :181-206, RSAGE :208-233, RGAT
:252-280, built on dgl.nn.HeteroGraphConv with one conv per edge type and
'sum' cross-type aggregation; defined in the reference but not wired into
its main trainer).

Dense-block formulation: each block carries a per-slot edge type
``rel int32 [n_dst, fanout]``; a relation-typed layer runs its aggregation
once per relation with the mask restricted to that relation
(mask * (rel == r)) and applies a per-relation weight — R small dense
aggregations instead of ragged per-type subgraphs, which is exactly the
shape TPUs want.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from coala_gnn_tpu.ops.aggregate import agg_sum, neighbor_view


class DeviceHeteroBlock(NamedTuple):
    """``adj is None`` marks the device sampler's contiguous layout (slot-major
    r3: slot (i, k) at input row cap_dst + k*cap_dst + i) — neighbor access
    is a free
    reshape, same fast path as DeviceBlock (ops/aggregate.py)."""

    adj: Any          # int32 [cap_dst, fanout] local indices, or None
    mask: jax.Array   # float32 [cap_dst, fanout]
    rel: jax.Array    # int32 [cap_dst, fanout]

    @property
    def cap_dst(self) -> int:
        return self.mask.shape[0]

    @property
    def fanout(self) -> int:
        return self.mask.shape[1]


def hetero_blocks_to_device(blocks: Sequence[Any]) -> List[DeviceHeteroBlock]:
    out = []
    for b in blocks:
        if b.rel is None:
            raise ValueError("block has no edge types; sample from a hetero "
                             "graph (CSCGraph.edge_types set)")
        out.append(DeviceHeteroBlock(adj=jnp.asarray(b.adj),
                                     mask=jnp.asarray(b.mask),
                                     rel=jnp.asarray(b.rel)))
    return out


class RelSAGEConv(nn.Module):
    """Per-relation mean aggregation + per-relation neighbor weight, summed
    across relations (HeteroGraphConv(SAGEConv, aggregate='sum') parity,
    models.py:208-233)."""

    features: int
    num_rels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, block: DeviceHeteroBlock, x: jax.Array) -> jax.Array:
        out = nn.Dense(self.features, dtype=self.dtype, name="fc_self")(
            x[: block.cap_dst])
        for r in range(self.num_rels):
            m = block.mask * (block.rel == r)
            count = jnp.maximum(m.sum(axis=1), 1.0)
            h = agg_sum(x, block.adj, m) / count[:, None].astype(x.dtype)
            out = out + nn.Dense(self.features, use_bias=False,
                                 dtype=self.dtype, name=f"fc_neigh_r{r}")(h)
        return out


class RelGraphConv(nn.Module):
    """RGCN layer: per-relation degree-normalized sum with per-relation
    weights (models.py:181-206)."""

    features: int
    num_rels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, block: DeviceHeteroBlock, x: jax.Array) -> jax.Array:
        out = jnp.zeros((block.cap_dst, self.features), dtype=self.dtype)
        for r in range(self.num_rels):
            m = block.mask * (block.rel == r)
            deg = m.sum(axis=1)
            norm = jnp.where(deg > 0, 1.0 / deg, 0.0)
            agg = agg_sum(x, block.adj, m * norm[:, None])
            out = out + nn.Dense(self.features, dtype=self.dtype,
                                 name=f"fc_r{r}")(agg)
        return out


class RelGATConv(nn.Module):
    """Per-relation masked attention, summed across relations
    (models.py:252-280). Heads are meaned inside the layer (the reference's
    RGAT flattens; we mean for a fixed output dim across relations)."""

    features: int
    num_rels: int
    num_heads: int = 2
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, block: DeviceHeteroBlock, x: jax.Array) -> jax.Array:
        H, F = self.num_heads, self.features
        out = jnp.zeros((block.cap_dst, F), dtype=self.dtype)
        for r in range(self.num_rels):
            feat = nn.Dense(H * F, use_bias=False, dtype=self.dtype,
                            name=f"fc_r{r}")(x).reshape(x.shape[0], H, F)
            attn_l = self.param(f"attn_l_r{r}", nn.initializers.glorot_uniform(),
                                (H, F), self.dtype)
            attn_r = self.param(f"attn_r_r{r}", nn.initializers.glorot_uniform(),
                                (H, F), self.dtype)
            el = jnp.einsum("nhf,hf->nh", feat, attn_l)
            er = jnp.einsum("nhf,hf->nh", feat[: block.cap_dst], attn_r)
            shape = (block.cap_dst, block.fanout)
            e = neighbor_view(el, block.adj, shape) + er[:, None, :]
            e = nn.leaky_relu(e, negative_slope=self.negative_slope)
            m = (block.mask * (block.rel == r))[:, :, None]
            e = jnp.where(m > 0, e, jnp.asarray(-1e9, e.dtype))
            alpha = jax.nn.softmax(e, axis=1) * m
            if block.adj is None:              # contiguous fast path
                nbr = neighbor_view(feat, None, shape)
                agg = jnp.einsum("nkhf,nkh->nhf", nbr,
                                 alpha.astype(feat.dtype))
            else:
                agg = jnp.zeros((block.cap_dst, H, F), dtype=feat.dtype)
                for k in range(block.fanout):
                    agg = agg + feat[block.adj[:, k]] * alpha[:, k, :, None]
            out = out + agg.mean(axis=1)
        return out


class _RelStack(nn.Module):
    conv_cls: Any
    hidden: int
    num_classes: int
    num_rels: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32
    conv_kwargs: dict = None

    @nn.compact
    def __call__(self, blocks: Sequence[DeviceHeteroBlock], x: jax.Array,
                 train: bool = False) -> jax.Array:
        h = x.astype(self.dtype)
        kw = self.conv_kwargs or {}
        for i, block in enumerate(blocks):
            last = i == self.num_layers - 1
            feats = self.num_classes if last else self.hidden
            h = self.conv_cls(features=feats, num_rels=self.num_rels,
                              dtype=self.dtype, name=f"layer_{i}", **kw)(block, h)
            if not last:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h.astype(jnp.float32)


def make_hetero_model(model_type: str, hidden: int, num_classes: int,
                      num_rels: int, num_layers: int = 2, num_heads: int = 2,
                      dropout: float = 0.5, dtype: Any = jnp.float32):
    """rsage | rgcn | rgat — reference hetero zoo (models.py:181-280)."""
    if model_type == "rsage":
        return _RelStack(conv_cls=RelSAGEConv, hidden=hidden,
                         num_classes=num_classes, num_rels=num_rels,
                         num_layers=num_layers, dropout=dropout, dtype=dtype)
    if model_type == "rgcn":
        return _RelStack(conv_cls=RelGraphConv, hidden=hidden,
                         num_classes=num_classes, num_rels=num_rels,
                         num_layers=num_layers, dropout=dropout, dtype=dtype)
    if model_type == "rgat":
        return _RelStack(conv_cls=RelGATConv, hidden=hidden,
                         num_classes=num_classes, num_rels=num_rels,
                         num_layers=num_layers, dropout=dropout, dtype=dtype,
                         conv_kwargs={"num_heads": num_heads})
    raise ValueError(f"unknown hetero model {model_type!r}")
