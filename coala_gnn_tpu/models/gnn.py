"""Model stacks: GraphSAGE / GCN / GAT over sampled blocks.

Re-implementations of the reference model zoo (reference: examples/models.py —
DistSAGE :8-60, SAGE :62-81, GCN :83-101, GAT :126-178), selected by the same
``model_type`` switch the trainer exposes (sbatch_ssd_gnn_train.py:97-110).
Forward contract matches the reference: per layer
``h_dst = h[:num_dst]; h = conv(block, h)`` with ReLU + dropout between hidden
layers; GAT flattens heads between layers and means heads at the output
(models.py:172-178).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from coala_gnn_tpu.models.layers import DeviceBlock, GATConv, GraphConv, SAGEConv


class SAGE(nn.Module):
    """GraphSAGE (mean) — the reference's flagship DistSAGE/SAGE."""

    hidden: int
    num_classes: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, blocks: Sequence[DeviceBlock], x: jax.Array,
                 train: bool = False) -> jax.Array:
        h = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            feats = self.num_classes if i == self.num_layers - 1 else self.hidden
            h = SAGEConv(feats, dtype=self.dtype, name=f"layer_{i}")(block, h)
            if i != self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h.astype(jnp.float32)


class GCN(nn.Module):
    hidden: int
    num_classes: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, blocks: Sequence[DeviceBlock], x: jax.Array,
                 train: bool = False) -> jax.Array:
        h = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            feats = self.num_classes if i == self.num_layers - 1 else self.hidden
            h = GraphConv(feats, dtype=self.dtype, name=f"layer_{i}")(block, h)
            if i != self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h.astype(jnp.float32)


class GAT(nn.Module):
    """Multi-head GAT; heads flattened between layers, meaned at output
    (reference: examples/models.py:172-178)."""

    hidden: int            # per-head hidden features
    num_classes: int
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, blocks: Sequence[DeviceBlock], x: jax.Array,
                 train: bool = False) -> jax.Array:
        h = x.astype(self.dtype)
        for i, block in enumerate(blocks):
            last = i == self.num_layers - 1
            feats = self.num_classes if last else self.hidden
            h = GATConv(feats, num_heads=self.num_heads, dtype=self.dtype,
                        name=f"layer_{i}")(block, h)     # [n, H, F]
            if last:
                h = h.mean(axis=1)                       # mean over heads
            else:
                h = h.reshape(h.shape[0], -1)            # flatten heads
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h.astype(jnp.float32)


def make_model(model_type: str, hidden: int, num_classes: int,
               num_layers: int, num_heads: int = 4, dropout: float = 0.5,
               dtype: Any = jnp.float32) -> nn.Module:
    """Model switch matching the reference trainer's --model_type
    (sbatch_ssd_gnn_train.py:97-110: sage | gcn | gat)."""
    if model_type in ("sage", "distsage"):
        return SAGE(hidden=hidden, num_classes=num_classes,
                    num_layers=num_layers, dropout=dropout, dtype=dtype)
    if model_type == "gcn":
        return GCN(hidden=hidden, num_classes=num_classes,
                   num_layers=num_layers, dropout=dropout, dtype=dtype)
    if model_type == "gat":
        return GAT(hidden=hidden, num_classes=num_classes,
                   num_layers=num_layers, num_heads=num_heads,
                   dropout=dropout, dtype=dtype)
    raise ValueError(f"unknown model_type {model_type!r}")
