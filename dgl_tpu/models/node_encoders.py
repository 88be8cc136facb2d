"""Node-encoder models (reference ``dglgo/dglgo/model/node_encoder/
{gcn,gat,sage,gin,sgc}.py``): configurable-depth stacks usable for
full-graph or block (minibatch) inputs."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import nn as dglnn


def _layer_input(graphs, i):
    """Support both a single graph (full batch) and a list of blocks."""
    if isinstance(graphs, (list, tuple)):
        return graphs[i]
    return graphs


class GCN(nn.Module):
    in_size: int
    out_size: int
    hidden_size: int = 16
    num_layers: int = 2
    norm: str = "both"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g, x, *, deterministic: bool = True):
        h = x
        for i in range(self.num_layers):
            out = self.out_size if i == self.num_layers - 1 else \
                self.hidden_size
            h = dglnn.GraphConv(h.shape[-1], out, norm=self.norm)(
                _layer_input(g, i), h)
            if i < self.num_layers - 1:
                h = jax.nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(h)
        return h


class GraphSAGE(nn.Module):
    in_size: int
    out_size: int
    hidden_size: int = 64
    num_layers: int = 2
    aggregator: str = "mean"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g, x, *, deterministic: bool = True):
        h = x
        for i in range(self.num_layers):
            out = self.out_size if i == self.num_layers - 1 else \
                self.hidden_size
            h = dglnn.SAGEConv(h.shape[-1], out, self.aggregator)(
                _layer_input(g, i), h)
            if i < self.num_layers - 1:
                h = jax.nn.relu(h)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(h)
        return h


class GAT(nn.Module):
    in_size: int
    out_size: int
    hidden_size: int = 8
    num_layers: int = 2
    heads: Sequence[int] = (8, 1)
    feat_drop: float = 0.6
    attn_drop: float = 0.6

    @nn.compact
    def __call__(self, g, x, *, deterministic: bool = True):
        h = x
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.out_size if last else self.hidden_size
            heads = self.heads[min(i, len(self.heads) - 1)]
            h = dglnn.GATConv(h.shape[-1], out, heads,
                              feat_drop=self.feat_drop,
                              attn_drop=self.attn_drop)(
                _layer_input(g, i), h, deterministic=deterministic)
            h = h.reshape(h.shape[0], -1) if last else \
                jax.nn.elu(h.reshape(h.shape[0], -1))
        return h


class GIN(nn.Module):
    in_size: int
    out_size: int
    hidden_size: int = 64
    num_layers: int = 2

    @nn.compact
    def __call__(self, g, x, *, deterministic: bool = True):
        h = x
        for i in range(self.num_layers):
            out = self.out_size if i == self.num_layers - 1 else \
                self.hidden_size
            h = dglnn.GINConv(nn.Dense(out), "sum")(_layer_input(g, i), h)
            if i < self.num_layers - 1:
                h = jax.nn.relu(h)
        return h


class SGC(nn.Module):
    in_size: int
    out_size: int
    k: int = 2

    @nn.compact
    def __call__(self, g, x, *, deterministic: bool = True):
        return dglnn.SGConv(x.shape[-1], self.out_size, k=self.k)(g, x)
