"""Shallow network embeddings: DeepWalk, MetaPath2Vec.

Reference: ``python/dgl/nn/pytorch/network_emb.py`` — skip-gram with
negative sampling over (metapath) random walks; walks come from
``dgl_tpu.sampling.random_walk`` / ``metapath random walk``; the loss is
a single batched einsum over (batch, walk, window) index pairs, which XLA
fuses into MXU matmuls.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _skipgram_pairs(walk_length: int, window_size: int):
    """Static (center, context) index pairs within a walk."""
    centers, contexts = [], []
    for i in range(walk_length):
        for j in range(max(0, i - window_size),
                       min(walk_length, i + window_size + 1)):
            if i != j:
                centers.append(i)
                contexts.append(j)
    return np.array(centers), np.array(contexts)


class DeepWalk(nn.Module):
    """DeepWalk (reference ``network_emb.py DeepWalk``): embedding table
    trained by skip-gram + negative sampling on uniform random walks."""
    num_nodes: int
    emb_dim: int = 128
    walk_length: int = 40
    window_size: int = 5
    negative_size: int = 5
    neg_weight: float = 1.0

    def setup(self):
        self.node_embed = nn.Embed(self.num_nodes, self.emb_dim,
                                   name="node_embed")
        self.context_embed = nn.Embed(self.num_nodes, self.emb_dim,
                                      name="context_embed")
        c, t = _skipgram_pairs(self.walk_length, self.window_size)
        self._centers = jnp.asarray(c)
        self._contexts = jnp.asarray(t)

    def embed(self, ids=None):
        if ids is None:
            ids = jnp.arange(self.num_nodes)
        return self.node_embed(ids)

    def __call__(self, walks, rng_key):
        """Skip-gram NEG loss for a (batch, walk_length) int array of
        walks (pad invalid steps with -1; they are masked)."""
        walks = jnp.asarray(walks, jnp.int32)
        ctr = walks[:, self._centers]                # (B, P)
        ctx = walks[:, self._contexts]               # (B, P)
        mask = (ctr >= 0) & (ctx >= 0)
        ctr = jnp.maximum(ctr, 0)
        ctx = jnp.maximum(ctx, 0)
        h = self.node_embed(ctr)                     # (B, P, D)
        c = self.context_embed(ctx)
        pos = jax.nn.log_sigmoid((h * c).sum(-1))
        neg_ids = jax.random.randint(
            rng_key, ctr.shape + (self.negative_size,), 0, self.num_nodes)
        cn = self.context_embed(neg_ids)             # (B, P, K, D)
        neg = jax.nn.log_sigmoid(-(h[..., None, :] * cn).sum(-1)).sum(-1)
        loss = -(pos + self.neg_weight * neg) * mask
        return loss.sum() / jnp.maximum(mask.sum(), 1)


class MetaPath2Vec(nn.Module):
    """metapath2vec (reference ``network_emb.py MetaPath2Vec``): one
    embedding space over all nodes of all types; walks follow a metapath
    (generate with ``dgl_tpu.sampling.random_walk(metapath=...)``)."""
    num_nodes_total: int
    emb_dim: int = 128
    window_size: int = 5
    negative_size: int = 5

    def setup(self):
        self.node_embed = nn.Embed(self.num_nodes_total, self.emb_dim,
                                   name="node_embed")
        self.context_embed = nn.Embed(self.num_nodes_total, self.emb_dim,
                                      name="context_embed")

    def embed(self, ids):
        return self.node_embed(jnp.asarray(ids))

    def __call__(self, walks, rng_key):
        walks = jnp.asarray(walks, jnp.int32)
        L = walks.shape[1]
        c, t = _skipgram_pairs(L, self.window_size)
        ctr = walks[:, jnp.asarray(c)]
        ctx = walks[:, jnp.asarray(t)]
        mask = (ctr >= 0) & (ctx >= 0)
        ctr = jnp.maximum(ctr, 0)
        ctx = jnp.maximum(ctx, 0)
        h = self.node_embed(ctr)
        cemb = self.context_embed(ctx)
        pos = jax.nn.log_sigmoid((h * cemb).sum(-1))
        neg_ids = jax.random.randint(
            rng_key, ctr.shape + (self.negative_size,), 0,
            self.num_nodes_total)
        cn = self.context_embed(neg_ids)
        neg = jax.nn.log_sigmoid(-(h[..., None, :] * cn).sum(-1)).sum(-1)
        loss = -(pos + neg) * mask
        return loss.sum() / jnp.maximum(mask.sum(), 1)
