"""Graph-level pooling / readout modules (reference
``python/dgl/nn/pytorch/glob.py:31-1305``): Sum/Avg/Max/Sort pooling,
GlobalAttentionPooling, Set2Set, SetTransformer(-lite), WeightAndSum.

All reduce per batched-graph component with sorted segment ops.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.segment import segment_reduce, segment_softmax, _ids_from_seglen
from ..readout import softmax_nodes


class SumPooling(nn.Module):
    @nn.compact
    def __call__(self, graph, feat):
        return segment_reduce(graph.batch_num_nodes(), feat, "sum")


class AvgPooling(nn.Module):
    @nn.compact
    def __call__(self, graph, feat):
        return segment_reduce(graph.batch_num_nodes(), feat, "mean")


class MaxPooling(nn.Module):
    @nn.compact
    def __call__(self, graph, feat):
        return segment_reduce(graph.batch_num_nodes(), feat, "max")


class SortPooling(nn.Module):
    """Sort nodes by last feature channel, keep top-k, flatten (reference
    ``glob.py SortPooling``)."""
    k: int

    @nn.compact
    def __call__(self, graph, feat):
        feat = jnp.sort(feat, axis=-1)
        seglen = graph.batch_num_nodes()
        bs = seglen.shape[0]
        n = feat.shape[0]
        ids = _ids_from_seglen(seglen, n)
        key = feat[:, -1]
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(seglen)[:-1]])
        pos = jnp.arange(n, dtype=jnp.int32) - jnp.take(offsets, ids)
        max_n = feat.shape[0]
        dense = jnp.full((bs, max_n), -jnp.inf, key.dtype
                         ).at[ids, pos].set(key)
        _, idx = jax.lax.top_k(dense, self.k)
        flat = jnp.take(offsets, jnp.arange(bs))[:, None] + idx
        flat = jnp.clip(flat, 0, n - 1)
        valid = idx < seglen[:, None]
        vals = jnp.take(feat, flat.reshape(-1), axis=0).reshape(
            bs, self.k, feat.shape[1])
        vals = jnp.where(valid[..., None], vals, 0.0)
        return vals.reshape(bs, self.k * feat.shape[1])


class GlobalAttentionPooling(nn.Module):
    """Gated attention pooling (reference ``glob.py
    GlobalAttentionPooling``)."""
    gate_nn: nn.Module
    feat_nn: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, graph, feat, get_attention=False):
        gate = self.gate_nn(feat)
        assert gate.shape[-1] == 1
        if self.feat_nn is not None:
            feat = self.feat_nn(feat)
        seglen = graph.batch_num_nodes()
        a = segment_softmax(seglen, gate)
        out = segment_reduce(seglen, feat * a, "sum")
        if get_attention:
            return out, a
        return out


class WeightAndSum(nn.Module):
    """Learned per-node weights + sum (reference ``glob.py
    WeightAndSum``)."""
    in_feats: int

    @nn.compact
    def __call__(self, graph, feat):
        w = nn.sigmoid(nn.Dense(1, name="atom_weighting")(feat))
        return segment_reduce(graph.batch_num_nodes(), feat * w, "sum")


class Set2Set(nn.Module):
    """Set2Set pooling (reference ``glob.py Set2Set``): LSTM queries with
    attention readout, n_iters rounds."""
    input_dim: int
    n_iters: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, graph, feat):
        seglen = graph.batch_num_nodes()
        bs = seglen.shape[0]
        n = feat.shape[0]
        ids = _ids_from_seglen(seglen, n)
        cells = [nn.OptimizedLSTMCell(self.input_dim, name=f"lstm{i}")
                 for i in range(self.n_layers)]
        carries = [c.initialize_carry(jax.random.PRNGKey(0),
                                      (bs, self.input_dim * 2))
                   for c in cells]
        q_star = jnp.zeros((bs, self.input_dim * 2), feat.dtype)
        for _ in range(self.n_iters):
            x = q_star
            new_carries = []
            for c, carry in zip(cells, carries):
                carry, x = c(carry, x)
                new_carries.append(carry)
            carries = new_carries
            q = x  # (bs, input_dim)
            e = (feat * jnp.take(q, ids, axis=0)).sum(-1, keepdims=True)
            a = segment_softmax(seglen, e)
            readout = segment_reduce(seglen, feat * a, "sum")
            q_star = jnp.concatenate([q, readout], axis=-1)
        return q_star


class SetAttentionBlock(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model)
        h = attn(x, x, mask=mask)
        h = nn.LayerNorm()(x + h)
        ff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_model * 2)(h)))
        return nn.LayerNorm()(h + ff)


class MultiHeadAttention(nn.Module):
    """Transformer MHA sub-block (reference ``glob.py:660``): attention +
    residual LayerNorm + position-wise FFN + residual LayerNorm, over
    dense-batched (bs, n, d_model) sets."""
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    dropouth: float = 0.0
    dropouta: float = 0.0

    @nn.compact
    def __call__(self, x, mem, mask=None, deterministic=True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.num_heads * self.d_head,
            out_features=self.d_model,
            dropout_rate=self.dropouta, name="attn")
        h = attn(x, mem, mask=mask, deterministic=deterministic)
        if self.dropouth > 0:
            h = nn.Dropout(self.dropouth,
                           deterministic=deterministic)(h)
        h = nn.LayerNorm()(x + h)
        ff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_ff)(h)))
        if self.dropouth > 0:
            ff = nn.Dropout(self.dropouth,
                            deterministic=deterministic)(ff)
        return nn.LayerNorm()(h + ff)


class InducedSetAttentionBlock(nn.Module):
    """ISAB (Set Transformer, arXiv:1810.00825; reference
    ``glob.py:830``): attend m learned induced vectors to the set, then
    the set to the induced summary — O(n·m) instead of O(n²)."""
    m: int
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    dropouth: float = 0.0
    dropouta: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        bs = x.shape[0]
        ind = self.param("inducing_points",
                         nn.initializers.glorot_uniform(),
                         (1, self.m, self.d_model), x.dtype)
        ind = jnp.broadcast_to(ind, (bs, self.m, self.d_model))
        kv_mask = None if mask is None else mask[:, None, None, :]
        h = MultiHeadAttention(self.d_model, self.num_heads, self.d_head,
                               self.d_ff, self.dropouth, self.dropouta,
                               name="mha1")(
            ind, x, mask=kv_mask, deterministic=deterministic)
        return MultiHeadAttention(self.d_model, self.num_heads,
                                  self.d_head, self.d_ff, self.dropouth,
                                  self.dropouta, name="mha2")(
            x, h, deterministic=deterministic)


class PMALayer(nn.Module):
    """Pooling by Multihead Attention (Set Transformer; reference
    ``glob.py:918``): k learned seed vectors attend to rFF(x)."""
    k: int
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    dropouth: float = 0.0
    dropouta: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        bs = x.shape[0]
        seeds = self.param("seed_vectors",
                           nn.initializers.glorot_uniform(),
                           (1, self.k, self.d_model), x.dtype)
        seeds = jnp.broadcast_to(seeds, (bs, self.k, self.d_model))
        rff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_ff)(x)))
        kv_mask = None if mask is None else mask[:, None, None, :]
        return MultiHeadAttention(self.d_model, self.num_heads,
                                  self.d_head, self.d_ff, self.dropouth,
                                  self.dropouta, name="mha")(
            seeds, rff, mask=kv_mask, deterministic=deterministic)


class SetTransformerEncoder(nn.Module):
    """Dense-batched Set Transformer encoder (reference ``glob.py
    SetTransformerEncoder``); operates on (bs, max_n, d) padded sets."""
    d_model: int
    n_heads: int
    d_head: int
    d_ff: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, graph, feat):
        seglen = graph.batch_num_nodes()
        bs = seglen.shape[0]
        n = feat.shape[0]
        ids = _ids_from_seglen(seglen, n)
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(seglen)[:-1]])
        pos = jnp.arange(n, dtype=jnp.int32) - jnp.take(offsets, ids)
        max_n = n
        dense = jnp.zeros((bs, max_n, feat.shape[-1]), feat.dtype
                          ).at[ids, pos].set(feat)
        valid = (jnp.arange(max_n)[None, :] < seglen[:, None])
        mask = valid[:, None, None, :] & valid[:, None, :, None]
        h = dense
        for i in range(self.n_layers):
            h = SetAttentionBlock(self.d_model, self.n_heads,
                                  name=f"sab{i}")(h, mask=mask)
        # scatter back to node-major layout
        return h[ids, pos]


class SetTransformerDecoder(nn.Module):
    """Set Transformer decoder (reference ``glob.py SetTransformerDecoder``):
    PMA — pooling by multihead attention over ``k`` learned seed vectors —
    followed by self-attention blocks; returns (batch, k * d_model)."""
    d_model: int
    num_heads: int
    d_head: int
    d_ff: int
    n_layers: int = 1
    k: int = 1

    @nn.compact
    def __call__(self, graph, feat):
        seglen = graph.batch_num_nodes()
        bs = seglen.shape[0]
        n = feat.shape[0]
        ids = _ids_from_seglen(seglen, n)
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(seglen)[:-1]])
        pos = jnp.arange(n, dtype=jnp.int32) - jnp.take(offsets, ids)
        dense = jnp.zeros((bs, n, feat.shape[-1]), feat.dtype
                          ).at[ids, pos].set(feat)
        valid = jnp.arange(n)[None, :] < seglen[:, None]
        seeds = self.param("seeds", nn.initializers.glorot_uniform(),
                           (1, self.k, self.d_model), feat.dtype)
        q = jnp.broadcast_to(seeds, (bs, self.k, self.d_model))
        kv = nn.Dense(self.d_model, name="proj")(dense)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            name="pma")
        h = attn(q, kv, mask=valid[:, None, None, :])
        h = nn.LayerNorm()(q + h)
        ff = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_ff)(h)))
        h = nn.LayerNorm()(h + ff)
        for i in range(self.n_layers):
            h = SetAttentionBlock(self.d_model, self.num_heads,
                                  name=f"sab{i}")(h)
        return h.reshape(bs, self.k * self.d_model)
