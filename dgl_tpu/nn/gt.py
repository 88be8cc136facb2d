"""Graph-transformer components (reference ``python/dgl/nn/pytorch/gt/``:
DegreeEncoder, LapPosEncoder, PathEncoder, SpatialEncoder, BiasedMHA,
GraphormerLayer, EGTLayer).

These operate on dense-batched graphs: (B, N_max, d) node features +
(B, N_max, N_max) attention biases — the natural TPU layout (everything is
a matmul)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DegreeEncoder(nn.Module):
    """Learnable embeddings of (in, out) degree (reference
    ``gt/degree_encoder.py``)."""
    max_degree: int
    embedding_dim: int
    direction: str = "both"

    @nn.compact
    def __call__(self, g):
        in_deg = jnp.minimum(jnp.asarray(g.in_degrees()), self.max_degree)
        out_deg = jnp.minimum(jnp.asarray(g.out_degrees()), self.max_degree)
        table_in = nn.Embed(self.max_degree + 1, self.embedding_dim,
                            name="in_emb")
        table_out = nn.Embed(self.max_degree + 1, self.embedding_dim,
                             name="out_emb")
        if self.direction == "in":
            return table_in(in_deg)
        if self.direction == "out":
            return table_out(out_deg)
        return table_in(in_deg) + table_out(out_deg)


class LapPosEncoder(nn.Module):
    """Transformer/DeepSet encoder of Laplacian eigenvectors (reference
    ``gt/lap_pos_encoder.py``)."""
    model_type: str = "Transformer"
    num_layer: int = 1
    k: int = 8
    dim: int = 16
    n_head: int = 1

    @nn.compact
    def __call__(self, lap_pos_enc, eigval=None):
        # lap_pos_enc: (N, k)
        h = lap_pos_enc[..., None]          # (N, k, 1)
        if eigval is not None:
            h = jnp.concatenate(
                [h, jnp.broadcast_to(eigval[..., None], h.shape)], -1)
        h = nn.Dense(self.dim, name="linear_in")(h)   # (N, k, dim)
        if self.model_type == "Transformer":
            for i in range(self.num_layer):
                attn = nn.MultiHeadDotProductAttention(
                    num_heads=self.n_head, qkv_features=self.dim,
                    name=f"attn{i}")
                h = h + attn(h, h)
                h = nn.LayerNorm(name=f"ln{i}")(h)
        else:  # DeepSet
            for i in range(self.num_layer):
                h = jax.nn.relu(nn.Dense(self.dim, name=f"fc{i}")(h))
        return h.sum(axis=-2)               # (N, dim)


class SpatialEncoder(nn.Module):
    """Shortest-distance attention bias (reference
    ``gt/spatial_encoder.py``): embeds clipped SPD into per-head biases.

    TPU formulation: for the usual small tables (max_dist+2 <= 64
    buckets) the lookup runs as ``one_hot(dist) @ table`` — both passes
    are MXU GEMMs. The embed formulation's backward is a scatter-add
    over B*N*N positions into a tiny table, which serializes on TPU and
    measured as 73% of a full Graphormer train step (25 of 34 ms at
    B=128 x N=128; one-hot costs 3.6 ms — 2.65x on the full step,
    tools/perf_spatial_probe.py). Param tree is identical either way.

    ``layout="hnn"`` emits the bias pre-transposed as (B, H, N, N) for
    :class:`BiasedMHA`'s ``bias_layout="hnn"``.  Measured NEUTRAL for
    speed up to N=512 (XLA hoists the relayout out of the layer loop,
    perf_graphormer_n512); the option exists for callers whose
    pipelines already hold head-major biases."""
    max_dist: int
    num_heads: int = 1
    layout: str = "nnh"

    @nn.compact
    def __call__(self, dist):
        # dist: (B, N, N) int; -1 = unreachable
        buckets = self.max_dist + 2
        emb = nn.Embed(buckets, self.num_heads, name="emb")
        clipped = jnp.clip(dist, -1, self.max_dist) + 1
        if buckets <= 64:
            table = emb(jnp.arange(buckets))        # full-table gather
            oh = jax.nn.one_hot(clipped, buckets, dtype=table.dtype)
            if self.layout == "hnn":
                return jnp.einsum("bnmk,kh->bhnm", oh, table)
            return oh @ table
        out = emb(clipped)                  # (B, N, N, H)
        if self.layout == "hnn":
            return out.transpose(0, 3, 1, 2)
        return out


class PathEncoder(nn.Module):
    """Edge-feature path bias (reference ``gt/path_encoder.py``): mean of
    edge features along shortest paths, dotted with learnable weights."""
    max_len: int
    feat_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, dist, path_data):
        # path_data: (B, N, N, max_len, feat_dim); dist: (B, N, N)
        w = self.param("edge_emb", nn.initializers.normal(0.02),
                       (self.max_len, self.feat_dim, self.num_heads),
                       path_data.dtype)
        scores = jnp.einsum("bxylf,lfh->bxyh", path_data, w)
        lens = jnp.clip(dist, 1, self.max_len)[..., None]
        return scores / lens


class BiasedMHA(nn.Module):
    """Dense multi-head attention with additive bias (reference
    ``gt/biased_mha.py``) — the Graphormer attention.

    ``dtype``: compute dtype for the GEMMs and the (B, H, N, N) score
    tensors; params, softmax, and the returned array stay f32.  bf16
    measured 1.41x on the full train step at B=32 x N=512 (the score
    tensors dominate HBM there) and NEUTRAL at N=128
    (tools/perf_graphormer_n512.py, PERF_NOTES round 5)."""
    feat_size: int
    num_heads: int
    bias: bool = True
    attn_bias_type: str = "add"
    attn_drop: float = 0.1
    dtype: Optional[object] = None
    bias_layout: str = "nnh"    # "nnh": attn_bias is (B,N,N,H) [ref];
    #                             "hnn": already (B,H,N,N), no relayout

    @nn.compact
    def __call__(self, ndata, attn_bias=None, attn_mask=None, *,
                 deterministic=True):
        B, N, D = ndata.shape
        H = self.num_heads
        dh = D // H
        dt = self.dtype or ndata.dtype
        x = ndata.astype(dt)
        q = nn.Dense(D, use_bias=self.bias, dtype=dt, name="q_proj")(x)
        k = nn.Dense(D, use_bias=self.bias, dtype=dt, name="k_proj")(x)
        v = nn.Dense(D, use_bias=self.bias, dtype=dt, name="v_proj")(x)
        q = q.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, dt))
        if attn_bias is not None:
            b = (attn_bias if self.bias_layout == "hnn"
                 else attn_bias.transpose(0, 3, 1, 2)).astype(dt)
            scores = scores + b if self.attn_bias_type == "add" else \
                scores * b
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, :, :], scores,
                               jnp.asarray(-1e9, dt))
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop,
                              deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(dt), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, use_bias=self.bias, dtype=dt,
                        name="out_proj")(out).astype(ndata.dtype)


class GraphormerLayer(nn.Module):
    """Pre-LN transformer block with biased attention (reference
    ``gt/graphormer.py``).  ``dtype``: compute dtype for attention +
    FFN GEMMs (see :class:`BiasedMHA`); layernorms, residuals, and
    params stay f32."""
    feat_size: int
    hidden_size: int
    num_heads: int
    attn_bias_type: str = "add"
    norm_first: bool = False
    dropout: float = 0.1
    attn_dropout: float = 0.1
    dtype: Optional[object] = None
    bias_layout: str = "nnh"

    @nn.compact
    def __call__(self, nfeat, attn_bias=None, attn_mask=None, *,
                 deterministic=True):
        mha = BiasedMHA(self.feat_size, self.num_heads,
                        attn_bias_type=self.attn_bias_type,
                        attn_drop=self.attn_dropout, dtype=self.dtype,
                        bias_layout=self.bias_layout, name="attn")
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        dt = self.dtype or nfeat.dtype

        def ffn(x):
            h = nn.Dense(self.hidden_size, dtype=dt,
                         name="ffn1")(x.astype(dt))
            h = jax.nn.gelu(h)
            h = drop(nn.Dense(self.feat_size, dtype=dt,
                              name="ffn2")(h).astype(x.dtype))
            return h

        if self.norm_first:
            h = nfeat + drop(mha(nn.LayerNorm(name="ln1")(nfeat),
                                 attn_bias, attn_mask,
                                 deterministic=deterministic))
            return h + ffn(nn.LayerNorm(name="ln2")(h))
        h = nn.LayerNorm(name="ln1")(
            nfeat + drop(mha(nfeat, attn_bias, attn_mask,
                             deterministic=deterministic)))
        return nn.LayerNorm(name="ln2")(h + ffn(h))


class EGTLayer(nn.Module):
    """Edge-augmented graph transformer layer (reference ``gt/egt.py``):
    maintains both node and pairwise-edge channels.

    ``dtype``: compute dtype for the GEMMs and (B, N, N, ·) channel
    tensors (params, softmax, layernorms, residuals, and returns stay
    f32) — same N-gated guidance as :class:`BiasedMHA`."""
    feat_size: int
    edge_feat_size: int
    num_heads: int
    num_virtual_nodes: int = 0
    dropout: float = 0.0
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, nfeat, efeat, *, deterministic=True):
        B, N, D = nfeat.shape
        H = self.num_heads
        dh = D // H
        dt = self.dtype or nfeat.dtype
        h_ln = nn.LayerNorm(name="ln_h")(nfeat).astype(dt)
        e_ln = nn.LayerNorm(name="ln_e")(efeat).astype(dt)
        qkv = nn.Dense(D * 3, dtype=dt, name="qkv")(h_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, dt))
        E_bias = nn.Dense(H, dtype=dt, name="e_bias")(e_ln)  # (B,N,N,H)
        G = nn.Dense(H, dtype=dt, name="e_gate")(e_ln)
        scores = scores + E_bias.transpose(0, 3, 1, 2)
        gates = jax.nn.sigmoid(G.transpose(0, 3, 1, 2))
        attn = jax.nn.softmax(scores.astype(jnp.float32),
                              -1).astype(dt) * gates
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        nfeat = nfeat + nn.Dense(D, dtype=dt,
                                 name="h_out")(out).astype(nfeat.dtype)
        nfeat = nfeat + nn.Dense(D, dtype=dt, name="h_ffn2")(
            jax.nn.gelu(nn.Dense(D * 2, dtype=dt, name="h_ffn1")(
                nn.LayerNorm(name="ln_h2")(nfeat).astype(dt)))
        ).astype(nfeat.dtype)
        # edge channel update from attention logits
        e_new = scores.transpose(0, 2, 3, 1)            # (B,N,N,H)
        efeat = efeat + nn.Dense(self.edge_feat_size, dtype=dt,
                                 name="e_out")(e_new).astype(efeat.dtype)
        efeat = efeat + nn.Dense(self.edge_feat_size, dtype=dt,
                                 name="e_ffn2")(
            jax.nn.gelu(nn.Dense(self.edge_feat_size * 2, dtype=dt,
                                 name="e_ffn1")(
                nn.LayerNorm(name="ln_e2")(efeat).astype(dt)))
        ).astype(efeat.dtype)
        return nfeat, efeat


class SpatialEncoder3d(nn.Module):
    """3D spatial attention-bias encoder via Gaussian basis kernels
    (Transformer-M, arXiv:2210.01765; reference
    ``nn/pytorch/gt/spatial_encoder.py:88``).  coord: (B, N, 3) ->
    (B, N, N, num_heads) bias; node-type-conditioned scale/shift of the
    pairwise distances."""
    num_kernels: int
    num_heads: int = 1
    max_node_type: int = 100

    @nn.compact
    def __call__(self, coord, node_type=None):
        B, N = coord.shape[:2]
        diff = coord[:, :, None, :] - coord[:, None, :, :]
        euc = jnp.sqrt((diff ** 2).sum(-1) + 1e-12)          # (B, N, N)
        n_emb = 2 * self.max_node_type + 3
        gamma_tbl = self.param("gamma", nn.initializers.ones,
                               (n_emb, 1), coord.dtype)
        beta_tbl = self.param("beta", nn.initializers.zeros,
                              (n_emb, 1), coord.dtype)
        # the pair table rows depend only on PER-NODE types, so gather
        # per node ((B,N) indices) and broadcast-sum to pairs — a
        # (B,N,N)-indexed gather would pay its backward as a scatter-add
        # over B*N^2 positions (the SpatialEncoder scatter pathology,
        # PERF_NOTES round 5)
        if node_type is None:
            g_src = jnp.broadcast_to(gamma_tbl[0], (B, N, 1))
            g_tgt = g_src
            b_src = jnp.broadcast_to(beta_tbl[0], (B, N, 1))
            b_tgt = b_src
        else:
            g_src = jnp.take(gamma_tbl, node_type + 2, axis=0)
            g_tgt = jnp.take(gamma_tbl,
                             node_type + self.max_node_type + 3, axis=0)
            b_src = jnp.take(beta_tbl, node_type + 2, axis=0)
            b_tgt = jnp.take(beta_tbl,
                             node_type + self.max_node_type + 3, axis=0)
        gamma = g_src[:, :, None, :] + g_tgt[:, None, :, :]  # (B,N,N,1)
        beta = b_src[:, :, None, :] + b_tgt[:, None, :, :]
        x = gamma * euc[..., None] + beta                    # (B,N,N,1)
        means = self.param("means",
                           nn.initializers.uniform(scale=3.0),
                           (self.num_kernels,), coord.dtype)
        stds = self.param("stds",
                          nn.initializers.uniform(scale=3.0),
                          (self.num_kernels,), coord.dtype)
        std = jnp.abs(stds) + 1e-2
        g = jnp.exp(-0.5 * ((x - means) / std) ** 2) / (
            np.sqrt(2 * np.pi) * std)                        # (B,N,N,K)
        h = nn.Dense(self.num_kernels, name="linear_layer_1")(g)
        h = jax.nn.gelu(h)
        return nn.Dense(self.num_heads, name="linear_layer_2")(h)
