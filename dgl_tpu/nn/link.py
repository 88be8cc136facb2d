"""Link prediction scorers (reference ``python/dgl/nn/pytorch/link/``:
TransE, TransR, EdgePredictor)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TransE(nn.Module):
    """TransE score: -||h + r - t|| (reference ``link/transe.py``)."""
    num_rels: int
    feats: int
    p: int = 1

    @nn.compact
    def __call__(self, h_head, h_tail, rels):
        rel_emb = self.param("rel_emb", nn.initializers.glorot_uniform(),
                             (self.num_rels, self.feats), h_head.dtype)
        r = jnp.take(rel_emb, rels, axis=0)
        diff = h_head + r - h_tail
        if self.p == 1:
            return -jnp.abs(diff).sum(-1)
        return -jnp.sqrt(jnp.maximum((diff ** 2).sum(-1), 1e-12))


class TransR(nn.Module):
    """TransR: project entities into a per-relation space first
    (reference ``link/transr.py``)."""
    num_rels: int
    rfeats: int
    nfeats: int
    p: int = 1

    @nn.compact
    def __call__(self, h_head, h_tail, rels):
        rel_emb = self.param("rel_emb", nn.initializers.glorot_uniform(),
                             (self.num_rels, self.rfeats), h_head.dtype)
        proj = self.param("rel_project",
                          nn.initializers.glorot_uniform(),
                          (self.num_rels, self.nfeats, self.rfeats),
                          h_head.dtype)
        P = jnp.take(proj, rels, axis=0)       # (B, nfeats, rfeats)
        r = jnp.take(rel_emb, rels, axis=0)
        hh = jnp.einsum("bn,bnr->br", h_head, P)
        ht = jnp.einsum("bn,bnr->br", h_tail, P)
        diff = hh + r - ht
        if self.p == 1:
            return -jnp.abs(diff).sum(-1)
        return -jnp.sqrt(jnp.maximum((diff ** 2).sum(-1), 1e-12))


class EdgePredictor(nn.Module):
    """Pairwise scorer (reference ``link/edgepred.py``): op in
    {dot, cos, ele, cat}; optional output projection."""
    op: str = "dot"
    in_feats: int = 0
    out_feats: int = 0
    bias: bool = False

    @nn.compact
    def __call__(self, h_src, h_dst):
        if self.op == "dot":
            out = (h_src * h_dst).sum(-1, keepdims=True)
        elif self.op == "cos":
            ns = h_src / jnp.maximum(
                jnp.linalg.norm(h_src, axis=-1, keepdims=True), 1e-12)
            nd = h_dst / jnp.maximum(
                jnp.linalg.norm(h_dst, axis=-1, keepdims=True), 1e-12)
            out = (ns * nd).sum(-1, keepdims=True)
        elif self.op == "ele":
            out = h_src * h_dst
        elif self.op == "cat":
            out = jnp.concatenate([h_src, h_dst], axis=-1)
        else:
            raise ValueError(self.op)
        if self.out_feats:
            out = nn.Dense(self.out_feats, use_bias=self.bias,
                           name="proj")(out)
        return out
