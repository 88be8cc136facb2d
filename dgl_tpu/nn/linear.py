"""Typed linear layer (reference ``python/dgl/nn/pytorch/linear.py:13``):
per-type weight matrices applied by type index — segment_mm when presorted,
gather_mm otherwise; both map to XLA grouped GEMM (``ragged_dot``) on TPU.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import segment_mm, gather_mm


class TypedLinear(nn.Module):
    in_size: int
    out_size: int
    num_types: int
    regularizer: str | None = None   # None | 'basis' | 'bdd'
    num_bases: int | None = None

    def _weights(self, dtype):
        if self.regularizer is None:
            return self.param("W", nn.initializers.glorot_uniform(),
                              (self.num_types, self.in_size, self.out_size),
                              dtype)
        if self.regularizer == "basis":
            if self.num_bases is None:
                raise ValueError("basis regularizer needs num_bases")
            V = self.param("V", nn.initializers.glorot_uniform(),
                           (self.num_bases, self.in_size, self.out_size),
                           dtype)
            coeff = self.param("coeff", nn.initializers.glorot_uniform(),
                               (self.num_types, self.num_bases), dtype)
            return jnp.einsum("tb,bio->tio", coeff, V)
        if self.regularizer == "bdd":
            if self.num_bases is None:
                raise ValueError("bdd regularizer needs num_bases")
            if (self.in_size % self.num_bases or
                    self.out_size % self.num_bases):
                raise ValueError("in/out size must divide num_bases")
            bi = self.in_size // self.num_bases
            bo = self.out_size // self.num_bases
            blocks = self.param("W_blocks", nn.initializers.glorot_uniform(),
                                (self.num_types, self.num_bases, bi, bo),
                                dtype)
            # expand block-diagonal to dense (small matrices; XLA folds this)
            W = jnp.zeros((self.num_types, self.in_size, self.out_size),
                          blocks.dtype)
            for b in range(self.num_bases):
                W = W.at[:, b * bi:(b + 1) * bi, b * bo:(b + 1) * bo].set(
                    blocks[:, b])
            return W
        raise ValueError(self.regularizer)

    @nn.compact
    def __call__(self, x, x_type, sorted_by_type: bool = False):
        W = self._weights(x.dtype)
        if sorted_by_type:
            seglen = jnp.zeros((self.num_types,), jnp.int32).at[
                x_type.astype(jnp.int32)].add(1)
            return segment_mm(x, W, seglen)
        return gather_mm(x, W, idx_b=x_type)


class HeteroLinear(nn.Module):
    """Per-type dense layers over a dict of features (reference
    ``python/dgl/nn/pytorch/linear.py HeteroLinear``)."""
    in_size: dict      # {type: in_dim}
    out_size: int
    bias: bool = True

    @nn.compact
    def __call__(self, feat: dict) -> dict:
        out = {}
        for ty, x in feat.items():
            out[ty] = nn.Dense(self.out_size, use_bias=self.bias,
                               name=f"linear_{ty}")(x)
        return out


class HeteroEmbedding(nn.Module):
    """Per-type embedding tables (reference ``linear.py HeteroEmbedding``)."""
    num_embeddings: dict   # {type: count}
    embedding_dim: int

    @nn.compact
    def __call__(self, ids: dict) -> dict:
        out = {}
        for ty, idx in ids.items():
            emb = nn.Embed(self.num_embeddings[ty], self.embedding_dim,
                           name=f"emb_{ty}")
            out[ty] = emb(idx)
        return out
