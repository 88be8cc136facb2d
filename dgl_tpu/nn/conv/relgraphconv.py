"""RelGraphConv (R-GCN) layer.

Reference spec ``python/dgl/nn/pytorch/conv/relgraphconv.py:10,115,147``
(SURVEY App. C): per-edge message ``m = TypedLinear(h_src, etype,
presorted)``; regularizers basis / bdd; ``update_all(copy_e, sum)`` +
self-loop + optional |r|-normalization.  On TPU the typed matmul is XLA
grouped GEMM; prefer edge-type-sorted graphs (``presorted=True``).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ... import function as fn
from ...core import update_all
from ...utils import expand_as_pair
from ..linear import TypedLinear


class RelGraphConv(nn.Module):
    in_feat: int
    out_feat: int
    num_rels: int
    regularizer: Optional[str] = None
    num_bases: Optional[int] = None
    bias: bool = True
    activation: Optional[Callable] = None
    self_loop: bool = True
    dropout: float = 0.0
    layer_norm: bool = False

    @nn.compact
    def __call__(self, g, feat, etypes, norm=None, *,
                 presorted: bool = False, deterministic: bool = True):
        linear_r = TypedLinear(self.in_feat, self.out_feat, self.num_rels,
                               self.regularizer, self.num_bases,
                               name="linear_r")
        feat_src, feat_dst = expand_as_pair(feat, g)
        # message: typed linear of src features per edge
        if getattr(g, "is_sharded", False):
            # mesh plane: per-edge tensors live in the slot layout
            # (P, ES, *F); the src gather is a halo gsddmm, the typed
            # GEMM runs over flattened slots (pad slots project type 0
            # and reduce into the dummy dst — dropped)
            from ...ops import gsddmm
            from ...parallel.halo_ops import edge_slots_from_canonical
            unit = g.unit()
            x_edge = gsddmm(unit, "copy_lhs", feat_src, None, "u", "v")
            p_, es = x_edge.shape[:2]
            ets = edge_slots_from_canonical(
                unit.hg, jnp.asarray(etypes, jnp.int32))
            m = linear_r(x_edge.reshape(p_ * es, -1), ets.reshape(-1),
                         sorted_by_type=False)
            m = m.reshape(p_, es, self.out_feat)
            if norm is not None:
                ns = edge_slots_from_canonical(unit.hg, jnp.asarray(norm))
                m = m * ns.reshape(ns.shape + (1,) * (m.ndim - ns.ndim))
        else:
            row, _ = g.unit().coo()
            x_edge = jnp.take(feat_src, row, axis=0)
            m = linear_r(x_edge, etypes, sorted_by_type=presorted)
            if norm is not None:
                m = m * norm.reshape(-1, *([1] * (m.ndim - 1)))
        g.edata["m"] = m
        h = update_all(g, fn.copy_e("m", "m"), fn.sum("m", "h"))["h"]
        if self.layer_norm:
            h = nn.LayerNorm(name="layer_norm")(h)
        if self.bias:
            h = h + self.param("h_bias", nn.initializers.zeros,
                               (self.out_feat,), h.dtype)
        if self.self_loop:
            loop_w = self.param("loop_weight",
                                nn.initializers.glorot_uniform(),
                                (self.in_feat, self.out_feat), h.dtype)
            h = h + feat_dst @ loop_w
        if self.activation is not None:
            h = self.activation(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
