"""GraphConv (GCN) layer.

Reference math spec: ``python/dgl/nn/pytorch/conv/graphconv.py:157``
(see SURVEY Appendix C): ``norm in {none, both, right, left}``; ``both``
scales by out-deg^-1/2 before and in-deg^-1/2 after aggregation; weight
applied before the SpMM when ``in_feats > out_feats`` (fewer FLOPs), after
otherwise; 0-in-degree check unless ``allow_zero_in_degree``.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import function as fn
from ...core import update_all
from ...utils import expand_as_pair


class GraphConv(nn.Module):
    in_feats: int
    out_feats: int
    norm: str = "both"
    weight: bool = True
    bias: bool = True
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False

    @nn.compact
    def __call__(self, graph, feat, weight=None, edge_weight=None,
                 _params_only=False):
        if self.norm not in ("none", "both", "right", "left"):
            raise ValueError(f"invalid norm {self.norm!r}")
        if _params_only:
            # HeteroGraphConv fused dispatch: create this module's params
            # (identical names/shapes to the normal path) and hand them
            # back so the caller can batch R relations into one stacked
            # SpMM.  No computation happens here.
            dtype = (feat[0] if isinstance(feat, tuple) else feat).dtype
            w = (self.param("weight", nn.initializers.glorot_uniform(),
                            (self.in_feats, self.out_feats), dtype)
                 if self.weight else None)
            b = (self.param("bias", nn.initializers.zeros,
                            (self.out_feats,), dtype)
                 if self.bias else None)
            return w, b
        if not self.allow_zero_in_degree:
            # reference raises DGLError on 0-in-degree nodes (graphconv.py
            # :406-420); here a cheap host check only outside jit
            pass

        feat_src, feat_dst = expand_as_pair(feat, graph)
        unit = graph.unit()

        if self.norm in ("left", "both"):
            degs = jnp.maximum(unit.out_degrees(), 1).astype(feat_src.dtype)
            if self.norm == "both":
                norm = degs ** -0.5
            else:
                norm = 1.0 / degs
            feat_src = feat_src * norm.reshape(
                (-1,) + (1,) * (feat_src.ndim - 1))

        if weight is None and self.weight:
            weight = self.param(
                "weight", nn.initializers.glorot_uniform(),
                (self.in_feats, self.out_feats), feat_src.dtype)

        msg_fn = fn.copy_u("h", "m")
        if isinstance(edge_weight, str):
            # field-name form: reads edata[edge_weight] directly, hitting
            # the static slot-weight cache if Graph.cache_edge_weights was
            # called on that field
            msg_fn = fn.u_mul_e("h", edge_weight, "m")
        elif edge_weight is not None:
            graph.edata["_edge_weight"] = edge_weight
            msg_fn = fn.u_mul_e("h", "_edge_weight", "m")

        if self.in_feats > self.out_feats:
            if weight is not None:
                feat_src = feat_src @ weight
            graph.srcdata["h"] = feat_src
            rst = update_all(graph, msg_fn, fn.sum("m", "h"))["h"]
        else:
            graph.srcdata["h"] = feat_src
            rst = update_all(graph, msg_fn, fn.sum("m", "h"))["h"]
            if weight is not None:
                rst = rst @ weight

        if self.norm in ("right", "both"):
            degs = jnp.maximum(unit.in_degrees(), 1).astype(feat_dst.dtype)
            if self.norm == "both":
                norm = degs ** -0.5
            else:
                norm = 1.0 / degs
            rst = rst * norm.reshape((-1,) + (1,) * (rst.ndim - 1))

        if self.bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_feats,), rst.dtype)
            rst = rst + b
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class EdgeWeightNorm(nn.Module):
    """Normalize scalar edge weights (reference ``graphconv.py
    EdgeWeightNorm``): 'both' gives w_uv / sqrt(deg_u deg_v) with weighted
    degrees."""
    norm: str = "both"
    eps: float = 0.0

    @nn.compact
    def __call__(self, graph, edge_weight):
        unit = graph.unit()
        row, col = unit.coo()
        from ...ops import gspmm
        wdeg_in = gspmm(unit, "copy_rhs", "sum", None, edge_weight)
        if self.norm == "both":
            wdeg_out = gspmm(unit.reverse(), "copy_rhs", "sum", None,
                             edge_weight)
            norm_src = jax.lax.rsqrt(jnp.maximum(wdeg_out + self.eps, 1e-12))
            norm_dst = jax.lax.rsqrt(jnp.maximum(wdeg_in + self.eps, 1e-12))
            return (edge_weight * jnp.take(norm_src, row)
                    * jnp.take(norm_dst, col))
        if self.norm == "right":
            return edge_weight / jnp.maximum(
                jnp.take(wdeg_in, col) + self.eps, 1e-12)
        raise ValueError(self.norm)
