"""Common conv layers: GIN/GINE, SGC, APPNP, TAG, Cheb, EdgeConv, NNConv,
GatedGraphConv, CFConv, AGNN, PNA.

Reference files: ``python/dgl/nn/pytorch/conv/{ginconv,gineconv,sgconv,
appnpconv,tagconv,chebconv,edgeconv,nnconv,gatedgraphconv,cfconv,agnnconv,
pnaconv}.py`` — math follows those specs; implementation is jnp + the fused
ops layer.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import function as fn
from ...core import update_all, apply_edges
from ...ops import gspmm
from ...utils import expand_as_pair


class GINConv(nn.Module):
    """Graph Isomorphism Network (reference ``ginconv.py``):
    ``h = apply_func((1 + eps) * h_dst + aggregate(h_src))``."""
    apply_func: Optional[Any] = None
    aggregator_type: str = "sum"
    init_eps: float = 0.0
    learn_eps: bool = False
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None):
        if self.aggregator_type not in ("sum", "max", "mean"):
            raise ValueError(self.aggregator_type)
        feat_src, feat_dst = expand_as_pair(feat, graph)
        msg = fn.copy_u("h", "m")
        if edge_weight is not None:
            graph.edata["_w"] = edge_weight
            msg = fn.u_mul_e("h", "_w", "m")
        graph.srcdata["h"] = feat_src
        agg = update_all(graph, msg,
                         getattr(fn, self.aggregator_type)("m", "neigh"))[
                             "neigh"]
        if self.learn_eps:
            eps = self.param("eps", nn.initializers.constant(self.init_eps),
                             (), feat_dst.dtype)
        else:
            eps = self.init_eps
        rst = (1 + eps) * feat_dst + agg
        if self.apply_func is not None:
            rst = self.apply_func(rst)
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GINEConv(nn.Module):
    """GIN with edge features (reference ``gineconv.py``):
    message = relu(h_src + h_e)."""
    apply_func: Optional[Any] = None
    init_eps: float = 0.0
    learn_eps: bool = False

    @nn.compact
    def __call__(self, graph, node_feat, edge_feat):
        feat_src, feat_dst = expand_as_pair(node_feat, graph)
        graph.srcdata["hn"] = feat_src
        graph.edata["he"] = edge_feat
        msg = apply_edges(graph, fn.u_add_e("hn", "he", "m"))
        graph.edata["m_relu"] = jax.nn.relu(msg)
        agg = update_all(graph, fn.copy_e("m_relu", "m"),
                         fn.sum("m", "neigh"))["neigh"]
        if self.learn_eps:
            eps = self.param("eps", nn.initializers.constant(self.init_eps),
                             (), feat_dst.dtype)
        else:
            eps = self.init_eps
        rst = (1 + eps) * feat_dst + agg
        if self.apply_func is not None:
            rst = self.apply_func(rst)
        return rst


class SGConv(nn.Module):
    """Simplified GCN (reference ``sgconv.py``): A_hat^k X W."""
    in_feats: int
    out_feats: int
    k: int = 1
    cached: bool = False
    bias: bool = True
    norm: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None):
        unit = graph.unit()
        deg_in = jnp.maximum(unit.in_degrees(), 1).astype(feat.dtype) ** -0.5
        deg_out = jnp.maximum(unit.out_degrees(), 1).astype(
            feat.dtype) ** -0.5
        h = feat
        for _ in range(self.k):
            h = h * deg_out[:, None]
            h = gspmm(unit, "copy_lhs", "sum", h,
                      None) if edge_weight is None else gspmm(
                unit, "mul", "sum", h, edge_weight.reshape(-1, 1))
            h = h * deg_in[:, None]
        if self.norm is not None:
            h = self.norm(h)
        return nn.Dense(self.out_feats, use_bias=self.bias, name="fc")(h)


class APPNPConv(nn.Module):
    """Approximate personalized PageRank propagation (reference
    ``appnpconv.py``): h^{t+1} = (1-alpha) A_hat h^t + alpha h^0."""
    k: int
    alpha: float
    edge_drop: float = 0.0

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, *,
                 deterministic: bool = True):
        unit = graph.unit()
        deg_in = jnp.maximum(unit.in_degrees(), 1).astype(feat.dtype) ** -0.5
        deg_out = jnp.maximum(unit.out_degrees(), 1).astype(
            feat.dtype) ** -0.5
        h0 = feat
        h = feat
        for _ in range(self.k):
            h = h * deg_out[:, None]
            if edge_weight is not None:
                h = gspmm(unit, "mul", "sum", h, edge_weight.reshape(-1, 1))
            else:
                h = gspmm(unit, "copy_lhs", "sum", h, None)
            h = h * deg_in[:, None]
            h = (1 - self.alpha) * h + self.alpha * h0
        return h


class TAGConv(nn.Module):
    """Topology-adaptive GCN (reference ``tagconv.py``):
    concat(A^0 x .. A^k x) W."""
    in_feats: int
    out_feats: int
    k: int = 2
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None):
        unit = graph.unit()
        deg_in = jnp.maximum(unit.in_degrees(), 1).astype(feat.dtype) ** -0.5
        deg_out = jnp.maximum(unit.out_degrees(), 1).astype(
            feat.dtype) ** -0.5
        hs = [feat]
        h = feat
        for _ in range(self.k):
            h = h * deg_out[:, None]
            h = gspmm(unit, "copy_lhs", "sum", h, None)
            h = h * deg_in[:, None]
            hs.append(h)
        rst = nn.Dense(self.out_feats, use_bias=self.bias, name="lin")(
            jnp.concatenate(hs, axis=-1))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class ChebConv(nn.Module):
    """Chebyshev spectral conv (reference ``chebconv.py``): polynomial of
    the scaled Laplacian, lambda_max defaulting to 2."""
    in_feats: int
    out_feats: int
    k: int
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, lambda_max=None):
        unit = graph.unit()
        n = unit.num_dst
        deg = jnp.maximum(unit.in_degrees(), 1).astype(feat.dtype) ** -0.5
        if lambda_max is None:
            lambda_max = 2.0
        # scaled laplacian applied via spmm: L~ x = 2/lmax (x - D^-1/2 A
        # D^-1/2 x) - x
        def lap(x):
            y = x * deg[:, None]
            y = gspmm(unit, "copy_lhs", "sum", y, None)
            y = y * deg[:, None]
            return (2.0 / lambda_max) * (x - y) - x
        Tx_0 = feat
        out = nn.Dense(self.out_feats, use_bias=False, name="w0")(Tx_0)
        if self.k > 1:
            Tx_1 = lap(feat)
            out = out + nn.Dense(self.out_feats, use_bias=False,
                                 name="w1")(Tx_1)
            for i in range(2, self.k):
                Tx_2 = 2 * lap(Tx_1) - Tx_0
                out = out + nn.Dense(self.out_feats, use_bias=False,
                                     name=f"w{i}")(Tx_2)
                Tx_0, Tx_1 = Tx_1, Tx_2
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_feats,), out.dtype)
        return out


class EdgeConv(nn.Module):
    """EdgeConv from DGCNN (reference ``edgeconv.py``):
    max_e theta(h_u - h_v) + phi(h_v)."""
    in_feat: int
    out_feat: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, g, feat):
        feat_src, feat_dst = expand_as_pair(feat, g)
        g.srcdata["x"] = feat_src
        g.dstdata["x"] = feat_dst
        theta_in = apply_edges(g, fn.u_sub_v("x", "x", "theta"))
        theta = nn.Dense(self.out_feat, name="theta")(theta_in)
        phi = nn.Dense(self.out_feat, name="phi")(feat_dst)
        row, col = g.unit().coo()
        e = theta + jnp.take(phi, col, axis=0)
        g.edata["e"] = e
        return update_all(g, fn.copy_e("e", "m"), fn.max("m", "x"))["x"]


class NNConv(nn.Module):
    """Edge-conditioned conv / MPNN (reference ``nnconv.py``): per-edge
    weight matrix from an edge-feature MLP."""
    in_feats: int
    out_feats: int
    edge_func: Callable   # maps (E, De) -> (E, in*out)
    aggregator_type: str = "mean"
    residual: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, g, feat, efeat):
        feat_src, feat_dst = expand_as_pair(feat, g)
        W_e = self.edge_func(efeat).reshape(-1, self.in_feats,
                                            self.out_feats)
        row, col = g.unit().coo()
        m = jnp.einsum("ed,edk->ek", jnp.take(feat_src, row, axis=0), W_e)
        g.edata["m"] = m
        rst = update_all(g, fn.copy_e("m", "m"),
                         getattr(fn, self.aggregator_type)("m", "neigh"))[
                             "neigh"]
        if self.residual:
            rst = rst + nn.Dense(self.out_feats, use_bias=False,
                                 name="res_fc")(feat_dst)
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (self.out_feats,), rst.dtype)
        return rst


class GatedGraphConv(nn.Module):
    """Gated graph conv (reference ``gatedgraphconv.py``): GRU over
    n_steps of typed message passing."""
    in_feats: int
    out_feats: int
    n_steps: int
    n_etypes: int = 1

    @nn.compact
    def __call__(self, graph, feat, etypes=None):
        if self.in_feats > self.out_feats:
            raise ValueError("GatedGraphConv requires in_feats <= out_feats")
        n = graph.num_nodes()
        h = jnp.pad(feat, ((0, 0), (0, self.out_feats - self.in_feats)))
        gru = nn.GRUCell(self.out_feats, name="gru")
        W = self.param("W", nn.initializers.glorot_uniform(),
                       (self.n_etypes, self.out_feats, self.out_feats),
                       feat.dtype)
        unit = graph.unit()
        row, col = unit.coo()
        for _ in range(self.n_steps):
            if self.n_etypes == 1 or etypes is None:
                m = jnp.take(h, row, axis=0) @ W[0]
            else:
                from ...ops import gather_mm
                m = gather_mm(jnp.take(h, row, axis=0), W, idx_b=etypes)
            graph.edata["m"] = m
            a = update_all(graph, fn.copy_e("m", "m"), fn.sum("m", "a"))["a"]
            h, _ = gru(h, a)
        return h


class AGNNConv(nn.Module):
    """Attention-based GNN (reference ``agnnconv.py``): cosine-similarity
    attention with learnable temperature beta."""
    init_beta: float = 1.0
    learn_beta: bool = True

    @nn.compact
    def __call__(self, graph, feat):
        from ...ops import edge_softmax
        feat_src, feat_dst = expand_as_pair(feat, graph)
        norm_src = feat_src / jnp.maximum(
            jnp.linalg.norm(feat_src, axis=-1, keepdims=True), 1e-12)
        norm_dst = feat_dst / jnp.maximum(
            jnp.linalg.norm(feat_dst, axis=-1, keepdims=True), 1e-12)
        graph.srcdata.update({"ft": feat_src, "norm_h": norm_src})
        graph.dstdata.update({"norm_h_dst": norm_dst})
        cos = apply_edges(graph, fn.u_dot_v("norm_h", "norm_h_dst", "cos"))
        if self.learn_beta:
            beta = self.param("beta", nn.initializers.constant(
                self.init_beta), (), feat_src.dtype)
        else:
            beta = self.init_beta
        a = edge_softmax(graph, beta * cos)
        graph.edata["p"] = a
        return update_all(graph, fn.u_mul_e("ft", "p", "m"),
                          fn.sum("m", "ft"))["ft"]


class CFConv(nn.Module):
    """Continuous-filter conv from SchNet (reference ``cfconv.py``)."""
    node_in_feats: int
    edge_in_feats: int
    hidden_feats: int
    out_feats: int

    @nn.compact
    def __call__(self, g, node_feats, edge_feats):
        def shifted_softplus(x):
            return jax.nn.softplus(x) - jnp.log(2.0)
        project_edge = nn.Sequential([
            nn.Dense(self.hidden_feats), shifted_softplus,
            nn.Dense(self.hidden_feats), shifted_softplus])
        project_node = nn.Dense(self.hidden_feats, name="project_node")
        project_out = nn.Sequential([
            nn.Dense(self.out_feats), shifted_softplus])
        g.srcdata["hv"] = project_node(node_feats)
        g.edata["he"] = project_edge(edge_feats)
        h = update_all(g, fn.u_mul_e("hv", "he", "m"), fn.sum("m", "h"))["h"]
        return project_out(h)


class PNAConv(nn.Module):
    """Principal Neighborhood Aggregation (reference ``pnaconv.py``):
    multiple aggregators x degree scalers, tower-free variant."""
    in_size: int
    out_size: int
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    delta: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph, node_feat, edge_feat=None, *,
                 deterministic: bool = True):
        unit = graph.unit()
        feat_src, feat_dst = expand_as_pair(node_feat, graph)
        deg = jnp.maximum(unit.in_degrees(), 1).astype(node_feat.dtype)
        h = nn.Dense(self.in_size, name="pre")(feat_src)
        aggs = []
        for a in self.aggregators:
            if a == "mean":
                aggs.append(gspmm(unit, "copy_lhs", "mean", h, None))
            elif a == "max":
                aggs.append(gspmm(unit, "copy_lhs", "max", h, None))
            elif a == "min":
                aggs.append(gspmm(unit, "copy_lhs", "min", h, None))
            elif a == "sum":
                aggs.append(gspmm(unit, "copy_lhs", "sum", h, None))
            elif a == "std":
                m1 = gspmm(unit, "copy_lhs", "mean", h, None)
                m2 = gspmm(unit, "copy_lhs", "mean", h * h, None)
                aggs.append(jnp.sqrt(jnp.maximum(m2 - m1 * m1, 1e-12)))
            elif a == "var":
                m1 = gspmm(unit, "copy_lhs", "mean", h, None)
                m2 = gspmm(unit, "copy_lhs", "mean", h * h, None)
                aggs.append(jnp.maximum(m2 - m1 * m1, 0.0))
            else:
                raise ValueError(a)
        stacked = jnp.concatenate(aggs, axis=-1)
        scaled = []
        logd = jnp.log(deg + 1)[:, None]
        for s in self.scalers:
            if s == "identity":
                scaled.append(stacked)
            elif s == "amplification":
                scaled.append(stacked * (logd / self.delta))
            elif s == "attenuation":
                scaled.append(stacked * (self.delta / jnp.maximum(
                    logd, 1e-6)))
            else:
                raise ValueError(s)
        out = jnp.concatenate(scaled + [feat_dst], axis=-1)
        out = nn.Dense(self.out_size, name="post")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out
