"""SAGEConv (GraphSAGE) layer.

Reference spec ``python/dgl/nn/pytorch/conv/sageconv.py:12`` (SURVEY App. C):
aggregators ``mean | gcn | pool | lstm``; ``lin_before_mp`` ordering trick
when in > out; result = fc_self(h_dst) + fc_neigh(h_neigh) except for gcn.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import function as fn
from ...core import update_all
from ...utils import expand_as_pair


class SAGEConv(nn.Module):
    in_feats: int
    out_feats: int
    aggregator_type: str = "mean"
    feat_drop: float = 0.0
    bias: bool = True
    norm: Optional[Callable] = None
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, *,
                 deterministic: bool = True, _params_only: bool = False):
        if self.aggregator_type not in ("mean", "gcn", "pool", "lstm"):
            raise ValueError(
                f"invalid aggregator_type {self.aggregator_type!r}")
        if _params_only:
            # HeteroGraphConv fused dispatch (mean aggregator): create
            # this module's params with the exact names/shapes of the
            # normal path and hand the weight arrays back so the caller
            # can stack R relations into one union-graph SpMM + one
            # batched GEMM.  No computation happens here.
            x1 = (feat[0] if isinstance(feat, tuple) else feat)[:1]
            fc_neigh = nn.Dense(self.out_feats, use_bias=False,
                                name="fc_neigh")
            fc_self = nn.Dense(self.out_feats, use_bias=self.bias,
                               name="fc_self")
            _ = fc_neigh(x1)
            _ = fc_self(x1)
            wn = fc_neigh.variables["params"]["kernel"]
            ws = fc_self.variables["params"]["kernel"]
            b = (fc_self.variables["params"]["bias"] if self.bias
                 else None)
            return wn, ws, b
        feat_src, feat_dst = expand_as_pair(feat, graph)
        if self.feat_drop > 0:
            drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
            feat_src = drop(feat_src)
            feat_dst = drop(feat_dst)

        lin_before_mp = self.in_feats > self.out_feats
        fc_neigh = nn.Dense(self.out_feats, use_bias=False, name="fc_neigh")

        msg_fn = fn.copy_u("h", "m")
        if edge_weight is not None:
            graph.edata["_edge_weight"] = edge_weight
            msg_fn = fn.u_mul_e("h", "_edge_weight", "m")

        agg = self.aggregator_type
        if agg == "mean":
            graph.srcdata["h"] = (fc_neigh(feat_src) if lin_before_mp
                                  else feat_src)
            h_neigh = update_all(graph, msg_fn, fn.mean("m", "neigh"))["neigh"]
            if not lin_before_mp:
                h_neigh = fc_neigh(h_neigh)
        elif agg == "gcn":
            graph.srcdata["h"] = (fc_neigh(feat_src) if lin_before_mp
                                  else feat_src)
            h_sum = update_all(graph, msg_fn, fn.sum("m", "neigh"))["neigh"]
            h_self = (fc_neigh(feat_dst) if lin_before_mp else feat_dst)
            degs = graph.unit().in_degrees().astype(feat_dst.dtype)
            h_neigh = (h_sum + h_self) / (degs[:, None] + 1)
            if not lin_before_mp:
                h_neigh = fc_neigh(h_neigh)
        elif agg == "pool":
            fc_pool = nn.Dense(self.in_feats, name="fc_pool")
            graph.srcdata["h"] = jax.nn.relu(fc_pool(feat_src))
            h_neigh = update_all(graph, msg_fn, fn.max("m", "neigh"))["neigh"]
            h_neigh = fc_neigh(h_neigh)
        else:  # lstm — UDF reducer over the mailbox (exercises bucketing)
            cell = nn.OptimizedLSTMCell(self.in_feats, name="lstm")

            def lstm_reducer(nodes):
                # padded degree is static per bucket, so a Python loop
                # unrolls to a fixed-length LSTM chain (flax cells cannot
                # be called under a raw lax.scan trace).  With pow2-padded
                # mailboxes the true sequence length varies per node: the
                # LSTM state at step t only depends on inputs <= t, so the
                # exact result is the output at step degrees()-1.
                m = nodes.mailbox["m"]  # (n, deg_pad, d)
                bs = m.shape[0]
                carry = cell.initialize_carry(
                    jax.random.PRNGKey(0), (bs, self.in_feats))
                ys = []
                for t in range(m.shape[1]):
                    carry, y = cell(carry, m[:, t])
                    ys.append(y)
                if nodes.mailbox_mask is None:
                    return {"neigh": ys[-1]}
                ys = jnp.stack(ys, axis=1)          # (n, deg_pad, d)
                last = jnp.maximum(nodes.degrees() - 1, 0)
                return {"neigh": jnp.take_along_axis(
                    ys, last[:, None, None], axis=1)[:, 0]}

            graph.srcdata["h"] = feat_src
            h_neigh = update_all(graph, fn.copy_u("h", "m"),
                                 lstm_reducer)["neigh"]
            h_neigh = fc_neigh(h_neigh)

        if agg == "gcn":
            rst = h_neigh
            if self.bias:
                rst = rst + self.param("bias", nn.initializers.zeros,
                                       (self.out_feats,), rst.dtype)
        else:
            fc_self = nn.Dense(self.out_feats, use_bias=self.bias,
                               name="fc_self")
            rst = fc_self(feat_dst) + h_neigh

        if self.activation is not None:
            rst = self.activation(rst)
        if self.norm is not None:
            rst = self.norm(rst)
        return rst
