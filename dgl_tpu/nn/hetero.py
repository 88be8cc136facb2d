"""HeteroGraphConv: per-relation module dispatch + cross-type aggregation
(reference ``python/dgl/nn/pytorch/hetero.py:12``)."""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Union

import flax.linen as nn
import jax.numpy as jnp

from ..graph.graph import Graph
from ..graph.unitgraph import UnitGraph


def _rel_view(g: Graph, cet) -> Graph:
    """A single-relation view of a heterograph (reference
    ``g[etype]`` slicing)."""
    etid = g.get_etype_id(cet)
    st, et, dt = cet
    if g._block_split is not None:
        sidx = g.get_src_ntype_id(st)
        didx = g.get_dst_ntype_id(dt)
        return Graph([st, dt], [cet],
                     [g._num_nodes[sidx], g._num_nodes[didx]],
                     [g._units[etid]],
                     node_frames=[g._node_frames[sidx],
                                  g._node_frames[didx]],
                     edge_frames=[g._edge_frames[etid]],
                     is_block=True, block_split=1)
    sidx = g.get_ntype_id(st)
    didx = g.get_ntype_id(dt)
    if st == dt:
        return Graph([st], [cet], [g._num_nodes[sidx]], [g._units[etid]],
                     node_frames=[g._node_frames[sidx]],
                     edge_frames=[g._edge_frames[etid]])
    # bipartite relation as a block-like graph so srcdata/dstdata work
    return Graph([st, dt], [cet],
                 [g._num_nodes[sidx], g._num_nodes[didx]],
                 [g._units[etid]],
                 node_frames=[g._node_frames[sidx], g._node_frames[didx]],
                 edge_frames=[g._edge_frames[etid]],
                 is_block=True, block_split=1)


class HeteroGraphConv(nn.Module):
    """Apply one sub-module per relation and aggregate multi-relation
    outputs per destination type.

    ``mods``: dict {etype_name: module}.  ``aggregate`` in
    {sum, max, min, mean, stack} or a callable.
    """
    mods: Mapping[str, Any]
    aggregate: Union[str, Callable] = "sum"

    def _agg(self, tensors):
        if callable(self.aggregate):
            return self.aggregate(tensors, None)
        if len(tensors) == 1 and self.aggregate != "stack":
            return tensors[0]
        stacked = jnp.stack(tensors)
        if self.aggregate == "sum":
            return stacked.sum(0)
        if self.aggregate == "max":
            return stacked.max(0)
        if self.aggregate == "min":
            return stacked.min(0)
        if self.aggregate == "mean":
            return stacked.mean(0)
        if self.aggregate == "stack":
            return jnp.stack(tensors, axis=1)
        raise ValueError(self.aggregate)

    @nn.compact
    def __call__(self, g: Graph, inputs: Dict[str, jnp.ndarray],
                 mod_args=None, mod_kwargs=None):
        mod_args = mod_args or {}
        mod_kwargs = mod_kwargs or {}
        outputs: Dict[str, list] = {}
        for cet in g.canonical_etypes:
            st, et, dt = cet
            if et not in self.mods:
                continue
            if st not in inputs:
                continue
            rel_g = _rel_view(g, cet)
            if st == dt and not g.is_block:
                feed = inputs[st]
            else:
                dst_in = inputs.get(dt)
                if dst_in is None:
                    dst_in = jnp.zeros(
                        (rel_g.num_dst_nodes(),) + inputs[st].shape[1:],
                        inputs[st].dtype)
                elif g.is_block:
                    dst_in = dst_in[: rel_g.num_dst_nodes()]
                feed = (inputs[st], dst_in)
            out = self.mods[et](rel_g, feed,
                                *mod_args.get(et, ()),
                                **mod_kwargs.get(et, {}))
            outputs.setdefault(dt, []).append(out)
        return {dt: self._agg(vals) for dt, vals in outputs.items()}
