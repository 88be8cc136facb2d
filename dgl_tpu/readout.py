"""Graph-level readout ops (reference ``python/dgl/readout.py:26``):
``readout_nodes`` / ``sum_nodes`` / ``mean_nodes`` / ``softmax_nodes`` /
``broadcast_nodes`` / ``topk_nodes`` and the edge mirrors.

On a batched graph these reduce per component via segment ops — a single
sorted segment reduction on TPU (component ids are monotonically
non-decreasing by construction of ``dgl_tpu.batch``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.segment import segment_reduce, segment_softmax, _ids_from_seglen


def _node_seglen(g, ntype):
    return g.batch_num_nodes(ntype)


def _edge_seglen(g, etype):
    return g.batch_num_edges(etype)


def readout_nodes(g, feat: str, weight=None, op: str = "sum", ntype=None):
    x = g._node_frames[g.get_ntype_id(ntype)][feat]
    if weight is not None:
        w = g._node_frames[g.get_ntype_id(ntype)][weight]
        x = x * w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
    seglen = _node_seglen(g, ntype)
    out = segment_reduce(seglen, x, reducer=op)
    return out


def readout_edges(g, feat: str, weight=None, op: str = "sum", etype=None):
    x = g._edge_frames[g.get_etype_id(etype)][feat]
    if weight is not None:
        w = g._edge_frames[g.get_etype_id(etype)][weight]
        x = x * w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
    return segment_reduce(_edge_seglen(g, etype), x, reducer=op)


def sum_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, op="sum", ntype=ntype)


def mean_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, op="mean", ntype=ntype)


def max_nodes(g, feat, weight=None, ntype=None):
    return readout_nodes(g, feat, weight, op="max", ntype=ntype)


def sum_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, op="sum", etype=etype)


def mean_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, op="mean", etype=etype)


def max_edges(g, feat, weight=None, etype=None):
    return readout_edges(g, feat, weight, op="max", etype=etype)


def softmax_nodes(g, feat, ntype=None):
    x = g._node_frames[g.get_ntype_id(ntype)][feat]
    return segment_softmax(_node_seglen(g, ntype), x)


def softmax_edges(g, feat, etype=None):
    x = g._edge_frames[g.get_etype_id(etype)][feat]
    return segment_softmax(_edge_seglen(g, etype), x)


def broadcast_nodes(g, value, ntype=None):
    """Per-graph value -> per-node rows (reference
    ``dgl.broadcast_nodes``)."""
    seglen = _node_seglen(g, ntype)
    total = g.num_nodes(ntype) if ntype is not None or len(g.ntypes) == 1 \
        else g.num_nodes()
    ids = _ids_from_seglen(seglen, total)
    return jnp.take(value, ids, axis=0)


def broadcast_edges(g, value, etype=None):
    seglen = _edge_seglen(g, etype)
    total = g.num_edges(etype)
    ids = _ids_from_seglen(seglen, total)
    return jnp.take(value, ids, axis=0)


def _topk_segments(x, seglen, k, descending=True, sortby=-1):
    """Shared top-k over contiguous segments: (batch, k, d) values +
    (batch, k) within-segment indices, padded with -inf/inf for segments
    smaller than k."""
    bs = seglen.shape[0]
    n = x.shape[0]
    ids = _ids_from_seglen(seglen, n)
    key = x[:, sortby] if x.ndim > 1 else x
    fill = -jnp.inf if descending else jnp.inf
    # per-component dense (bs, max_n) score matrix then top_k
    max_n = int(jnp.max(seglen)) if not isinstance(seglen, jnp.ndarray) \
        else int(jax.device_get(jnp.max(seglen)))
    pos_in_seg = jnp.arange(n, dtype=jnp.int32) - jnp.take(
        jnp.concatenate([jnp.zeros(1, jnp.int32),
                         jnp.cumsum(seglen)[:-1]]), ids)
    dense = jnp.full((bs, max_n), fill, key.dtype).at[ids, pos_in_seg].set(key)
    sign = 1.0 if descending else -1.0
    _, idx = jax.lax.top_k(sign * dense, k)
    row_base = jnp.take(
        jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(seglen)[:-1]]),
        jnp.arange(bs))
    flat = row_base[:, None] + idx
    flat = jnp.clip(flat, 0, n - 1)
    vals = jnp.take(x, flat.reshape(-1), axis=0).reshape(
        (bs, k) + x.shape[1:])
    return vals, idx


def topk_nodes(g, feat, k, descending=True, sortby=-1, ntype=None):
    """Top-k node features per graph component (reference
    ``dgl.topk_nodes``): returns (batch, k, d) values padded with -inf/inf
    for components smaller than k."""
    x = g._node_frames[g.get_ntype_id(ntype)][feat]
    return _topk_segments(x, _node_seglen(g, ntype), k, descending, sortby)


def topk_edges(g, feat, k, descending=True, sortby=-1, etype=None):
    """Top-k edge features per graph component (reference
    ``dgl.topk_edges``)."""
    x = g._edge_frames[g.get_etype_id(etype)][feat]
    return _topk_segments(x, _edge_seglen(g, etype), k, descending, sortby)
