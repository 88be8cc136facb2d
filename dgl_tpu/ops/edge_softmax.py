"""Edge softmax: normalize edge scores over each node's incident edges.

Reference: ``python/dgl/ops/edge_softmax.py:12``, kernel composition at
``src/array/kernel.cc:309-340`` (max -> sub -> exp -> sum -> div) and the
memory-light backward ``grad = out*dZ - out * spmm_sum(out*dZ)``
(``backend/pytorch/sparse.py:739-748``).

One fused pass over CSC-ordered edges with a ``custom_vjp`` that saves only
``out`` (not the max/sum intermediates) — the reference's memory behavior.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.unitgraph import UnitGraph, _expand_indptr


def _softmax_on_sorted(score_sorted, ids_sorted, num):
    smax = jax.ops.segment_max(score_sorted, ids_sorted, num_segments=num,
                               indices_are_sorted=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(score_sorted - jnp.take(smax, ids_sorted, axis=0))
    ssum = jax.ops.segment_sum(ex, ids_sorted, num_segments=num,
                               indices_are_sorted=True)
    return ex / jnp.take(jnp.maximum(ssum, 1e-38), ids_sorted, axis=0)


@jax.custom_vjp
def _edge_softmax_impl(ids_sorted, eids, inv, num, score):
    out, _ = _edge_softmax_fwd(ids_sorted, eids, inv, num, score)
    return out


def _edge_softmax_fwd(ids_sorted, eids, inv, num, score):
    # ``num`` is a (num_segments, 0) dummy whose static *shape* carries the
    # segment count through the custom_vjp (shapes are static in JAX).
    num_segments = int(num.shape[0])
    score_sorted = jnp.take(score, eids, axis=0)
    out_sorted = _softmax_on_sorted(score_sorted, ids_sorted, num_segments)
    out = jnp.take(out_sorted, inv, axis=0)
    return out, (out_sorted, ids_sorted, eids, inv, num)


def _edge_softmax_bwd(res, dZ):
    out_sorted, ids_sorted, eids, inv, num = res
    dZ_sorted = jnp.take(dZ, eids, axis=0)
    sds = out_sorted * dZ_sorted
    accum = jax.ops.segment_sum(sds, ids_sorted,
                                num_segments=int(num.shape[0]),
                                indices_are_sorted=True)
    grad_sorted = sds - out_sorted * jnp.take(accum, ids_sorted, axis=0)
    return (None, None, None, None, jnp.take(grad_sorted, inv, axis=0))


_edge_softmax_impl.defvjp(_edge_softmax_fwd, _edge_softmax_bwd)


def edge_softmax_unit(unit: UnitGraph, score, norm_by: str = "dst"):
    if norm_by == "dst":
        sp = unit.csc()
        num = unit.num_dst
    elif norm_by == "src":
        sp = unit.csr()
        num = unit.num_src
    else:
        raise ValueError(norm_by)
    ids_sorted = _expand_indptr(sp.indptr, unit.num_edges)
    eids = sp.eids
    inv = jnp.zeros((unit.num_edges,), jnp.int32).at[eids].set(
        jnp.arange(unit.num_edges, dtype=jnp.int32))
    num_marker = jnp.zeros((num, 0), jnp.int32)  # shape carries the count
    return _edge_softmax_impl(ids_sorted, eids, inv, num_marker, score)


def edge_softmax(g, score, eids=None, norm_by: str = "dst", etype=None):
    """Reference ``dgl.ops.edge_softmax``.  ``eids`` selects an edge subset
    (then ``score`` has that many rows)."""
    unit = g.unit(etype) if hasattr(g, "unit") else g
    if hasattr(unit, "halo_edge_softmax"):  # mesh-sharded (halo_ops)
        if eids is not None:
            # edge-subset softmax on the mesh: scatter the subset
            # scores into canonical order, normalize over the masked
            # subset on the halo plane, gather back.  ``score`` rows
            # follow ``eids`` (the single-chip subset contract).
            eids = jnp.asarray(eids, jnp.int32)
            ne = unit.num_edges
            mask = jnp.zeros((ne,), bool).at[eids].set(True)
            full = jnp.zeros((ne,) + tuple(score.shape[1:]),
                             score.dtype).at[eids].set(score)
            out_slots = unit.halo_edge_softmax(full, norm_by=norm_by,
                                               edge_mask=mask)
            return jnp.take(unit.edge_slots_to_canonical(out_slots),
                            eids, axis=0)
        return unit.halo_edge_softmax(score, norm_by=norm_by)
    if eids is not None:
        from ..graph.subgraph import edge_subgraph
        sub = edge_subgraph(g, jnp.asarray(eids), relabel_nodes=False,
                            store_ids=False)
        unit = sub.unit(etype)
    return edge_softmax_unit(unit, score, norm_by=norm_by)
