"""Generalized SpMM: fused message + reduce over graph edges.

TPU-native re-design of the reference g-SpMM kernel family
(``src/array/kernel.cc:20-44``, CPU ``src/array/cpu/spmm.h:122``, CUDA
``src/array/cuda/spmm.cuh:413``): ``op in {add, sub, mul, div, copy_lhs,
copy_rhs}`` x ``reduce in {sum, max, min, mean}`` with numpy-style trailing
broadcast between node and edge operands.

Implementation strategy:
* edges are processed in CSC order (sorted by destination) so the reduce is a
  *sorted* segment reduction — XLA fuses the gather + segment-reduce into one
  pass over edges on TPU;
* native JAX AD supplies the exact reference backward: the transpose of a
  gather is a scatter-add, so d(lhs) of an SpMM *is* an SpMM on the reverse
  graph and d(rhs) *is* an SDDMM — the duality the reference hand-codes in
  ``python/dgl/backend/pytorch/sparse.py:195-249``.  For min/max, XLA's
  scatter-max gradient routes cotangents to the winning edges, matching the
  reference's argmin/argmax scatter backward (``sparse.py:213-221``);
* zero-degree destinations produce 0 for every reduce (reference
  zero-initialized outputs);
* ``mean`` is lowered to ``sum`` + degree division in this frontend, never in
  the kernel (reference ``python/dgl/ops/spmm.py:82-118``).

A Pallas TPU fast path for the hot ops is dispatched from here when
profitable (see ``dgl_tpu.ops.pallas``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.unitgraph import UnitGraph, _expand_indptr

BINARY_OPS = ("add", "sub", "mul", "div", "copy_lhs", "copy_rhs")
REDUCE_OPS = ("sum", "max", "min", "mean")


def align_feat_ranks(x, y):
    """Pad the lower-rank operand's *feature* shape with leading 1s so both
    have equal ndim (reference ``_sparse_ops.py:11 infer_broadcast_shape``:
    ``(E,)`` edge weights broadcast against ``(N, F)`` node features)."""
    if x is None or y is None:
        return x, y
    while x.ndim < y.ndim:
        x = x[:, None]
    while y.ndim < x.ndim:
        y = y[:, None]
    return x, y


def _apply_binary(op: str, x, y):
    if op == "add":
        return x + y
    if op == "sub":
        return x - y
    if op == "mul":
        return x * y
    if op == "div":
        return x / y
    if op == "copy_lhs":
        return x
    if op == "copy_rhs":
        return y
    raise ValueError(f"unknown op {op!r}")


def _csc_order(unit: UnitGraph):
    """(src_per_edge, dst_per_edge, canonical_eids), edges sorted by dst."""
    csc = unit.csc()
    dst = _expand_indptr(csc.indptr, unit.num_edges)
    return csc.indices, dst, csc.eids


def _edge_values(op, u_data, e_data, src, eids):
    """Per-edge messages (in the edge order given by ``src``/``eids``)."""
    x = None if u_data is None else jnp.take(u_data, src, axis=0)
    y = None if e_data is None else jnp.take(e_data, eids, axis=0)
    return _apply_binary(op, x, y)


def gspmm_unit(unit: UnitGraph, op: str, reduce_op: str, u_data, e_data):
    """g-SpMM on a single relation.

    ``u_data``: (num_src, *feat) or None; ``e_data``: (num_edges, *feat) in
    canonical edge order or None.  Returns (num_dst, *broadcast_feat).
    """
    if op not in BINARY_OPS:
        raise ValueError(f"invalid op {op}")
    if reduce_op not in REDUCE_OPS:
        raise ValueError(f"invalid reduce {reduce_op}")
    if op == "copy_lhs":
        e_data = None
    elif op == "copy_rhs":
        u_data = None
    u_data = _ensure_float(u_data)
    e_data = _ensure_float(e_data)
    u_data, e_data = align_feat_ranks(u_data, e_data)

    if reduce_op in ("sum", "mean"):
        from .pallas import dispatch as pallas_dispatch
        out = pallas_dispatch.try_spmm(unit, op, u_data, e_data)
        if out is None:
            src, dst, eids = _csc_order(unit)
            msg = _edge_values(op, u_data, e_data, src, eids)
            out = jax.ops.segment_sum(msg, dst, num_segments=unit.num_dst,
                                      indices_are_sorted=True)
        if reduce_op == "mean":
            deg = jnp.maximum(unit.in_degrees(), 1).astype(out.dtype)
            out = out / deg.reshape((-1,) + (1,) * (out.ndim - 1))
        return out

    # min / max
    src, dst, eids = _csc_order(unit)
    msg = _edge_values(op, u_data, e_data, src, eids)
    seg = jax.ops.segment_max if reduce_op == "max" else jax.ops.segment_min
    out = seg(msg, dst, num_segments=unit.num_dst, indices_are_sorted=True)
    deg = unit.in_degrees()
    empty = (deg == 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(empty, jnp.zeros_like(out), out)


def gspmm(g, op: str, reduce_op: str, lhs_data, rhs_data, etype=None):
    """Graph-level entry (reference ``python/dgl/ops/spmm.py:39 gspmm``)."""
    unit = g.unit(etype) if hasattr(g, "unit") else g
    if hasattr(unit, "halo_gspmm"):  # mesh-sharded graph (parallel/halo_ops)
        return unit.halo_gspmm(op, reduce_op, lhs_data, rhs_data)
    return gspmm_unit(unit, op, reduce_op, lhs_data, rhs_data)


def _ensure_float(x):
    if x is None:
        return None
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    return x
