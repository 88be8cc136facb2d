"""Generalized SDDMM: edge-wise binary op between src/dst/edge data.

Reference: ``src/array/kernel.cc`` SDDMM dispatch, CPU
``src/array/cpu/sddmm.h:32``, CUDA ``src/array/cuda/sddmm.cuh:100-331``
(including the tree-reduce ``dot`` kernel).  ``op in {add, sub, mul, div,
dot, copy_lhs, copy_rhs}``; operand targets in {'u', 'v', 'e'}.

Pure-jnp implementation in canonical (COO) edge order: gathers + elementwise.
Native JAX AD gives the exact reference backward (the transpose of a gather
is a scatter-add = SpMM on the reverse graph; ``backend/pytorch/sparse.py:
464-480``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.unitgraph import UnitGraph

SDDMM_OPS = ("add", "sub", "mul", "div", "dot", "copy_lhs", "copy_rhs")
TARGETS = ("u", "v", "e")


def _gather_target(unit: UnitGraph, data, target: str):
    if data is None:
        return None
    row, col = unit.coo()
    if target == "u":
        return jnp.take(data, row, axis=0)
    if target == "v":
        return jnp.take(data, col, axis=0)
    if target == "e":
        return data
    raise ValueError(f"invalid target {target!r}")


def gsddmm_unit(unit: UnitGraph, op: str, lhs_data, rhs_data,
                lhs_target: str = "u", rhs_target: str = "v"):
    """g-SDDMM on one relation; returns (num_edges, *feat) in canonical
    edge order."""
    if op not in SDDMM_OPS:
        raise ValueError(f"invalid op {op}")
    if op == "copy_lhs":
        rhs_data = None
    if op == "copy_rhs":
        lhs_data = None
    lhs_data = _ensure_float(lhs_data)
    rhs_data = _ensure_float(rhs_data)
    if op not in ("copy_lhs", "copy_rhs", "dot"):
        from .gspmm import align_feat_ranks
        lhs_data, rhs_data = align_feat_ranks(lhs_data, rhs_data)

    x = _gather_target(unit, lhs_data, lhs_target)
    y = _gather_target(unit, rhs_data, rhs_target)

    if op == "copy_lhs":
        return x
    if op == "copy_rhs":
        return y
    if op == "add":
        return x + y
    if op == "sub":
        return x - y
    if op == "mul":
        return x * y
    if op == "div":
        return x / y
    if op == "dot":
        return jnp.sum(x * y, axis=-1, keepdims=True)
    raise AssertionError


def gsddmm(g, op: str, lhs_data, rhs_data, lhs_target="u", rhs_target="v",
           etype=None):
    """Graph-level entry (reference ``python/dgl/ops/sddmm.py gsddmm``)."""
    unit = g.unit(etype) if hasattr(g, "unit") else g
    if hasattr(unit, "halo_gsddmm"):  # mesh-sharded graph (halo_ops)
        return unit.halo_gsddmm(op, lhs_data, rhs_data, lhs_target,
                                rhs_target)
    return gsddmm_unit(unit, op, lhs_data, rhs_data, lhs_target, rhs_target)


def _ensure_float(x):
    if x is None:
        return None
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    return x
