"""Flat edge-data layouts for large-scale attention models.

TPU arrays tile the last two dims to (8, 128): a per-edge per-head
tensor shaped ``(E, H, 1)`` physically occupies E x 8 x 128 elements —
a 32-128x HBM blowup that OOMs GAT at Reddit scale (measured: a single
``u_add_v`` on (23M, 4, 1) asks for 22 GB).  The TPU-native layout for
per-edge scalars is **flat 1-D** ``(E*H,)`` (exact, lane-packed).

This module provides the GAT hot path in flat layout:
  * ``sddmm_flat``      — edge-wise binary op on (N, H) node data
  * ``edge_softmax_flat`` — per-(dst, head) segment softmax
  * ``spmm_mul_flat``   — attention-weighted aggregation, one tiled
                          Pallas SpMM per head (static unrolled loop)

``GATConv`` switches to these automatically above the tiled-SpMM edge
threshold (the same dispatch policy as g-SpMM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.unitgraph import UnitGraph


def _flat_gather(data2d, ids, H: int):
    """data2d: (N, H) -> flat rows for edges: out[(e*H)+h] = data2d[ids[e], h]."""
    flat = data2d.reshape(-1)
    idx = (ids[:, None] * H + jnp.arange(H, dtype=ids.dtype)[None]
           ).reshape(-1)
    return jnp.take(flat, idx, axis=0)


def sddmm_flat(unit: UnitGraph, op: str, lhs, rhs,
               lhs_target: str = "u", rhs_target: str = "v"):
    """lhs/rhs: (N, H) node data (or (E*H,) for target 'e').
    Returns (E*H,) in (edge-major, head-minor) order."""
    row, col = unit.coo()
    H = lhs.shape[1] if lhs is not None and lhs.ndim == 2 else (
        rhs.shape[1] if rhs is not None and rhs.ndim == 2 else 1)

    def pick(data, target):
        if data is None:
            return None
        if target == "u":
            return _flat_gather(data, row, H)
        if target == "v":
            return _flat_gather(data, col, H)
        return data.reshape(-1)

    x = pick(lhs, lhs_target)
    y = pick(rhs, rhs_target)
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
    raise ValueError(op)


def edge_softmax_flat(unit: UnitGraph, scores, H: int,
                      norm_by: str = "dst"):
    """scores: (E*H,) -> softmax over incoming edges per (node, head).

    Segment ids = node*H + head; max/sum via jax segment ops (1-D
    scatter — linear memory, no tile padding)."""
    row, col = unit.coo()
    key_nodes = col if norm_by == "dst" else row
    n = unit.num_dst if norm_by == "dst" else unit.num_src
    seg = (key_nodes[:, None] * H
           + jnp.arange(H, dtype=key_nodes.dtype)[None]).reshape(-1)
    smax = jax.ops.segment_max(scores, seg, num_segments=n * H)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(scores - jnp.take(smax, seg, axis=0))
    ssum = jax.ops.segment_sum(ex, seg, num_segments=n * H)
    return ex / jnp.maximum(jnp.take(ssum, seg, axis=0), 1e-20)


def _w_slot_from_flat(tf, w_flat, H: int):
    """(E*H,) canonical-order weights -> (B, H, C) slot-order weights
    with zeros at padded slots.  Built head-by-head as (B*C,) 1-D takes
    (a (B*C, H) intermediate would tile-pad H to 128 lanes)."""
    B, C = tf.src_local.shape[0], tf.cap
    eid = jnp.maximum(tf.eid, 0)                  # (B*C,)
    valid = tf.valid.reshape(B, C)
    cols = []
    for h in range(H):
        wh = jnp.take(w_flat, eid * H + h, axis=0).reshape(B, C)
        cols.append(wh * valid)
    return jnp.stack(cols, axis=1)                # (B, H, C)


def _mh_primal(tf_fwd, tf_rev, x, w_flat, H, Fh):
    from .pallas.tiled_spmm import tiled_spmm_multihead
    w_slot = _w_slot_from_flat(tf_fwd, w_flat, H)
    return tiled_spmm_multihead(tf_fwd, x, w_slot, H, Fh)


def _mh_fwd(tf_fwd, tf_rev, x, w_flat, H, Fh):
    return _mh_primal(tf_fwd, tf_rev, x, w_flat, H, Fh), (
        tf_fwd, tf_rev, x, w_flat)


def _mh_bwd(H, Fh, res, dZ):
    from .pallas.tiled_spmm import (tiled_spmm_multihead,
                                    tiled_sddmm_dot_multihead)
    tf_fwd, tf_rev, x, w_flat = res
    E = int(w_flat.shape[0]) // H
    # dX: reverse-graph multihead SpMM with the same weights
    w_slot_rev = _w_slot_from_flat(tf_rev, w_flat, H)
    dX = tiled_spmm_multihead(tf_rev, dZ, w_slot_rev, H, Fh)
    dX = dX[: x.shape[0]].astype(x.dtype)
    # dW[e,h] = <x[src,h,:], dZ[dst,h,:]> — multihead tiled SDDMM in
    # slot order, 1-D scatters back to canonical flat order
    e_slot = tiled_sddmm_dot_multihead(tf_fwd, x, dZ, H, Fh)
    dW = jnp.zeros((E * H,), w_flat.dtype)
    eid = tf_fwd.eid
    for h in range(H):
        pos = jnp.where(eid >= 0, eid * H + h, E * H)
        dW = dW.at[pos].set(e_slot[:, h, :].reshape(-1), mode="drop")
    return (None, None, dX, dW)


_spmm_mh_vjp = jax.custom_vjp(_mh_primal, nondiff_argnums=(4, 5))
_spmm_mh_vjp.defvjp(_mh_fwd, _mh_bwd)


def spmm_mul_flat(unit: UnitGraph, x, w_flat, H: int):
    """Attention aggregation: out[d, h] = sum_e w[e, h] * x[src_e, h].

    x: (N, H, F); w_flat: (E*H,).  ONE multihead tiled Pallas SpMM for
    all heads (head dim rides the lane axis) when the graph carries a
    tiled format; XLA segment-sum fallback otherwise.
    Returns (num_dst, H, F)."""
    E = unit.num_edges
    from .pallas import spmm as pallas_spmm
    from ..utils import config
    use_tiled = (config.use_pallas()
                 and E >= config.get("pallas_spmm_min_edges"))
    if use_tiled:
        tf_fwd, tf_rev = pallas_spmm.get_tiled_formats(
            unit, build_if_missing=config.get("pallas_auto_build_tiled"))
        if tf_fwd is not None:
            return _spmm_mh_vjp(tf_fwd, tf_rev, x, w_flat,
                                int(H), int(x.shape[-1]))
    w2 = w_flat.reshape(E, H)
    from .gspmm import gspmm_unit
    outs = [gspmm_unit(unit, "mul", "sum", x[:, h, :], w2[:, h][:, None])
            for h in range(H)]
    return jnp.stack(outs, axis=1)
