"""Block padding: the TPU answer to data-dependent minibatch shapes.

XLA compiles one program per shape signature, so unpadded sampled blocks
would trigger a recompile every step.  Each block is padded to bucketed
sizes (next power of two by default, linear buckets optionally):

* src nodes  -> ``S_pad`` (appended isolated nodes, zero features)
* dst nodes  -> ``D_pad`` (appended seed slots)
* edges      -> ``E_pad`` (appended edges dummy_src -> dummy_dst, where both
  endpoints are padded nodes, so no real destination's neighborhood —
  degrees included — changes)

Correctness: every real dst node keeps exactly its sampled edge set, so any
(op, reduce) — including mean/max and edge_softmax — is unaffected.  Valid
masks live in ``srcdata['_pad_mask']`` / ``dstdata['_pad_mask']`` /
``edata['_pad_mask']`` for loss masking.

This replaces the dynamic-shape machinery the reference gets for free from
PyTorch (SURVEY §7 'hard parts': bucketing policy is design problem #1).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, NID, EID
from ..graph.unitgraph import UnitGraph
from ..utils.arrays import pad_rows as _pad_rows_generic, concat as _concat

PAD_MASK = "_pad_mask"


def next_bucket(n: int, mode: str = "pow2", minimum: int = 16) -> int:
    """Smallest bucket >= n.  'pow2' doubles (max log2(N) compiles);
    'multiple128' rounds to the TPU lane count."""
    n = max(int(n), 1)
    if mode == "pow2":
        b = minimum
        while b < n:
            b *= 2
        return b
    if mode == "multiple128":
        return max(minimum, ((n + 127) // 128) * 128)
    raise ValueError(mode)


def pad_block(block: Graph, src_bucket: Optional[int] = None,
              dst_bucket: Optional[int] = None,
              edge_bucket: Optional[int] = None,
              mode: str = "pow2") -> Graph:
    """Pad a homogeneous block to bucketed static shapes."""
    if not block.is_homogeneous and len(block.canonical_etypes) != 1:
        raise NotImplementedError("pad_block: one relation at a time")
    unit = block.unit()
    S, D, E = unit.num_src, unit.num_dst, unit.num_edges
    S_pad = src_bucket or next_bucket(S + 1, mode)
    D_pad = dst_bucket or next_bucket(D + 1, mode)
    E_pad = edge_bucket or next_bucket(E, mode)
    if S_pad < S + 1 or D_pad < D + 1 or E_pad < E:
        raise ValueError("bucket smaller than content")

    row, col = unit.coo()
    host = isinstance(row, np.ndarray)
    pad_e = E_pad - E
    # dummy edges between the last padded src and last padded dst
    if host:
        new_row = np.concatenate([
            row, np.full((pad_e,), S_pad - 1, np.int32)])
        new_col = np.concatenate([
            col, np.full((pad_e,), D_pad - 1, np.int32)])
    else:
        new_row = jnp.concatenate([
            row, jnp.full((pad_e,), S_pad - 1, jnp.int32)])
        new_col = jnp.concatenate([
            col, jnp.full((pad_e,), D_pad - 1, jnp.int32)])
    new_unit = UnitGraph.from_coo(S_pad, D_pad, new_row, new_col)

    pad_rows = _pad_rows_generic
    _mask = (lambda total, cur: np.arange(total) < cur) if host else (
        lambda total, cur: jnp.arange(total) < cur)

    split = block._block_split
    node_frames = []
    for i, frame in enumerate(block._node_frames):
        total = S_pad if i < split else D_pad
        cur = block._num_nodes[i]
        nf = {k: pad_rows(v, total) for k, v in frame.items()}
        nf[PAD_MASK] = _mask(total, cur)
        node_frames.append(nf)
    edge_frames = []
    for frame in block._edge_frames:
        ef = {k: pad_rows(v, E_pad) for k, v in frame.items()}
        ef[PAD_MASK] = _mask(E_pad, E)
        edge_frames.append(ef)

    return Graph(block.ntypes, block.canonical_etypes,
                 [S_pad] * split + [D_pad] * (len(block.ntypes) - split),
                 [new_unit], node_frames=node_frames,
                 edge_frames=edge_frames, is_block=True, block_split=split)


def pad_graph(g: Graph, num_nodes_bucket: Optional[int] = None,
              num_edges_bucket: Optional[int] = None,
              mode: str = "pow2") -> Graph:
    """Pad a homogeneous graph (subgraph-sampler output) to buckets; same
    dummy-endpoint scheme."""
    unit = g.unit()
    N, E = unit.num_src, unit.num_edges
    N_pad = num_nodes_bucket or next_bucket(N + 1, mode)
    E_pad = num_edges_bucket or next_bucket(E, mode)
    row, col = unit.coo()
    host = isinstance(row, np.ndarray)
    pad_e = E_pad - E
    if host:
        new_row = np.concatenate([row, np.full((pad_e,), N_pad - 1,
                                               np.int32)])
        new_col = np.concatenate([col, np.full((pad_e,), N_pad - 1,
                                               np.int32)])
    else:
        new_row = jnp.concatenate([row, jnp.full((pad_e,), N_pad - 1,
                                                 jnp.int32)])
        new_col = jnp.concatenate([col, jnp.full((pad_e,), N_pad - 1,
                                                 jnp.int32)])
    new_unit = UnitGraph.from_coo(N_pad, N_pad, new_row, new_col)

    pad_rows = _pad_rows_generic
    _ar = np.arange if host else jnp.arange
    nf = {k: pad_rows(v, N_pad) for k, v in g._node_frames[0].items()}
    nf[PAD_MASK] = _ar(N_pad) < N
    ef = {k: pad_rows(v, E_pad) for k, v in g._edge_frames[0].items()}
    ef[PAD_MASK] = _ar(E_pad) < E
    return Graph(g.ntypes, g.canonical_etypes, [N_pad], [new_unit],
                 node_frames=[nf], edge_frames=[ef])
