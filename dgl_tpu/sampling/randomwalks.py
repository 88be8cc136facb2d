"""Random walks (reference ``python/dgl/sampling/randomwalks.py:11``, C++
``src/graph/sampling/randomwalks/``): metapath walks, node2vec walks,
restart probability.  Vectorized numpy over all traces per step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph
from ..utils import np_rng


def _step(indptr, indices, eids, cur, rng, prob_w=None):
    """One uniform (or weighted) step from current nodes; -1 stays -1."""
    nxt = np.full_like(cur, -1)
    eid_out = np.full_like(cur, -1)
    alive = cur >= 0
    ca = cur[alive]
    deg = indptr[ca + 1] - indptr[ca]
    has = deg > 0
    rows = ca[has]
    if len(rows):
        if prob_w is None:
            offs = (rng.random(len(rows)) * deg[has]).astype(np.int64)
        else:
            offs = np.empty(len(rows), np.int64)
            for i, r in enumerate(rows):  # weighted rows loop (rare path)
                lo, hi = indptr[r], indptr[r + 1]
                w = prob_w[eids[lo:hi]]
                s = w.sum()
                if s <= 0:
                    offs[i] = 0
                    continue
                offs[i] = np.searchsorted(np.cumsum(w / s),
                                          rng.random())
        pos = indptr[rows] + offs
        chosen = indices[pos]
        ch_eid = eids[pos]
        tmp = np.full(len(ca), -1, np.int64)
        tmp_eid = np.full(len(ca), -1, np.int64)
        tmp[has] = chosen
        tmp_eid[has] = ch_eid
        nxt[alive] = tmp
        eid_out[alive] = tmp_eid
    return nxt, eid_out


def random_walk(g: Graph, nodes, *, metapath=None, length=None,
                prob: Optional[str] = None, restart_prob=None,
                return_eids: bool = False):
    """Reference ``dgl.sampling.random_walk``: returns (traces, types)
    [+eids]; traces (num_seeds, len+1) with -1 padding after dead ends."""
    rng = np_rng()
    nodes = np.asarray(nodes).astype(np.int64)
    n_traces = len(nodes)

    if metapath is None:
        if len(g.canonical_etypes) != 1:
            raise ValueError("need metapath on heterographs")
        metapath = [g.canonical_etypes[0]] * int(length)
    metapath = [g.to_canonical_etype(m) for m in metapath]

    # node types along the walk
    types = [g.get_ntype_id(metapath[0][0])]
    for cet in metapath:
        types.append(g.get_ntype_id(cet[2]))

    traces = np.full((n_traces, len(metapath) + 1), -1, np.int64)
    eids_out = np.full((n_traces, len(metapath)), -1, np.int64)
    traces[:, 0] = nodes
    cur = nodes.copy()
    for i, cet in enumerate(metapath):
        etid = g.get_etype_id(cet)
        unit = g._units[etid]
        csr = unit.csr()
        indptr = np.asarray(csr.indptr)
        indices = np.asarray(csr.indices)
        eids = np.asarray(csr.eids)
        w = (np.asarray(g._edge_frames[etid][prob]).ravel()
             if prob is not None else None)
        cur, step_eids = _step(indptr, indices, eids, cur, rng, w)
        if restart_prob:
            restart = rng.random(n_traces) < restart_prob
            cur = np.where(restart, -1, cur)
        traces[:, i + 1] = cur
        eids_out[:, i] = step_eids
    out = (jnp.asarray(traces.astype(np.int32)),
           jnp.asarray(np.array(types, np.int32)))
    if return_eids:
        return out + (jnp.asarray(eids_out.astype(np.int32)),)
    return out


def node2vec_random_walk(g: Graph, nodes, p: float, q: float,
                         walk_length: int, prob=None):
    """node2vec biased walk (reference ``sampling/randomwalks.py
    node2vec_random_walk``; C++ ``node2vec_randomwalk.h``): second-order
    walk with return parameter p and in-out parameter q."""
    rng = np_rng()
    nodes = np.asarray(nodes).astype(np.int64)
    unit = g.unit()
    csr = unit.csr()
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    n_traces = len(nodes)
    traces = np.full((n_traces, walk_length + 1), -1, np.int64)
    traces[:, 0] = nodes
    prev = np.full(n_traces, -1, np.int64)
    cur = nodes.copy()
    for step in range(walk_length):
        nxt = np.full(n_traces, -1, np.int64)
        for t in range(n_traces):  # biased per-trace rejection sampling
            c = cur[t]
            if c < 0:
                continue
            lo, hi = indptr[c], indptr[c + 1]
            if hi == lo:
                continue
            nbrs = indices[lo:hi]
            if prev[t] < 0:
                nxt[t] = nbrs[rng.integers(0, len(nbrs))]
                continue
            # rejection sampling (node2vec trick): upper bound weight
            pv = prev[t]
            plo, phi = indptr[pv], indptr[pv + 1]
            pnbrs = set(indices[plo:phi].tolist())
            max_w = max(1.0, 1.0 / p, 1.0 / q)
            while True:
                cand = nbrs[rng.integers(0, len(nbrs))]
                if cand == pv:
                    w = 1.0 / p
                elif cand in pnbrs:
                    w = 1.0
                else:
                    w = 1.0 / q
                if rng.random() * max_w <= w:
                    nxt[t] = cand
                    break
        prev = cur
        cur = nxt
        traces[:, step + 1] = cur
    return jnp.asarray(traces.astype(np.int32))


def pack_traces(traces, types):
    """Compact -1-padded traces (reference ``dgl.sampling.pack_traces``)."""
    traces = np.asarray(traces)
    types = np.asarray(types)
    mask = traces >= 0
    lengths = mask.sum(1)
    concat = traces[mask]
    type_mat = np.broadcast_to(types[None, :], traces.shape)
    concat_types = type_mat[mask]
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return (jnp.asarray(concat.astype(np.int32)),
            jnp.asarray(concat_types.astype(np.int32)),
            jnp.asarray(lengths.astype(np.int32)),
            jnp.asarray(offsets.astype(np.int32)))
