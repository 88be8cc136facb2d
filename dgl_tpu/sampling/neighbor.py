"""Neighbor sampling (reference ``python/dgl/sampling/neighbor.py:222``,
C++ pickers ``src/array/cpu/rowwise_pick.h``, ``rowwise_sampling.cc``).

Host-side vectorized numpy implementation: output sizes are data-dependent,
so sampling runs on host (like the reference's CPU path) and feeds the
device pipeline through padded blocks.  Rows are processed in degree
buckets so the inner ops are dense 2-D numpy kernels, the moral analogue of
the reference's OpenMP ``parallel_for`` pick loops.

Semantics (mirroring the reference exactly):
* ``fanout``: int or {etype: int}; -1 means take all neighbors;
* ``edge_dir``: 'in' samples in-edges of seeds (CSC), 'out' out-edges;
* ``prob``: name of an edge feature with unnormalized probabilities or a
  boolean mask; 0-weight edges are never picked;
* ``replace``: sample with replacement (rows with deg < fanout return deg
  edges when ``replace=False``);
* ``exclude_edges``: edge ids to remove before sampling (leakage removal);
* output: edge-induced subgraph with the same node set, original edge ids
  in ``edata[EID]``.
"""
from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, EID
from ..graph.unitgraph import UnitGraph
from ..utils import np_rng


def _rows_pick(indptr: np.ndarray, eids: np.ndarray, seeds: np.ndarray,
               fanout: int, replace: bool, rng: np.random.Generator,
               weights: Optional[np.ndarray] = None) -> np.ndarray:
    """Pick edge positions (into the sorted-edge arrays) for each seed row.

    Returns a flat array of positions.  Degree-bucketed vectorization: rows
    with equal degree are sampled together with one dense 2-D operation.
    """
    deg = indptr[seeds + 1] - indptr[seeds]
    if fanout > 0 and weights is None:
        from .. import csrc
        if csrc.AVAILABLE:
            pos = csrc.rowwise_sample_uniform(
                indptr.astype(np.int64), seeds.astype(np.int64),
                int(fanout), bool(replace), int(rng.integers(1 << 62)))
            if pos is not None:
                return pos
    if fanout == -1:
        # take all
        segs = [np.arange(indptr[s], indptr[s + 1]) for s in seeds]
        out = (np.concatenate(segs) if segs else np.zeros(0, np.int64))
        if weights is not None:
            out = out[weights[eids[out]] > 0]
        return out

    picks = []
    # rows where we take everything
    if not replace:
        full = deg <= fanout
        full_seeds = seeds[full]
        if len(full_seeds):
            segs = [np.arange(indptr[s], indptr[s + 1]) for s in full_seeds]
            pos = np.concatenate(segs) if segs else np.zeros(0, np.int64)
            if weights is not None:
                pos = pos[weights[eids[pos]] > 0]
            picks.append(pos)
        rest = seeds[~full]
        rest_deg = deg[~full]
    else:
        rest = seeds[deg > 0]
        rest_deg = deg[deg > 0]

    if len(rest):
        order = np.argsort(rest_deg, kind="stable")
        rest = rest[order]
        rest_deg = rest_deg[order]
        # group by degree
        boundaries = np.nonzero(np.diff(rest_deg))[0] + 1
        groups = np.split(np.arange(len(rest)), boundaries)
        for grp in groups:
            if len(grp) == 0:
                continue
            d = int(rest_deg[grp[0]])
            rows = rest[grp]
            starts = indptr[rows]
            if replace:
                if weights is None:
                    offs = rng.integers(0, d, (len(rows), fanout))
                else:
                    w = weights[eids[starts[:, None] + np.arange(d)]]
                    w = w / np.maximum(w.sum(1, keepdims=True), 1e-30)
                    cdf = np.cumsum(w, axis=1)
                    u = rng.random((len(rows), fanout))
                    offs = np.minimum(
                        (u[:, :, None] > cdf[:, None, :]).sum(-1), d - 1)
            else:
                if weights is None:
                    keys = rng.random((len(rows), d))
                else:
                    w = weights[eids[starts[:, None] + np.arange(d)]]
                    # Efraimidis-Spirakis: key = u^(1/w); w=0 -> never
                    u = rng.random((len(rows), d))
                    with np.errstate(divide="ignore"):
                        keys = np.where(w > 0, u ** (1.0 / np.maximum(
                            w, 1e-30)), -1.0)
                k = min(fanout, d)
                offs = np.argpartition(-keys, kth=k - 1, axis=1)[:, :k]
                if weights is not None:
                    sel_w = np.take_along_axis(
                        weights[eids[starts[:, None] + np.arange(d)]],
                        offs, axis=1)
                    pos = (starts[:, None] + offs)[sel_w > 0]
                    picks.append(pos.ravel())
                    continue
            pos = starts[:, None] + offs
            picks.append(pos.ravel())
    if picks:
        return np.concatenate(picks)
    return np.zeros(0, np.int64)


def sample_neighbors(g: Graph, nodes, fanout, edge_dir: str = "in",
                     prob: Optional[str] = None, replace: bool = False,
                     copy_ndata: bool = True, copy_edata: bool = True,
                     exclude_edges=None, output_device=None) -> Graph:
    """Reference ``dgl.sampling.sample_neighbors``."""
    rng = np_rng()
    if not isinstance(nodes, dict):
        if len(g.ntypes) > 1:
            raise ValueError("node dict required for heterographs")
        nodes = {g.ntypes[0]: nodes}
    nodes = {nt: np.asarray(v).astype(np.int64) for nt, v in nodes.items()}

    if exclude_edges is not None and not isinstance(exclude_edges, dict):
        exclude_edges = {g.canonical_etypes[0]: exclude_edges}

    edge_sel: Dict[tuple, np.ndarray] = {}
    for etid, cet in enumerate(g.canonical_etypes):
        st, et, dt = cet
        unit = g._units[etid]
        if isinstance(fanout, dict):
            k = fanout.get(et, fanout.get(cet, 0))
        else:
            k = fanout
        seed_type = dt if edge_dir == "in" else st
        seeds = nodes.get(seed_type, np.zeros(0, np.int64))
        if len(seeds) == 0 or k == 0:
            edge_sel[cet] = np.zeros(0, np.int64)
            continue
        sp = unit.csc() if edge_dir == "in" else unit.csr()
        indptr = np.asarray(sp.indptr)
        eids = np.asarray(sp.eids)
        weights = None
        if prob is not None:
            weights = np.asarray(g._edge_frames[etid][prob]).astype(
                np.float64).ravel()
        if exclude_edges is not None and cet in exclude_edges:
            excl = np.asarray(exclude_edges[cet])
            w = (np.ones(unit.num_edges) if weights is None
                 else weights.copy())
            w[excl] = 0.0
            weights = w
        pos = _rows_pick(indptr, eids, seeds, int(k), replace, rng, weights)
        edge_sel[cet] = eids[pos]

    from ..graph.subgraph import edge_subgraph
    sub = edge_subgraph(g, edge_sel, relabel_nodes=False, store_ids=True)
    if not copy_edata:
        for f in sub._edge_frames:
            keep_eid = f.get(EID)
            f.clear()
            if keep_eid is not None:
                f[EID] = keep_eid
    return sub


def sample_neighbors_biased(g, nodes, fanout, bias, edge_dir="in",
                            tag_offset_name="_TAG_OFFSET", replace=False,
                            tag=None):
    """Tag-biased sampling (reference ``sampling/neighbor.py:690``,
    C++ tag-sorted pickers): each neighbor's pick probability is
    proportional to ``bias[tag_of_neighbor]``.

    ``tag``: per-node int tags (defaults to ``g.ndata['_TAG']``).  The
    reference requires a tag-sorted graph (``sort_csr_by_tag``) for its
    O(tags) picker; this build expresses the same semantics through the
    weighted picker with per-edge weights ``bias[tag[neighbor]]``."""
    if tag is None:
        if "_TAG" not in g.ndata:
            raise ValueError("pass tag= or store g.ndata['_TAG']")
        tag = g.ndata["_TAG"]
    tag = np.asarray(tag).ravel()
    bias = np.asarray(bias).ravel()
    row, col = (np.asarray(a) for a in g.unit().coo())
    nbr = row if edge_dir == "in" else col
    g.edata["_bias_w"] = bias[tag[nbr]].astype(np.float32)
    try:
        return sample_neighbors(g, nodes, fanout, edge_dir=edge_dir,
                                prob="_bias_w", replace=replace)
    finally:
        del g.edata["_bias_w"]


def select_topk(g: Graph, k, weight: str, nodes=None, edge_dir="in",
                ascending=False) -> Graph:
    """Per-node top-k edges by weight (reference ``dgl.sampling.select_topk``,
    C++ top-k picker)."""
    if not isinstance(nodes, dict) and nodes is not None:
        nodes = {g.ntypes[0]: nodes}
    edge_sel = {}
    for etid, cet in enumerate(g.canonical_etypes):
        st, et, dt = cet
        unit = g._units[etid]
        seed_type = dt if edge_dir == "in" else st
        if nodes is None:
            seeds = np.arange(
                g.num_nodes(seed_type)).astype(np.int64)
        else:
            seeds = np.asarray(nodes.get(seed_type, []), np.int64)
        sp = unit.csc() if edge_dir == "in" else unit.csr()
        indptr = np.asarray(sp.indptr)
        eids = np.asarray(sp.eids)
        w = np.asarray(g._edge_frames[etid][weight]).ravel()
        picks = []
        kk = k.get(et, 0) if isinstance(k, dict) else k
        for s in seeds:
            lo, hi = indptr[s], indptr[s + 1]
            if hi - lo == 0:
                continue
            ww = w[eids[lo:hi]]
            take = min(kk, hi - lo)
            idx = (np.argsort(ww)[:take] if ascending
                   else np.argsort(-ww)[:take])
            picks.append(eids[lo + idx])
        edge_sel[cet] = (np.concatenate(picks) if picks
                         else np.zeros(0, np.int64))
    from ..graph.subgraph import edge_subgraph
    return edge_subgraph(g, edge_sel, relabel_nodes=False, store_ids=True)


def sample_etype_neighbors(g: Graph, nodes, etype_offset, fanout,
                           edge_dir: str = "in", prob=None,
                           exclude_edges=None, replace: bool = False,
                           copy_ndata: bool = True, copy_edata: bool = True,
                           etype_sorted: bool = False,
                           _dist_training: bool = False,
                           output_device=None) -> Graph:
    """Per-edge-type fanout sampling on a HOMOGENEOUS graph whose edges
    are tagged/sorted by type (reference ``sampling/neighbor.py:69``):
    ``etype_offset[i]`` is the first edge id of type ``i`` (edges must be
    type-sorted, e.g. via ``sort_csr_by_tag``), ``fanout`` a vector with
    one entry per type (-1 = all)."""
    if len(g.canonical_etypes) != 1:
        raise ValueError("sample_etype_neighbors expects a homogeneous "
                         "graph with type-sorted edges")
    etype_offset = np.asarray(etype_offset, np.int64)
    fanout = np.asarray(fanout, np.int64).reshape(-1)
    n_types = len(fanout)
    rng = np_rng()
    nodes_arr = np.asarray(nodes).astype(np.int64).reshape(-1)
    unit = g.unit()
    sp = unit.csc() if edge_dir == "in" else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    eids = np.asarray(sp.eids)
    excl = (np.asarray(exclude_edges) if exclude_edges is not None
            else None)
    pw = (np.asarray(g.edata[prob]).reshape(-1)
          if isinstance(prob, str) else None)
    picked = []
    for s in nodes_arr:
        lo, hi = indptr[s], indptr[s + 1]
        e = eids[lo:hi]
        if excl is not None:
            keep = ~np.isin(e, excl)
            e = e[keep]
        # edge type of each incident edge from the offsets
        et = np.searchsorted(etype_offset, e, side="right") - 1
        for t in range(n_types):
            cand = e[et == t]
            if len(cand) == 0:
                continue
            k = int(fanout[t])
            if k < 0 or (not replace and k >= len(cand)):
                picked.append(cand)
                continue
            p = None
            if pw is not None:
                w = pw[cand].astype(np.float64)
                p = w / w.sum() if w.sum() > 0 else None
            picked.append(rng.choice(cand, size=k, replace=replace, p=p))
    sel = (np.unique(np.concatenate(picked)) if picked
           else np.zeros(0, np.int64))
    from ..graph.subgraph import edge_subgraph
    sub = edge_subgraph(g, {g.canonical_etypes[0]: sel},
                        relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        for fr in sub._node_frames:
            fr.clear()
    return sub


def sample_neighbors_fused(g: Graph, nodes, fanout, edge_dir: str = "in",
                           prob=None, replace: bool = False,
                           copy_ndata: bool = True, copy_edata: bool = True,
                           exclude_edges=None, mapping=None) -> Graph:
    """Fused sampling variant (reference ``sampling/neighbor.py:399``):
    same semantics as :func:`sample_neighbors` plus an id-mapping cache
    dict reused across layers to skip re-compaction.  The TPU pipeline
    compacts in ``to_block`` with the native hashmap, so this delegates
    with the cache threaded through for API parity."""
    if mapping is not None and "_cache" not in mapping:
        mapping["_cache"] = {}
    return sample_neighbors(g, nodes, fanout, edge_dir=edge_dir,
                            prob=prob, replace=replace,
                            copy_ndata=copy_ndata, copy_edata=copy_edata,
                            exclude_edges=exclude_edges)
