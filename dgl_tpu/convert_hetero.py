"""Hetero <-> homo conversion (reference ``python/dgl/convert.py
to_homogeneous:...`` / ``to_heterogeneous``)."""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .graph.graph import Graph, NID, EID, NTYPE, ETYPE
from .graph.unitgraph import UnitGraph
from .utils.arrays import take_rows, concat


def to_homogeneous(g: Graph, ndata: Optional[List[str]] = None,
                   edata: Optional[List[str]] = None,
                   store_type: bool = True,
                   return_count: bool = False):
    """Flatten a heterograph into one graph with type markers.

    Node ids are assigned per-ntype contiguously (ntype order); stores
    ``ndata[NTYPE]``/``ndata[NID]`` and ``edata[ETYPE]``/``edata[EID]``.
    """
    offsets = {}
    off = 0
    for nt in g.ntypes:
        offsets[nt] = off
        off += g.num_nodes(nt)
    total_nodes = off

    rows, cols, etype_ids, eids = [], [], [], []
    for etid, cet in enumerate(g.canonical_etypes):
        st, _, dt = cet
        row, col = (np.asarray(a) for a in g._units[etid].coo())
        rows.append(row + offsets[st])
        cols.append(col + offsets[dt])
        etype_ids.append(np.full(len(row), etid, np.int32))
        eids.append(np.arange(len(row), dtype=np.int32))
    row = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    col = np.concatenate(cols) if cols else np.zeros(0, np.int64)

    out = Graph(["_N"], [("_N", "_E", "_N")], [total_nodes],
                [UnitGraph.from_coo(total_nodes, total_nodes, row, col)])
    if store_type:
        ntype_arr = np.concatenate(
            [np.full(g.num_nodes(nt), i, np.int32)
             for i, nt in enumerate(g.ntypes)]) if g.ntypes else \
            np.zeros(0, np.int32)
        out.ndata[NTYPE] = ntype_arr
        out.ndata[NID] = np.concatenate(
            [np.arange(g.num_nodes(nt), dtype=np.int32)
             for nt in g.ntypes])
        out.edata[ETYPE] = np.concatenate(etype_ids) if etype_ids else \
            np.zeros(0, np.int32)
        out.edata[EID] = np.concatenate(eids) if eids else \
            np.zeros(0, np.int32)
    # merge features present on all ntypes (reference requires same-named
    # features to exist everywhere to be carried)
    if ndata is None:
        common = None
        for i, nt in enumerate(g.ntypes):
            keys = set(g._node_frames[i].keys())
            common = keys if common is None else (common & keys)
        ndata = sorted(common or [])
    for k in ndata:
        out.ndata[k] = concat([g._node_frames[i][k]
                               for i in range(len(g.ntypes))])
    if edata is None:
        common = None
        for i in range(len(g.canonical_etypes)):
            keys = set(g._edge_frames[i].keys())
            common = keys if common is None else (common & keys)
        edata = sorted(common or [])
    for k in edata:
        out.edata[k] = concat([g._edge_frames[i][k]
                               for i in range(len(g.canonical_etypes))])
    if return_count:
        return out, [g.num_nodes(nt) for nt in g.ntypes], \
            [u.num_edges for u in g._units]
    return out


def to_heterogeneous(g: Graph, ntypes: List[str], etypes: List[str],
                     ntype_field: str = NTYPE, etype_field: str = ETYPE,
                     metagraph=None) -> Graph:
    """Inverse of :func:`to_homogeneous` using stored type markers."""
    ntype_arr = np.asarray(g.ndata[ntype_field])
    etype_arr = np.asarray(g.edata[etype_field])
    row, col = (np.asarray(a) for a in g.unit().coo())

    num_nodes = {nt: int((ntype_arr == i).sum())
                 for i, nt in enumerate(ntypes)}
    # local ids within type
    local_id = np.zeros(g.num_nodes(), np.int64)
    for i in range(len(ntypes)):
        mask = ntype_arr == i
        local_id[mask] = np.arange(mask.sum())

    data_dict = {}
    edge_sel = {}
    for j, et in enumerate(etypes):
        mask = etype_arr == j
        if not mask.any():
            continue
        srcs = row[mask]
        dsts = col[mask]
        st = ntypes[int(ntype_arr[srcs[0]])]
        dt = ntypes[int(ntype_arr[dsts[0]])]
        cet = (st, et, dt)
        data_dict[cet] = (local_id[srcs], local_id[dsts])
        edge_sel[cet] = np.nonzero(mask)[0]

    from .graph.convert import heterograph as make_hetero
    out = make_hetero(data_dict, num_nodes_dict=num_nodes)
    # carry features back, sliced per type
    for i, nt in enumerate(ntypes):
        mask = ntype_arr == i
        idx = np.nonzero(mask)[0]
        for k, v in g._node_frames[0].items():
            if k in (ntype_field, NID):
                continue
            out.nodes[nt].data[k] = take_rows(v, idx)
    for cet, sel in edge_sel.items():
        for k, v in g._edge_frames[0].items():
            if k in (etype_field, EID):
                continue
            out.edges[cet].data[k] = take_rows(v, sel)
    return out
