"""Graph merging (reference ``python/dgl/merge.py dgl.merge``): union of
several graphs over a shared node set."""
from __future__ import annotations

import numpy as np

from .graph.graph import Graph
from .graph.convert import graph as make_graph, heterograph as make_hetero


def merge(graphs):
    """Union the edges of ``graphs`` (same node/edge types; node counts
    = max over inputs).  Node features come from the first graph that
    defines them; edge features concatenate in input order."""
    if not graphs:
        raise ValueError("merge: empty list")
    g0 = graphs[0]
    if g0.is_homogeneous:
        n = max(g.num_nodes() for g in graphs)
        rows, cols = [], []
        for g in graphs:
            r, c = (np.asarray(a) for a in g.unit().coo())
            rows.append(r)
            cols.append(c)
        out = make_graph((np.concatenate(rows), np.concatenate(cols)),
                         num_nodes=n)
        for g in graphs:
            for kname, v in g._node_frames[0].items():
                if kname not in out.ndata:
                    v = np.asarray(v)
                    if v.shape[0] == n:
                        out.ndata[kname] = v
        efeat_names = set(g0._edge_frames[0].keys())
        for g in graphs[1:]:
            efeat_names &= set(g._edge_frames[0].keys())
        for kname in efeat_names:
            out.edata[kname] = np.concatenate(
                [np.asarray(g._edge_frames[0][kname]) for g in graphs])
        return out
    # hetero: per-relation union
    data = {}
    num_nodes = {nt: max(g.num_nodes(nt) for g in graphs)
                 for nt in g0.ntypes}
    for cet in g0.canonical_etypes:
        rows, cols = [], []
        for g in graphs:
            r, c = (np.asarray(a) for a in g.unit(cet).coo())
            rows.append(r)
            cols.append(c)
        data[cet] = (np.concatenate(rows), np.concatenate(cols))
    return make_hetero(data, num_nodes_dict=num_nodes)
