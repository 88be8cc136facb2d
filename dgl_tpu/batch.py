"""Batching many graphs into one disjoint union (reference
``python/dgl/batch.py:13``) and the inverse ``unbatch``.

Batched graphs carry per-component node/edge counts so readout ops can
segment-reduce per component — the TPU-friendly formulation of "graph-level"
pooling.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .graph.graph import Graph, NID, EID
from .graph.unitgraph import UnitGraph


def batch(graphs: Sequence[Graph]) -> Graph:
    """Disjoint union preserving per-graph counts (reference ``dgl.batch``)."""
    g0 = graphs[0]
    ntypes = list(g0.ntypes)
    cetypes = list(g0.canonical_etypes)
    for g in graphs[1:]:
        if list(g.ntypes) != ntypes or list(g.canonical_etypes) != cetypes:
            raise ValueError("all graphs must share the same schema")

    num_nodes = []
    node_frames = []
    batch_nn = {}
    for i, nt in enumerate(ntypes):
        counts = np.array([g.num_nodes(nt) for g in graphs], np.int32)
        batch_nn[nt] = jnp.asarray(counts)
        num_nodes.append(int(counts.sum()))
        keys = set()
        for g in graphs:
            keys.update(g._node_frames[i].keys())
        frame = {}
        for k in keys:
            arrs = []
            for g in graphs:
                if k not in g._node_frames[i]:
                    raise KeyError(
                        f"feature {k!r} missing on some graphs of type {nt}")
                arrs.append(g._node_frames[i][k])
            frame[k] = jnp.concatenate(arrs, axis=0)
        node_frames.append(frame)

    units = []
    edge_frames = []
    batch_ne = {}
    for j, cet in enumerate(cetypes):
        st, _, dt = cet
        sti = ntypes.index(st)
        dti = ntypes.index(dt)
        src_off = np.cumsum(
            [0] + [g.num_nodes(st) for g in graphs[:-1]]).astype(np.int64)
        dst_off = np.cumsum(
            [0] + [g.num_nodes(dt) for g in graphs[:-1]]).astype(np.int64)
        rows, cols = [], []
        for gi, g in enumerate(graphs):
            r, c = g._units[j].coo()
            rows.append(jnp.asarray(r) + int(src_off[gi]))
            cols.append(jnp.asarray(c) + int(dst_off[gi]))
        row = jnp.concatenate(rows) if rows else jnp.zeros(0, jnp.int32)
        col = jnp.concatenate(cols) if cols else jnp.zeros(0, jnp.int32)
        units.append(UnitGraph.from_coo(num_nodes[sti], num_nodes[dti],
                                        row, col))
        counts = np.array([g._units[j].num_edges for g in graphs], np.int32)
        batch_ne[cet] = jnp.asarray(counts)
        keys = set()
        for g in graphs:
            keys.update(g._edge_frames[j].keys())
        frame = {}
        for k in keys:
            frame[k] = jnp.concatenate(
                [g._edge_frames[j][k] for g in graphs], axis=0)
        edge_frames.append(frame)

    out = Graph(ntypes, cetypes, num_nodes, units, node_frames=node_frames,
                edge_frames=edge_frames)
    out.set_batch_info(batch_nn, batch_ne)
    return out


def unbatch(g: Graph) -> List[Graph]:
    """Split a batched graph back into components (reference
    ``dgl.unbatch``)."""
    if g._batch_info is None:
        return [g]
    bnn = {nt: np.asarray(v) for nt, v in g._batch_info["num_nodes"].items()}
    bne = {ct: np.asarray(v) for ct, v in g._batch_info["num_edges"].items()}
    bs = len(next(iter(bnn.values())))
    node_offs = {nt: np.concatenate([[0], np.cumsum(v)]) for nt, v in
                 bnn.items()}
    edge_offs = {ct: np.concatenate([[0], np.cumsum(v)]) for ct, v in
                 bne.items()}

    out = []
    for i in range(bs):
        num_nodes = [int(bnn[nt][i]) for nt in g.ntypes]
        units = []
        for j, cet in enumerate(g.canonical_etypes):
            st, _, dt = cet
            s, e = edge_offs[cet][i], edge_offs[cet][i + 1]
            row, col = g._units[j].coo()
            r = row[int(s):int(e)] - int(node_offs[st][i])
            c = col[int(s):int(e)] - int(node_offs[dt][i])
            units.append(UnitGraph.from_coo(
                int(bnn[st][i]), int(bnn[dt][i]), r, c))
        node_frames = []
        for k_nt, nt in enumerate(g.ntypes):
            s, e = int(node_offs[nt][i]), int(node_offs[nt][i + 1])
            node_frames.append(
                {k: v[s:e] for k, v in g._node_frames[k_nt].items()})
        edge_frames = []
        for j, cet in enumerate(g.canonical_etypes):
            s, e = int(edge_offs[cet][i]), int(edge_offs[cet][i + 1])
            edge_frames.append(
                {k: v[s:e] for k, v in g._edge_frames[j].items()})
        out.append(Graph(g.ntypes, g.canonical_etypes, num_nodes, units,
                         node_frames=node_frames, edge_frames=edge_frames))
    return out


def slice_batch(g: Graph, gid: int, store_ids: bool = False) -> Graph:
    """Extract component ``gid`` from a batched graph (reference
    ``batch.py:446``) without unbatching everything."""
    if g._batch_info is None:
        if gid != 0:
            raise ValueError("graph is not batched")
        return g
    bnn = {nt: np.asarray(v) for nt, v in
           g._batch_info["num_nodes"].items()}
    bne = {ct: np.asarray(v) for ct, v in
           g._batch_info["num_edges"].items()}
    node_offs = {nt: int(v[:gid].sum()) for nt, v in bnn.items()}
    edge_offs = {ct: int(v[:gid].sum()) for ct, v in bne.items()}
    num_nodes = [int(bnn[nt][gid]) for nt in g.ntypes]
    units, edge_frames = [], []
    for j, cet in enumerate(g.canonical_etypes):
        st, _, dt = cet
        s = edge_offs[cet]
        e = s + int(bne[cet][gid])
        row, col = g._units[j].coo()
        units.append(UnitGraph.from_coo(
            int(bnn[st][gid]), int(bnn[dt][gid]),
            row[s:e] - node_offs[st], col[s:e] - node_offs[dt]))
        fr = {k: v[s:e] for k, v in g._edge_frames[j].items()}
        if store_ids:
            fr[EID] = jnp.arange(s, e, dtype=jnp.int32)
        edge_frames.append(fr)
    node_frames = []
    for k_nt, nt in enumerate(g.ntypes):
        s = node_offs[nt]
        e = s + int(bnn[nt][gid])
        fr = {k: v[s:e] for k, v in g._node_frames[k_nt].items()}
        if store_ids:
            fr[NID] = jnp.arange(s, e, dtype=jnp.int32)
        node_frames.append(fr)
    return Graph(g.ntypes, g.canonical_etypes, num_nodes, units,
                 node_frames=node_frames, edge_frames=edge_frames)
