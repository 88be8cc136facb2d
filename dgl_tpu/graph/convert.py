"""Graph construction (reference ``python/dgl/convert.py``) and block
creation (reference ``src/graph/transform/to_block.cc:125``,
``python/dgl/transforms/to_block.py:28``)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .graph import (
    DEFAULT_ETYPE,
    DEFAULT_NTYPE,
    EID,
    NID,
    CanonicalEtype,
    Graph,
)
from .unitgraph import UnitGraph, _as_idarray
from ..utils.arrays import take_rows


def _infer_num_nodes(row, col) -> int:
    n = 0
    for a in (row, col):
        if a.shape[0] > 0:
            n = max(n, int(np.asarray(a).max()) + 1)
    return n


def graph(data, num_nodes: Optional[int] = None, idtype=None,
          formats=("coo", "csr", "csc")) -> Graph:
    """Create a homogeneous graph from ``(u, v)`` (reference ``dgl.graph``,
    ``python/dgl/convert.py``)."""
    u, v = data
    u = _as_idarray(np.asarray(u))
    v = _as_idarray(np.asarray(v))
    if num_nodes is None:
        num_nodes = _infer_num_nodes(u, v)
    unit = UnitGraph.from_coo(num_nodes, num_nodes, u, v, formats=formats)
    return Graph([DEFAULT_NTYPE],
                 [(DEFAULT_NTYPE, DEFAULT_ETYPE, DEFAULT_NTYPE)],
                 [num_nodes], [unit])


def heterograph(data_dict: Dict[CanonicalEtype, Tuple],
                num_nodes_dict: Optional[Dict[str, int]] = None,
                idtype=None) -> Graph:
    """Create a heterograph (reference ``dgl.heterograph``)."""
    cetypes = [tuple(k) for k in data_dict.keys()]
    # collect ntypes in deterministic (first-appearance) order
    ntypes = []
    for st, _, dt in cetypes:
        for t in (st, dt):
            if t not in ntypes:
                ntypes.append(t)
    edges = {}
    inferred = {nt: 0 for nt in ntypes}
    for (st, et, dt), (u, v) in data_dict.items():
        u = _as_idarray(np.asarray(u))
        v = _as_idarray(np.asarray(v))
        edges[(st, et, dt)] = (u, v)
        if u.shape[0] > 0:
            inferred[st] = max(inferred[st], int(np.asarray(u).max()) + 1)
            inferred[dt] = max(inferred[dt], int(np.asarray(v).max()) + 1)
    if num_nodes_dict is not None:
        for nt, n in num_nodes_dict.items():
            if nt not in inferred:
                ntypes.append(nt)
            inferred[nt] = int(n)
    num_nodes = [inferred[nt] for nt in ntypes]
    nid = {nt: i for i, nt in enumerate(ntypes)}
    units = [
        UnitGraph.from_coo(num_nodes[nid[st]], num_nodes[nid[dt]], u, v)
        for (st, et, dt), (u, v) in edges.items()
    ]
    return Graph(ntypes, cetypes, num_nodes, units)


def create_block(data_dict, num_src_nodes=None, num_dst_nodes=None,
                 node_frames=None, edge_frames=None) -> Graph:
    """Create a block (MFG) directly (reference ``dgl.create_block``)."""
    if not isinstance(data_dict, dict):
        u, v = data_dict
        data_dict = {(DEFAULT_NTYPE, DEFAULT_ETYPE, DEFAULT_NTYPE): (u, v)}
    if not isinstance(num_src_nodes, dict):
        st = {k[0] for k in data_dict}
        num_src_nodes = {next(iter(st)): num_src_nodes}
    if not isinstance(num_dst_nodes, dict):
        dt = {k[2] for k in data_dict}
        num_dst_nodes = {next(iter(dt)): num_dst_nodes}

    srctypes = sorted(num_src_nodes.keys())
    dsttypes = sorted(num_dst_nodes.keys())
    cetypes = [tuple(k) for k in data_dict.keys()]
    units = []
    for (st, et, dt), (u, v) in data_dict.items():
        u = _as_idarray(np.asarray(u))
        v = _as_idarray(np.asarray(v))
        units.append(UnitGraph.from_coo(int(num_src_nodes[st]),
                                        int(num_dst_nodes[dt]), u, v))
    ntypes = list(srctypes) + list(dsttypes)
    num_nodes = ([int(num_src_nodes[t]) for t in srctypes]
                 + [int(num_dst_nodes[t]) for t in dsttypes])
    return Graph(ntypes, cetypes, num_nodes, units,
                 node_frames=node_frames, edge_frames=edge_frames,
                 is_block=True, block_split=len(srctypes))


def to_block(g: Graph, dst_nodes=None, include_dst_in_src: bool = True,
             src_nodes=None) -> Graph:
    """Convert a frontier graph into a block / message-flow graph.

    Contract (reference ``src/graph/transform/to_block.cc:125-314``,
    ``python/dgl/transforms/to_block.py:28``): dst nodes = exactly the given
    seeds; src nodes = seeds (prefixed, when ``include_dst_in_src``) + every
    node with >=1 edge into a seed, in first-visit order; original ids in
    ``srcdata[NID]``, ``dstdata[NID]``, ``edata[EID]``.

    Host-level (eager) — output sizes are data-dependent.  The dataloading
    pipeline pads blocks to bucketed sizes afterwards (see
    ``dgl_tpu.dataloading.pad``).
    """
    if dst_nodes is None:
        dst_nodes = {
            nt: np.arange(g.num_nodes(nt), dtype=np.int64)
            for nt in g.ntypes
        }
    elif not isinstance(dst_nodes, dict):
        if len(g.ntypes) != 1:
            raise ValueError("dst_nodes dict required for heterographs")
        dst_nodes = {g.ntypes[0]: np.asarray(dst_nodes, dtype=np.int64)}
    dst_nodes = {nt: np.asarray(v, dtype=np.int64)
                 for nt, v in dst_nodes.items()}

    # Build per-ntype src id mapping: seeds first, then newly-seen sources.
    src_ids: Dict[str, np.ndarray] = {}
    src_pos: Dict[str, np.ndarray] = {}  # old id -> new local id (or -1)
    for nt in g.ntypes:
        seeds = dst_nodes.get(nt, np.zeros(0, np.int64))
        pos = np.full(g.num_nodes(nt), -1, np.int64)
        if include_dst_in_src:
            pos[seeds] = np.arange(len(seeds))
            src_ids[nt] = seeds.copy()
        else:
            src_ids[nt] = np.zeros(0, np.int64)
        src_pos[nt] = pos

    per_etype = {}
    for cet, unit in zip(g.canonical_etypes, g._units):
        st, _, dt = cet
        row, col = (np.asarray(x) for x in unit.coo())
        seeds = dst_nodes.get(dt, np.zeros(0, np.int64))
        dmap = np.full(g.num_nodes(dt), -1, np.int64)
        dmap[seeds] = np.arange(len(seeds))
        keep = np.nonzero(dmap[col] >= 0)[0]
        srcs = row[keep]
        # assign new ids to unseen srcs in first-visit order
        pos = src_pos[st]
        from .. import csrc
        if csrc.AVAILABLE and len(src_ids[st]) == len(
                dst_nodes.get(st, ())) and include_dst_in_src and \
                len(g.canonical_etypes) == 1:
            # single-relation fast path: native hashmap compaction
            src_local, uniq = csrc.compact_ids(
                src_ids[st].astype(np.int64), srcs.astype(np.int64),
                g.num_nodes(st))
            src_ids[st] = uniq
            pos[uniq] = np.arange(len(uniq))
            per_etype[cet] = (src_local, dmap[col[keep]], keep)
            continue
        unseen_mask = pos[srcs] < 0
        if unseen_mask.any():
            # first occurrence of each unseen src
            unseen = srcs[unseen_mask]
            uniq, first_idx = np.unique(unseen, return_index=True)
            order = np.argsort(first_idx)
            new_srcs = uniq[order]
            start = len(src_ids[st])
            pos[new_srcs] = np.arange(start, start + len(new_srcs))
            src_ids[st] = np.concatenate([src_ids[st], new_srcs])
        per_etype[cet] = (pos[srcs], dmap[col[keep]], keep)

    srctypes = list(g.ntypes)
    dsttypes = list(g.ntypes)
    units = []
    cetypes = list(g.canonical_etypes)
    for cet in cetypes:
        st, _, dt = cet
        new_row, new_col, _ = per_etype[cet]
        units.append(UnitGraph.from_coo(
            len(src_ids[st]), len(dst_nodes.get(dt, np.zeros(0, np.int64))),
            new_row, new_col))

    ntypes = srctypes + dsttypes
    num_nodes = ([len(src_ids[nt]) for nt in srctypes]
                 + [len(dst_nodes.get(nt, np.zeros(0, np.int64)))
                    for nt in dsttypes])

    node_frames = []
    for nt in srctypes:
        ids = src_ids[nt]
        fidx = g.get_ntype_id(nt)
        frame = {k: take_rows(v, ids)
                 for k, v in g._node_frames[fidx].items()}
        frame[NID] = ids.astype(np.int32)
        node_frames.append(frame)
    for nt in dsttypes:
        ids = dst_nodes.get(nt, np.zeros(0, np.int64))
        fidx = g.get_ntype_id(nt)
        frame = {k: take_rows(v, ids)
                 for k, v in g._node_frames[fidx].items()}
        frame[NID] = ids.astype(np.int32)
        node_frames.append(frame)

    edge_frames = []
    for i, cet in enumerate(cetypes):
        keep = per_etype[cet][2]
        frame = {k: take_rows(v, keep)
                 for k, v in g._edge_frames[i].items()}
        # blocks keep the *parent graph's* edge ids; if the frontier itself
        # stores EID (e.g. it is a sampled subgraph), chain through it.
        if EID in g._edge_frames[i]:
            frame[EID] = take_rows(g._edge_frames[i][EID], keep)
        else:
            frame[EID] = keep.astype(np.int32)
        edge_frames.append(frame)

    return Graph(ntypes, cetypes, num_nodes, units,
                 node_frames=node_frames, edge_frames=edge_frames,
                 is_block=True, block_split=len(srctypes))


def block_to_graph(block: Graph) -> Graph:
    """Flatten a block into a plain bipartite graph (reference
    ``dgl.block_to_graph``): src/dst types get ``_src``/``_dst`` suffixes."""
    if not block.is_block:
        return block
    split = block._block_split
    ntypes = ([nt + "_src" for nt in block.ntypes[:split]]
              + [nt + "_dst" for nt in block.ntypes[split:]])
    cetypes = [(st + "_src", et, dt + "_dst")
               for st, et, dt in block.canonical_etypes]
    return Graph(ntypes, cetypes, block._num_nodes, block._units,
                 node_frames=block._node_frames,
                 edge_frames=block._edge_frames)


def from_scipy(sp_mat, eweight_name=None, idtype=None) -> Graph:
    """Build from a scipy sparse matrix (reference ``convert.py
    from_scipy``): entry (i, j) becomes edge i -> j."""
    coo = sp_mat.tocoo()
    g = graph((coo.row.astype(np.int64), coo.col.astype(np.int64)),
              num_nodes=coo.shape[0])
    if eweight_name is not None:
        g.edata[eweight_name] = coo.data
    return g


def to_scipy(g: Graph, fmt: str = "coo", eweight_name=None):
    """Export the adjacency as scipy sparse (coo/csr/csc)."""
    import scipy.sparse as sp
    row, col = (np.asarray(a) for a in g.unit().coo())
    data = (np.asarray(g.edata[eweight_name]).ravel()
            if eweight_name else np.ones(len(row)))
    m = sp.coo_matrix((data, (row, col)),
                      shape=(g.num_nodes(), g.num_nodes()))
    return getattr(m, "to" + fmt)()


def from_networkx(nx_graph, node_attrs=None, edge_attrs=None,
                  idtype=None) -> Graph:
    """Build from networkx (reference ``convert.py from_networkx``):
    nodes are relabeled 0..N-1 in iteration order; undirected graphs get
    both edge directions."""
    import networkx as nx
    nodes = list(nx_graph.nodes())
    relabel = {n: i for i, n in enumerate(nodes)}
    src, dst = [], []
    for u, v in nx_graph.edges():
        src.append(relabel[u])
        dst.append(relabel[v])
        if not nx_graph.is_directed():
            src.append(relabel[v])
            dst.append(relabel[u])
    g = graph((np.asarray(src, np.int64), np.asarray(dst, np.int64)),
              num_nodes=len(nodes))
    for attr in (node_attrs or []):
        vals = [nx_graph.nodes[n][attr] for n in nodes]
        g.ndata[attr] = np.asarray(vals)
    if edge_attrs:
        evals = {a: [] for a in edge_attrs}
        for u, v, d in nx_graph.edges(data=True):
            for a in edge_attrs:
                evals[a].append(d[a])
                if not nx_graph.is_directed():
                    evals[a].append(d[a])
        for a in edge_attrs:
            g.edata[a] = np.asarray(evals[a])
    return g


def to_networkx(g: Graph, node_attrs=None, edge_attrs=None):
    """Export to a networkx DiGraph (reference ``convert.py
    to_networkx``)."""
    import networkx as nx
    nxg = nx.DiGraph()
    nxg.add_nodes_from(range(g.num_nodes()))
    row, col = (np.asarray(a) for a in g.unit().coo())
    for i, (u, v) in enumerate(zip(row.tolist(), col.tolist())):
        attrs = {}
        for a in (edge_attrs or []):
            attrs[a] = np.asarray(g.edata[a])[i]
        nxg.add_edge(u, v, id=i, **attrs)
    for a in (node_attrs or []):
        vals = np.asarray(g.ndata[a])
        for n in range(g.num_nodes()):
            nxg.nodes[n][a] = vals[n]
    return nxg


def bipartite_from_scipy(sp_mat, utype: str, etype: str, vtype: str,
                         eweight_name=None, idtype=None) -> Graph:
    """Uni-directional bipartite graph from a scipy sparse matrix
    (reference ``convert.py:1149``): nonzero (i, j) becomes a
    ``utype``-node-i -> ``vtype``-node-j edge."""
    coo = sp_mat.tocoo()
    g = heterograph(
        {(utype, etype, vtype): (coo.row.astype(np.int64),
                                 coo.col.astype(np.int64))},
        num_nodes_dict={utype: coo.shape[0], vtype: coo.shape[1]})
    if eweight_name is not None:
        g.edges[etype].data[eweight_name] = coo.data
    return g


def bipartite_from_networkx(nx_graph, utype: str, etype: str, vtype: str,
                            u_attrs=None, e_attrs=None, v_attrs=None,
                            edge_id_attr_name=None, idtype=None) -> Graph:
    """Uni-directional bipartite graph from a networkx bipartite graph
    (reference ``convert.py:1435``): nodes with attribute
    ``bipartite == 0`` become ``utype`` nodes, ``bipartite == 1`` become
    ``vtype``; edges go u -> v."""
    u_nodes = [n for n, d in nx_graph.nodes(data=True)
               if d.get("bipartite") == 0]
    v_nodes = [n for n, d in nx_graph.nodes(data=True)
               if d.get("bipartite") == 1]
    u_map = {n: i for i, n in enumerate(u_nodes)}
    v_map = {n: i for i, n in enumerate(v_nodes)}
    src, dst, edata = [], [], []
    for u, v, d in nx_graph.edges(data=True):
        if u in v_map and v in u_map:     # normalize direction u -> v
            u, v = v, u
        src.append(u_map[u])
        dst.append(v_map[v])
        edata.append(d)
    if edge_id_attr_name is not None:
        order = np.argsort([d[edge_id_attr_name] for d in edata])
        src = [src[i] for i in order]
        dst = [dst[i] for i in order]
        edata = [edata[i] for i in order]
    g = heterograph(
        {(utype, etype, vtype): (np.asarray(src, np.int64),
                                 np.asarray(dst, np.int64))},
        num_nodes_dict={utype: len(u_nodes), vtype: len(v_nodes)})
    for attr in (u_attrs or []):
        g.nodes[utype].data[attr] = np.asarray(
            [nx_graph.nodes[n][attr] for n in u_nodes])
    for attr in (v_attrs or []):
        g.nodes[vtype].data[attr] = np.asarray(
            [nx_graph.nodes[n][attr] for n in v_nodes])
    for attr in (e_attrs or []):
        g.edges[etype].data[attr] = np.asarray([d[attr] for d in edata])
    return g
