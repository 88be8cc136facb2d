"""Functional graph transforms (reference ``python/dgl/transforms/functional.py``,
47 functions).  The most-used subset, implemented host-side (structure changes
are data-dependent) with jnp feature handling.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph, NID, EID
from ..graph.unitgraph import UnitGraph


def _homo_only(g, name):
    if not g.is_homogeneous:
        pass  # most transforms below handle hetero per-etype where sensible


def add_self_loop(g: Graph, edge_feat_names=None, fill_data=1.0,
                  etype=None) -> Graph:
    """Add a self-loop per node (reference ``functional.py add_self_loop``:
    appends edges (i, i) for all nodes; new edge features zero-filled or
    ``fill_data``)."""
    etid = g.get_etype_id(etype)
    cet = g.canonical_etypes[etid]
    if cet[0] != cet[2]:
        raise ValueError("add_self_loop requires srctype == dsttype")
    unit = g._units[etid]
    n = unit.num_src
    row, col = unit.coo()
    loop = jnp.arange(n, dtype=jnp.int32)
    new_row = jnp.concatenate([row, loop])
    new_col = jnp.concatenate([col, loop])
    units = list(g._units)
    units[etid] = UnitGraph.from_coo(n, n, new_row, new_col,
                                     formats=unit.formats)
    edge_frames = [dict(f) for f in g._edge_frames]
    newf = {}
    for k, v in edge_frames[etid].items():
        pad_shape = (n,) + v.shape[1:]
        if edge_feat_names is None or k in edge_feat_names:
            pad = jnp.full(pad_shape, fill_data, v.dtype)
        else:
            pad = jnp.zeros(pad_shape, v.dtype)
        newf[k] = jnp.concatenate([v, pad])
    edge_frames[etid] = newf
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=g._node_frames, edge_frames=edge_frames,
                 is_block=g._is_block, block_split=g._block_split)


def remove_self_loop(g: Graph, etype=None) -> Graph:
    """Remove self-loop edges (reference ``functional.py
    remove_self_loop``)."""
    etid = g.get_etype_id(etype)
    unit = g._units[etid]
    row, col = (np.asarray(x) for x in unit.coo())
    keep = np.nonzero(row != col)[0]
    units = list(g._units)
    units[etid] = UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                     row[keep], col[keep],
                                     formats=unit.formats)
    edge_frames = [dict(f) for f in g._edge_frames]
    edge_frames[etid] = {k: v[jnp.asarray(keep)]
                         for k, v in edge_frames[etid].items()}
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=g._node_frames, edge_frames=edge_frames,
                 is_block=g._is_block, block_split=g._block_split)


def reverse(g: Graph, copy_ndata=True, copy_edata=True) -> Graph:
    """Reverse every edge (reference ``dgl.reverse``): relation
    (u, e, v) becomes (v, e, u)."""
    cetypes = [(dt, et, st) for st, et, dt in g.canonical_etypes]
    units = [u.reverse() for u in g._units]
    return Graph(g.ntypes, cetypes, g._num_nodes, units,
                 node_frames=g._node_frames if copy_ndata else None,
                 edge_frames=g._edge_frames if copy_edata else None)


def add_reverse_edges(g: Graph, readonly=None, copy_ndata=True,
                      copy_edata=False, exclude_self=False) -> Graph:
    """Append reversed edges (reference ``functional.py:878``), homograph
    or symmetric-relation heterographs."""
    units = []
    edge_frames = []
    for etid, cet in enumerate(g.canonical_etypes):
        st, et, dt = cet
        if st != dt:
            raise ValueError(
                "add_reverse_edges requires srctype == dsttype per relation")
        unit = g._units[etid]
        row, col = unit.coo()
        new_row = jnp.concatenate([row, col])
        new_col = jnp.concatenate([col, row])
        units.append(UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                        new_row, new_col,
                                        formats=unit.formats))
        if copy_edata:
            edge_frames.append({k: jnp.concatenate([v, v])
                                for k, v in g._edge_frames[etid].items()})
        else:
            edge_frames.append({})
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=g._node_frames if copy_ndata else None,
                 edge_frames=edge_frames)


def to_bidirected(g: Graph, copy_ndata=False) -> Graph:
    """Symmetrize and deduplicate (reference ``dgl.to_bidirected``)."""
    g2 = add_reverse_edges(g, copy_ndata=copy_ndata)
    return to_simple(g2, copy_ndata=copy_ndata)


def to_simple(g: Graph, return_counts=None, copy_ndata=True,
              copy_edata=False, aggregator="arbitrary") -> Graph:
    """Deduplicate parallel edges (reference ``functional.py:2371``)."""
    units = []
    edge_frames = []
    counts_store = []
    for etid, cet in enumerate(g.canonical_etypes):
        unit = g._units[etid]
        row, col = (np.asarray(x) for x in unit.coo())
        pairs = np.stack([row, col], 1)
        uniq, first_idx, counts = np.unique(
            pairs, axis=0, return_index=True, return_counts=True)
        units.append(UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                        uniq[:, 0], uniq[:, 1],
                                        formats=unit.formats))
        counts_store.append(jnp.asarray(counts.astype(np.int32)))
        if copy_edata:
            edge_frames.append({k: v[jnp.asarray(first_idx)]
                                for k, v in g._edge_frames[etid].items()})
        else:
            edge_frames.append({})
    out = Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                node_frames=g._node_frames if copy_ndata else None,
                edge_frames=edge_frames)
    if return_counts is not None:
        for etid in range(len(units)):
            out._edge_frames[etid][return_counts] = counts_store[etid]
    return out


def compact_graphs(graphs, always_preserve=None):
    """Drop nodes with no edges in any of the given graphs, relabeling
    consistently (reference ``functional.py:2126``, C++ ``compact.cc:199``).
    Returns graphs with ``ndata[NID]`` giving original ids."""
    single = isinstance(graphs, Graph)
    if single:
        graphs = [graphs]
    g0 = graphs[0]
    used = {nt: np.zeros(g0.num_nodes(nt), bool) for nt in g0.ntypes}
    if always_preserve is not None:
        if not isinstance(always_preserve, dict):
            always_preserve = {g0.ntypes[0]: always_preserve}
        for nt, ids in always_preserve.items():
            used[nt][np.asarray(ids)] = True
    for g in graphs:
        for cet, unit in zip(g.canonical_etypes, g._units):
            st, _, dt = cet
            row, col = (np.asarray(x) for x in unit.coo())
            used[st][row] = True
            used[dt][col] = True
    keep = {nt: np.nonzero(u)[0] for nt, u in used.items()}
    inv = {}
    for nt, ids in keep.items():
        m = np.full(g0.num_nodes(nt), -1, np.int64)
        m[ids] = np.arange(len(ids))
        inv[nt] = m
    outs = []
    for g in graphs:
        units = []
        for cet, unit in zip(g.canonical_etypes, g._units):
            st, _, dt = cet
            row, col = (np.asarray(x) for x in unit.coo())
            units.append(UnitGraph.from_coo(
                len(keep[st]), len(keep[dt]), inv[st][row], inv[dt][col]))
        num_nodes = [len(keep[nt]) for nt in g.ntypes]
        node_frames = []
        for i, nt in enumerate(g.ntypes):
            ids = jnp.asarray(keep[nt], jnp.int32)
            frame = {k: jnp.take(v, ids, axis=0)
                     for k, v in g._node_frames[i].items()}
            frame[NID] = ids
            node_frames.append(frame)
        outs.append(Graph(g.ntypes, g.canonical_etypes, num_nodes, units,
                          node_frames=node_frames,
                          edge_frames=g._edge_frames))
    return outs[0] if single else outs


def remove_edges(g: Graph, eids, etype=None, store_ids=False) -> Graph:
    """Remove edges by id (reference ``dgl.remove_edges``)."""
    etid = g.get_etype_id(etype)
    unit = g._units[etid]
    eids = np.asarray(eids)
    mask = np.ones(unit.num_edges, bool)
    mask[eids] = False
    keep = np.nonzero(mask)[0]
    row, col = (np.asarray(x) for x in unit.coo())
    units = list(g._units)
    units[etid] = UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                     row[keep], col[keep])
    edge_frames = [dict(f) for f in g._edge_frames]
    nf = {k: v[jnp.asarray(keep)] for k, v in edge_frames[etid].items()}
    if store_ids:
        nf[EID] = jnp.asarray(keep, jnp.int32)
    edge_frames[etid] = nf
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=g._node_frames, edge_frames=edge_frames)


def remove_nodes(g: Graph, nids, ntype=None, store_ids=False) -> Graph:
    """Remove nodes (and incident edges)."""
    nt = g.ntypes[g.get_ntype_id(ntype)]
    mask = np.ones(g.num_nodes(nt), bool)
    mask[np.asarray(nids)] = False
    keep = {ntt: (np.nonzero(mask)[0] if ntt == nt
                  else np.arange(g.num_nodes(ntt)))
            for ntt in g.ntypes}
    from ..graph.subgraph import node_subgraph
    return node_subgraph(g, keep, store_ids=store_ids)


def _default_fill(g, kind, field, shape, dtype, id_range):
    """New-row fill for structural edits: the registered per-column
    initializer (reference ``frame.py:56,167`` schemes; 4-arg reference
    signature or plain (shape, dtype)), zero otherwise."""
    init = g._frame_initializer(field, kind)
    if init is None:
        return jnp.zeros(shape, dtype)
    try:
        return jnp.asarray(init(shape, dtype, None, id_range))
    except TypeError:
        return jnp.asarray(init(shape, dtype))


def add_nodes(g: Graph, num: int, data=None, ntype=None) -> Graph:
    nti = g.get_ntype_id(ntype)
    num_nodes = list(g._num_nodes)
    old_n = num_nodes[nti]
    num_nodes[nti] = old_n + num
    units = []
    for cet, unit in zip(g.canonical_etypes, g._units):
        st, _, dt = cet
        ns = num_nodes[g.get_ntype_id(st)]
        nd = num_nodes[g.get_ntype_id(dt)]
        row, col = unit.coo()
        units.append(UnitGraph.from_coo(ns, nd, row, col))
    node_frames = [dict(f) for f in g._node_frames]
    nf = {}
    for k, v in node_frames[nti].items():
        pad = _default_fill(g, "n", k, (num,) + v.shape[1:], v.dtype,
                            (old_n, old_n + num))
        nf[k] = jnp.concatenate([v, pad])
    if data:
        for k, v in data.items():
            if k in nf:
                nf[k] = nf[k].at[old_n:].set(v)
            else:
                base = jnp.zeros((old_n,) + jnp.asarray(v).shape[1:],
                                 jnp.asarray(v).dtype)
                nf[k] = jnp.concatenate([base, jnp.asarray(v)])
    node_frames[nti] = nf
    out = Graph(g.ntypes, g.canonical_etypes, num_nodes, units,
                node_frames=node_frames, edge_frames=g._edge_frames)
    out._n_init = getattr(g, "_n_init", None)
    out._e_init = getattr(g, "_e_init", None)
    return out


def add_edges(g: Graph, u, v, data=None, etype=None) -> Graph:
    etid = g.get_etype_id(etype)
    unit = g._units[etid]
    row, col = unit.coo()
    u = jnp.asarray(np.asarray(u).reshape(-1), jnp.int32)
    v = jnp.asarray(np.asarray(v).reshape(-1), jnp.int32)
    units = list(g._units)
    units[etid] = UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                     jnp.concatenate([row, u]),
                                     jnp.concatenate([col, v]))
    edge_frames = [dict(f) for f in g._edge_frames]
    nf = {}
    for k, val in edge_frames[etid].items():
        pad = _default_fill(g, "e", k, (u.shape[0],) + val.shape[1:],
                            val.dtype,
                            (unit.num_edges, unit.num_edges + u.shape[0]))
        nf[k] = jnp.concatenate([val, pad])
    if data:
        for k, val in data.items():
            val = jnp.asarray(val)
            if k in nf:
                nf[k] = nf[k].at[unit.num_edges:].set(val)
            else:
                base = jnp.zeros((unit.num_edges,) + val.shape[1:], val.dtype)
                nf[k] = jnp.concatenate([base, val])
    edge_frames[etid] = nf
    out = Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                node_frames=g._node_frames, edge_frames=edge_frames)
    out._n_init = getattr(g, "_n_init", None)
    out._e_init = getattr(g, "_e_init", None)
    return out


# ---------------------------------------------------------------------------
# geometry / positional transforms
# ---------------------------------------------------------------------------


def knn_graph(x, k: int, algorithm="bruteforce", dist="euclidean",
              exclude_self=False) -> Graph:
    """k-nearest-neighbor graph (reference ``functional.py:111``; C++
    ``src/geometry``).  Edges point from neighbors to the query node
    (reference convention).  Brute-force on device: one (N, N) distance
    matrix via matmul — MXU-friendly; for large N use
    ``dgl_tpu.geometry.knn`` (blocked)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    if algorithm in ("kd-tree", "nn-descent") and dist == "euclidean":
        from ..geometry import knn as _knn
        idx = np.asarray(_knn(x, min(k + int(exclude_self), n),
                              algorithm=algorithm))
        dstk = np.repeat(np.arange(n), idx.shape[1])
        srck = idx.reshape(-1)
        if exclude_self:
            m = srck != dstk
            srck, dstk = srck[m], dstk[m]
        from ..graph.convert import graph as make_graph
        return make_graph((srck.astype(np.int64),
                           dstk.astype(np.int64)), num_nodes=n)
    if dist == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sim = xn @ xn.T
        d2 = -sim
    else:
        sq = jnp.sum(x * x, axis=1)
        d2 = sq[:, None] - 2 * (x @ x.T) + sq[None, :]
    kk = min(k + int(exclude_self), n)
    if exclude_self:
        d2 = d2 + jnp.eye(n) * jnp.inf
        kk = min(k, n - 1)
    _, idx = jax.lax.top_k(-d2, kk)
    col = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
    row = idx.reshape(-1).astype(jnp.int32)
    from ..graph.convert import graph as make_graph
    return make_graph((np.asarray(row), np.asarray(col)), num_nodes=n)


def laplacian_pe(g: Graph, k: int, padding=False, return_eigval=False):
    """Laplacian positional encoding (reference ``functional.py:3723``):
    eigenvectors of the symmetric-normalized Laplacian for the k smallest
    non-trivial eigenvalues."""
    n = g.num_nodes()
    A = np.asarray(g.adjacency_matrix())  # (dst, src) counts
    A = np.minimum(A + A.T, 1.0)
    deg = A.sum(1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    L = np.eye(n) - (dinv[:, None] * A) * dinv[None, :]
    vals, vecs = np.linalg.eigh(L)
    # skip the first (trivial) eigenvector
    kk = min(k, n - 1)
    pe = vecs[:, 1:kk + 1]
    ev = vals[1:kk + 1]
    if padding and kk < k:
        pe = np.pad(pe, ((0, 0), (0, k - kk)))
        ev = np.pad(ev, (0, k - kk))
    # sign is ambiguous: randomize like the reference does at use time
    if return_eigval:
        return jnp.asarray(pe.astype(np.float32)), jnp.asarray(
            ev.astype(np.float32))
    return jnp.asarray(pe.astype(np.float32))


def random_walk_pe(g: Graph, k: int):
    """Random-walk positional encoding (reference ``functional.py
    random_walk_pe``): diagonals of the k-step RW transition matrix."""
    n = g.num_nodes()
    A = np.asarray(g.adjacency_matrix()).T  # (src, dst): row-stochastic walk
    deg = np.maximum(A.sum(1, keepdims=True), 1)
    P = A / deg
    out = []
    M = P.copy()
    for _ in range(k):
        out.append(np.diag(M))
        M = M @ P
    return jnp.asarray(np.stack(out, 1).astype(np.float32))


def to_bfloat16(g: Graph) -> Graph:
    """Cast float features to bfloat16 (reference ``functional.py:3729``) —
    on TPU this is the native matmul dtype."""
    def cast(frame):
        return {k: (v.astype(jnp.bfloat16)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in frame.items()}
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, g._units,
                 node_frames=[cast(f) for f in g._node_frames],
                 edge_frames=[cast(f) for f in g._edge_frames],
                 is_block=g._is_block, block_split=g._block_split)


def to_float(g: Graph, dtype=jnp.float32) -> Graph:
    def cast(frame):
        return {k: (v.astype(dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in frame.items()}
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, g._units,
                 node_frames=[cast(f) for f in g._node_frames],
                 edge_frames=[cast(f) for f in g._edge_frames],
                 is_block=g._is_block, block_split=g._block_split)


def reorder_graph(g: Graph, node_permute_algo="rcmk", edge_permute_algo="src",
                  store_ids=True, permute_config=None) -> Graph:
    """Reorder nodes/edges for locality (reference ``functional.py:3078``).

    On TPU this materially impacts the Pallas BSR SpMM: RCM ordering
    concentrates edges near the diagonal, raising block density.
    Algorithms: 'rcmk' (reverse Cuthill-McKee via scipy), 'metis' (via the
    native partitioner when built), 'custom' (permute_config['nodes_perm']).
    """
    if not g.is_homogeneous:
        raise ValueError("reorder_graph expects a homogeneous graph")
    n = g.num_nodes()
    unit = g.unit()
    row, col = (np.asarray(x) for x in unit.coo())
    if node_permute_algo == "rcmk":
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        A = sp.coo_matrix((np.ones(len(row)), (row, col)),
                          shape=(n, n)).tocsr()
        A = A + A.T
        perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    elif node_permute_algo == "metis":
        from ..partition import metis_partition_assignment
        nparts = (permute_config or {}).get("k", 8)
        parts = np.asarray(metis_partition_assignment(g, nparts))
        perm = np.argsort(parts, kind="stable")
    elif node_permute_algo == "custom":
        perm = np.asarray(permute_config["nodes_perm"])
    else:
        raise ValueError(node_permute_algo)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    new_row, new_col = inv[row], inv[col]
    if edge_permute_algo == "src":
        eperm = np.argsort(new_row, kind="stable")
    elif edge_permute_algo == "dst":
        eperm = np.argsort(new_col, kind="stable")
    else:
        eperm = np.arange(len(row))
    units = [UnitGraph.from_coo(n, n, new_row[eperm], new_col[eperm])]
    node_frame = {k: jnp.take(v, jnp.asarray(perm, jnp.int32), axis=0)
                  for k, v in g._node_frames[0].items()}
    edge_frame = {k: jnp.take(v, jnp.asarray(eperm, jnp.int32), axis=0)
                  for k, v in g._edge_frames[0].items()}
    if store_ids:
        node_frame[NID] = jnp.asarray(perm, jnp.int32)
        edge_frame[EID] = jnp.asarray(eperm, jnp.int32)
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=[node_frame], edge_frames=[edge_frame])


def drop_edge(g: Graph, p: float = 0.5, seed: Optional[int] = None) -> Graph:
    """Randomly drop edges (DropEdge augmentation; reference
    ``transforms/module.py DropEdge``)."""
    from ..utils import np_rng
    rng = np.random.default_rng(seed) if seed is not None else np_rng()
    units = []
    edge_frames = []
    for etid, unit in enumerate(g._units):
        keep = np.nonzero(rng.random(unit.num_edges) >= p)[0]
        row, col = (np.asarray(x) for x in unit.coo())
        units.append(UnitGraph.from_coo(unit.num_src, unit.num_dst,
                                        row[keep], col[keep]))
        edge_frames.append({k: v[jnp.asarray(keep)]
                            for k, v in g._edge_frames[etid].items()})
    return Graph(g.ntypes, g.canonical_etypes, g._num_nodes, units,
                 node_frames=g._node_frames, edge_frames=edge_frames)


def line_graph(g: Graph, backtracking=True, shared=False) -> Graph:
    """Line graph: nodes = edges of g; edge (e1 -> e2) iff dst(e1) == src(e2)
    (reference ``functional.py line_graph``, C++ COO linegraph)."""
    unit = g.unit()
    row, col = (np.asarray(x) for x in unit.coo())
    E = len(row)
    # group edges by source; for each edge e1 (u->v), successors are edges
    # starting at v
    csr_by_src = {}
    order = np.argsort(row, kind="stable")
    import collections
    starts = collections.defaultdict(list)
    for e in range(E):
        starts[row[e]].append(e)
    lr, lc = [], []
    for e1 in range(E):
        for e2 in starts.get(col[e1], ()):
            if not backtracking and row[e1] == col[e2] and col[e1] == row[e2]:
                continue
            lr.append(e1)
            lc.append(e2)
    from ..graph.convert import graph as make_graph
    lg = make_graph((np.asarray(lr, np.int64), np.asarray(lc, np.int64)),
                    num_nodes=E)
    if shared:
        lg._node_frames[0].update(g._edge_frames[0])
    return lg


def metapath_reachable_graph(g: Graph, metapath) -> Graph:
    """Reachability graph along a metapath (reference ``functional.py
    metapath_reachable_graph``): boolean product of the per-relation
    adjacencies."""
    cets = [g.to_canonical_etype(m) for m in metapath]
    A = np.asarray(g.adjacency_matrix(etype=cets[0])) > 0  # (dst, src)
    for cet in cets[1:]:
        B = np.asarray(g.adjacency_matrix(etype=cet)) > 0
        A = (B.astype(np.int32) @ A.astype(np.int32)) > 0
    dst, src = np.nonzero(A)
    st = cets[0][0]
    dt = cets[-1][2]
    from ..graph.convert import heterograph as make_hetero
    if st == dt:
        from ..graph.convert import graph as make_graph
        out = make_graph((src, dst), num_nodes=g.num_nodes(st))
        out._node_frames[0].update(g._node_frames[g.get_ntype_id(st)])
        return out
    out = make_hetero({(st, "_E", dt): (src, dst)},
                      num_nodes_dict={st: g.num_nodes(st),
                                      dt: g.num_nodes(dt)})
    return out


def norm_by_dst(g: Graph, etype=None):
    """1/in-degree edge weights (reference ``functional.py norm_by_dst``)."""
    etid = g.get_etype_id(etype)
    unit = g._units[etid]
    _, col = unit.coo()
    deg = jnp.maximum(unit.in_degrees(), 1).astype(jnp.float32)
    return 1.0 / jnp.take(deg, col)


def shortest_dist(g: Graph, root=None, return_paths=False):
    """All-pairs / single-source shortest distances (reference
    ``functional.py shortest_dist``; used by Graphormer spatial encoding).
    Unweighted BFS distances; -1 for unreachable."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import shortest_path
    n = g.num_nodes()
    row, col = (np.asarray(x) for x in g.unit().coo())
    A = sp.coo_matrix((np.ones(len(row)), (row, col)), shape=(n, n))
    indices = None if root is None else root
    d, pred = shortest_path(A, method="D", unweighted=True,
                            indices=indices, return_predecessors=True)
    d_out = d.copy()
    d_out[np.isinf(d_out)] = -1
    dist = jnp.asarray(d_out.astype(np.int32))
    if not return_paths:
        return dist
    # paths as edge-id sequences padded with -1 (reference contract:
    # functional.py:3900-3912); L = longest finite shortest path
    eid_of = {}
    for e in range(len(row)):
        eid_of.setdefault((int(row[e]), int(col[e])), e)
    finite = d[np.isfinite(d) & (d > 0)]
    L = max(int(finite.max()) if finite.size else 0, 1)

    def walk(pred_row, src, j):
        if j == src or pred_row[j] < 0:
            return []
        nodes = [j]
        while nodes[-1] != src:
            p = int(pred_row[nodes[-1]])
            if p < 0:
                return []
            nodes.append(p)
        nodes = nodes[::-1]
        return [eid_of[(nodes[t], nodes[t + 1])]
                for t in range(len(nodes) - 1)]

    if root is not None:
        paths = np.full((n, L), -1, np.int64)
        for j in range(n):
            pe = walk(pred, root, j)
            paths[j, : len(pe)] = pe
        return dist, jnp.asarray(paths.astype(np.int32))
    paths = np.full((n, n, L), -1, np.int64)
    for i in range(n):
        for j in range(n):
            pe = walk(pred[i], i, j)
            paths[i, j, : len(pe)] = pe
    return dist, jnp.asarray(paths.astype(np.int32))
