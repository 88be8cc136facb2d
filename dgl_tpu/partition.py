"""Graph partitioning (reference ``python/dgl/partition.py:139,278``,
C++ METIS binding ``src/graph/transform/metis_partition_hetero.cc:133``).

Modes:
* ``metis`` — multilevel partitioning via the native C++ extension when
  built (``dgl_tpu/csrc``); falls back to the pure-Python Fennel-style
  streaming partitioner below (degree-penalized greedy, one pass in BFS
  order), which gives locality-aware balanced parts without native code;
* ``random`` — uniform assignment.

``partition_graph_with_halo`` mirrors the reference semantics: per-part node
subgraph expanded by ``num_hops`` of in-neighbors, with ``inner_node``
markers.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from .graph.graph import Graph, NID, EID
from .graph.subgraph import node_subgraph


def _fennel_partition(indptr, indices, n, k, gamma=1.5):
    """Streaming Fennel partitioning in BFS order: assign each node to the
    part maximizing |neighbors in part| - alpha * gamma/2 * |part|^(gamma-1).
    """
    m = len(indices)
    alpha = m * (k ** (gamma - 1)) / max(n ** gamma, 1)
    part = np.full(n, -1, np.int64)
    sizes = np.zeros(k, np.int64)
    cap = int(1.1 * n / k) + 1
    # BFS order from node 0 over the undirected structure
    order = []
    seen = np.zeros(n, bool)
    from collections import deque
    for s in range(n):
        if seen[s]:
            continue
        dq = deque([s])
        seen[s] = True
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in indices[indptr[u]:indptr[u + 1]]:
                if not seen[v]:
                    seen[v] = True
                    dq.append(v)
    nbr_count = np.zeros(k, np.float64)
    for u in order:
        nbr_count[:] = 0.0
        for v in indices[indptr[u]:indptr[u + 1]]:
            if part[v] >= 0:
                nbr_count[part[v]] += 1.0
        score = nbr_count - alpha * gamma / 2 * (
            sizes.astype(np.float64) ** (gamma - 1))
        score[sizes >= cap] = -np.inf
        best = int(np.argmax(score))
        part[u] = best
        sizes[best] += 1
    return part


def metis_partition_assignment(g: Graph, k: int, balance_ntypes=None,
                               balance_edges=False, mode="k-way",
                               objtype="cut"):
    """Node -> partition id (reference ``partition.py:278``)."""
    if k <= 1:
        return jnp.zeros(g.num_nodes(), jnp.int32)
    n = g.num_nodes()
    unit = g.unit()
    # symmetrize for partitioning
    row, col = (np.asarray(x) for x in unit.coo())
    import scipy.sparse as sp
    A = sp.coo_matrix((np.ones(len(row)), (row, col)), shape=(n, n))
    A = ((A + A.T) > 0).tocsr()
    from . import csrc
    if csrc.AVAILABLE:
        got = csrc.metis_kway(A.indptr.astype(np.int64),
                              A.indices.astype(np.int64), k)
        if got is not None:
            return jnp.asarray(got[0])
    part = _fennel_partition(A.indptr, A.indices, n, k)
    return jnp.asarray(part.astype(np.int32))


def libra_partition(g: Graph, k: int):
    """Edge-balanced vertex-cut partition (reference distgnn Libra,
    ``src/array/libra_partition.cc:660``): returns per-edge partition ids
    (int32) and the vertex replication count."""
    row, col = (np.asarray(x) for x in g.unit().coo())
    from . import csrc
    if csrc.AVAILABLE:
        got = csrc.libra_vertex_cut(row, col, g.num_nodes(), k)
        if got is not None:
            return jnp.asarray(got[0]), got[1]
    # numpy fallback: greedy least-replication
    n = g.num_nodes()
    member = np.zeros((n, k), bool)
    load = np.zeros(k, np.int64)
    cap = (len(row) + k - 1) // k + 1
    out = np.empty(len(row), np.int32)
    for e in range(len(row)):
        u, v = row[e], col[e]
        score = member[u].astype(np.int32) + member[v].astype(np.int32)
        score[load >= cap] = -1
        best = int(np.argmax(score * 1000 - load * (score >= 0)))
        out[e] = best
        member[u, best] = member[v, best] = True
        load[best] += 1
    rep = int(member.sum() - (member.any(1)).sum())
    return jnp.asarray(out), rep


def random_partition_assignment(g: Graph, k: int):
    from .utils import np_rng
    return jnp.asarray(
        np_rng().integers(0, k, g.num_nodes()).astype(np.int32))


def partition_graph_with_halo(g: Graph, node_part, extra_cached_hops: int = 1,
                              reshuffle: bool = False):
    """Split into per-part subgraphs with ``extra_cached_hops`` of halo
    in-neighbors (reference ``python/dgl/partition.py:139``).  Returns
    ({part_id: subgraph}, None, None); each subgraph has ``ndata``:
    ``NID`` (original ids), ``inner_node`` (1 = owned), and ``edata[EID]``.
    """
    node_part = np.asarray(node_part)
    k = int(node_part.max()) + 1 if len(node_part) else 0
    unit = g.unit()
    csc = unit.csc()
    indptr = np.asarray(csc.indptr)
    indices = np.asarray(csc.indices)
    parts = {}
    for p in range(k):
        owned = np.nonzero(node_part == p)[0]
        frontier = owned
        halo = [owned]
        for _ in range(extra_cached_hops):
            nbrs = np.unique(np.concatenate(
                [indices[indptr[s]:indptr[s + 1]] for s in frontier]
            )) if len(frontier) else np.zeros(0, np.int64)
            new = np.setdiff1d(nbrs, np.concatenate(halo))
            halo.append(new)
            frontier = new
        nodes = np.concatenate(halo)
        sg = node_subgraph(g, nodes)
        inner = np.zeros(len(nodes), np.int64)
        inner[: len(owned)] = 1
        sg.ndata["inner_node"] = jnp.asarray(inner.astype(np.int32))
        sg.ndata["part_id"] = jnp.asarray(
            node_part[nodes].astype(np.int32))
        parts[p] = sg
    return parts, None, None


def metis_partition(g: Graph, k: int, extra_cached_hops: int = 0,
                    reshuffle: bool = False, balance_ntypes=None,
                    balance_edges: bool = False, mode: str = "k-way"):
    """METIS-assign then build per-part halo subgraphs (reference
    ``python/dgl/partition.py:400``).  Returns {part_id: subgraph}; each
    subgraph carries ``ndata[NID]``/``inner_node`` like
    :func:`partition_graph_with_halo`.
    """
    assign = metis_partition_assignment(
        g, k, balance_ntypes=balance_ntypes, balance_edges=balance_edges)
    parts, _, _ = partition_graph_with_halo(
        g, np.asarray(assign), extra_cached_hops, reshuffle=reshuffle)
    return parts
