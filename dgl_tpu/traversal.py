"""Graph traversal (reference ``python/dgl/traversal.py``, C++
``src/graph/traversal.cc:252``): BFS / topological / DFS frontiers."""
from __future__ import annotations

from collections import deque
from typing import List

import numpy as np
import jax.numpy as jnp

from .graph.graph import Graph


def bfs_nodes_generator(g: Graph, source, reverse: bool = False):
    """Yield per-level node frontiers."""
    unit = g.unit()
    sp = unit.csc() if reverse else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    visited = np.zeros(g.num_nodes(), bool)
    frontier = np.atleast_1d(np.asarray(source)).astype(np.int64)
    visited[frontier] = True
    out = []
    while len(frontier):
        out.append(jnp.asarray(frontier.astype(np.int32)))
        nxt = []
        for u in frontier:
            for v in indices[indptr[u]:indptr[u + 1]]:
                if not visited[v]:
                    visited[v] = True
                    nxt.append(v)
        frontier = np.asarray(sorted(set(nxt)), np.int64)
    return out


def bfs_edges_generator(g: Graph, source, reverse: bool = False):
    """Yield per-level frontier edge ids."""
    unit = g.unit()
    sp = unit.csc() if reverse else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    eids = np.asarray(sp.eids)
    visited = np.zeros(g.num_nodes(), bool)
    frontier = np.atleast_1d(np.asarray(source)).astype(np.int64)
    visited[frontier] = True
    out = []
    while len(frontier):
        level_edges = []
        nxt = []
        for u in frontier:
            for pos in range(indptr[u], indptr[u + 1]):
                v = indices[pos]
                if not visited[v]:
                    visited[v] = True
                    nxt.append(v)
                    level_edges.append(eids[pos])
        if level_edges:
            out.append(jnp.asarray(np.asarray(level_edges, np.int32)))
        frontier = np.asarray(nxt, np.int64)
    return out


def topological_nodes_generator(g: Graph, reverse: bool = False):
    """Yield topological-order frontiers (Kahn's algorithm)."""
    unit = g.unit()
    deg = np.asarray(unit.out_degrees() if reverse else unit.in_degrees()
                     ).copy()
    sp = unit.csc() if reverse else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    frontier = np.nonzero(deg == 0)[0]
    seen = 0
    out = []
    while len(frontier):
        out.append(jnp.asarray(frontier.astype(np.int32)))
        seen += len(frontier)
        nxt = []
        for u in frontier:
            for v in indices[indptr[u]:indptr[u + 1]]:
                deg[v] -= 1
                if deg[v] == 0:
                    nxt.append(v)
        frontier = np.asarray(nxt, np.int64)
    if seen != g.num_nodes():
        raise ValueError("graph has a cycle; topological order undefined")
    return out


def dfs_edges_generator(g: Graph, source, reverse: bool = False):
    """DFS edge frontiers (one edge per step, preorder)."""
    unit = g.unit()
    sp = unit.csc() if reverse else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    eids = np.asarray(sp.eids)
    visited = np.zeros(g.num_nodes(), bool)
    out = []
    for s in np.atleast_1d(np.asarray(source)):
        if visited[s]:
            continue
        visited[s] = True
        stack = [(int(s), indptr[s])]
        while stack:
            u, pos = stack[-1]
            if pos >= indptr[u + 1]:
                stack.pop()
                continue
            stack[-1] = (u, pos + 1)
            v = indices[pos]
            if not visited[v]:
                visited[v] = True
                out.append(int(eids[pos]))
                stack.append((v, indptr[v]))
    return [jnp.asarray(np.asarray([e], np.int32)) for e in out]


def dfs_labeled_edges_generator(g: Graph, source, reverse: bool = False,
                                has_reverse_edge: bool = False,
                                has_nontree_edge: bool = False,
                                return_labels: bool = True):
    """DFS edges labeled FORWARD(0) / REVERSE(1) / NONTREE(2) (reference
    ``traversal.py:208``; networkx ``dfs_labeled_edges`` semantics).
    Returns a list of single-edge frontiers, plus parallel labels when
    ``return_labels``."""
    unit = g.unit()
    sp = unit.csc() if reverse else unit.csr()
    indptr = np.asarray(sp.indptr)
    indices = np.asarray(sp.indices)
    eids = np.asarray(sp.eids)
    visited = np.zeros(g.num_nodes(), bool)
    out, labels = [], []
    for s in np.atleast_1d(np.asarray(source)):
        if visited[s]:
            continue
        visited[s] = True
        stack = [(int(s), int(indptr[s]), -1)]
        while stack:
            u, pos, in_eid = stack[-1]
            if pos >= indptr[u + 1]:
                stack.pop()
                if in_eid >= 0 and has_reverse_edge:
                    out.append(in_eid)
                    labels.append(1)
                continue
            stack[-1] = (u, pos + 1, in_eid)
            v = int(indices[pos])
            e = int(eids[pos])
            if not visited[v]:
                visited[v] = True
                out.append(e)
                labels.append(0)
                stack.append((v, int(indptr[v]), e))
            elif has_nontree_edge:
                out.append(e)
                labels.append(2)
    frontiers = [jnp.asarray(np.asarray([e], np.int32)) for e in out]
    if return_labels:
        return frontiers, [jnp.asarray(np.asarray([l], np.int32))
                           for l in labels]
    return frontiers
