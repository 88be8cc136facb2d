"""Geometry ops (reference ``src/geometry/``, ``python/dgl/geometry/``):
farthest-point sampling, blocked KNN, neighbor matching / edge coarsening.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def farthest_point_sampler(pos, npoints: int, start_idx=None):
    """FPS (reference ``python/dgl/geometry/fps.py:11``): iteratively pick
    the point farthest from the chosen set.  ``pos``: (B, N, D) or (N, D).

    Device implementation with ``lax.fori_loop`` — distances updated
    incrementally (O(npoints * N)).
    """
    single = pos.ndim == 2
    if single:
        pos = pos[None]
    B, N, D = pos.shape
    start = jnp.zeros((B,), jnp.int32) if start_idx is None else \
        jnp.full((B,), start_idx, jnp.int32)

    def body(i, state):
        dists, picks = state
        last = picks[:, i - 1]
        lastpos = jnp.take_along_axis(pos, last[:, None, None], axis=1)
        d = jnp.sum((pos - lastpos) ** 2, -1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=1).astype(jnp.int32)
        picks = picks.at[:, i].set(nxt)
        return dists, picks

    picks = jnp.zeros((B, npoints), jnp.int32).at[:, 0].set(start)
    dists = jnp.full((B, N), jnp.inf)
    _, picks = jax.lax.fori_loop(1, npoints, body, (dists, picks))
    return picks[0] if single else picks


def knn(x, k: int, block_size: int = 4096, dist: str = "euclidean"):
    """Blocked brute-force KNN on device (reference brute-force kernels in
    ``src/geometry``): O(N^2 D) matmuls on the MXU without materializing the
    full distance matrix."""
    x = jnp.asarray(x)
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    idx_chunks = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d2 = (sq[s:e, None] - 2 * (x[s:e] @ x.T) + sq[None, :])
        _, idx = jax.lax.top_k(-d2, min(k, n))
        idx_chunks.append(idx)
    return jnp.concatenate(idx_chunks, axis=0)


def neighbor_matching(graph, edge_weights=None, relabel_idx: bool = True):
    """Greedy maximal matching for graph coarsening (reference
    ``python/dgl/geometry/edge_coarsening.py:9``): repeatedly match each
    unmatched node with its heaviest unmatched neighbor."""
    row, col = (np.asarray(a) for a in graph.unit().coo())
    n = graph.num_nodes()
    w = (np.asarray(edge_weights).ravel() if edge_weights is not None
         else np.ones(len(row)))
    order = np.argsort(-w, kind="stable")
    group = np.full(n, -1, np.int64)
    for e in order:
        u, v = row[e], col[e]
        if group[u] < 0 and group[v] < 0 and u != v:
            group[u] = u
            group[v] = u
    unmatched = group < 0
    group[unmatched] = np.arange(n)[unmatched]
    if relabel_idx:
        uniq, relabeled = np.unique(group, return_inverse=True)
        return jnp.asarray(relabeled.astype(np.int32))
    return jnp.asarray(group.astype(np.int32))
