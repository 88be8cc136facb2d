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


def knn(x, k: int, block_size: int = 4096, dist: str = "euclidean",
        algorithm: str = "bruteforce"):
    """KNN indices (n, k).  Algorithms (reference ``src/geometry/`` +
    ``python/dgl/transforms/functional.py knn_graph``):

    * ``bruteforce`` / ``bruteforce-blas`` — blocked O(N²D) MXU matmuls
      on device (exact; best on TPU for D ≳ 16 or small N);
    * ``kd-tree`` — native C++ kd-tree (``csrc/geometry.cpp``), exact,
      O(N log N) build; best for low dimension / large N;
    * ``nn-descent`` — approximate graph-based refinement
      (arXiv:1111.4470), for large N and high D."""
    if algorithm == "kd-tree":
        from .. import csrc
        xh = np.asarray(x, np.float32)
        out = csrc.kdtree_knn(xh, xh, min(k, len(xh)))
        if out is not None:
            return jnp.asarray(out.astype(np.int32))
        # toolchain unavailable: fall through to brute force
    elif algorithm == "nn-descent":
        return jnp.asarray(nn_descent(np.asarray(x, np.float32), k))
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


def nn_descent(x: np.ndarray, k: int, max_iters: int = 10,
               sample_rate: float = 1.0, delta: float = 0.001,
               seed: int = 0):
    """Approximate KNN by neighbor-of-neighbor refinement (reference
    ``src/geometry/cpu`` NN-descent; Dong et al., arXiv:1111.4470).

    Vectorized numpy: each round proposes candidates = neighbors of
    neighbors (+ reverse neighbors) and keeps the best k; stops when the
    update rate falls below ``delta``."""
    rng = np.random.default_rng(seed)
    n = len(x)
    k = min(k, n - 1) if n > 1 else 1
    idx = np.argsort(rng.random((n, n)) if n <= k + 1 else
                     rng.random((n, 2 * k)), axis=1)[:, :k]
    if n > 2 * k:
        idx = rng.integers(0, n, (n, k))
    d2 = ((x[:, None, :] - x[idx]) ** 2).sum(-1) if n * k * x.shape[1] \
        < 5e7 else _rowwise_d2(x, idx)
    for _ in range(max_iters):
        # candidates: neighbors of neighbors (sampled) + REVERSE
        # neighbors (nodes that currently list me) — both halves of the
        # NN-descent "local join"
        nb = idx[idx.reshape(-1)].reshape(n, -1)          # (n, k*k)
        if sample_rate < 1.0:
            take = max(k, int(nb.shape[1] * sample_rate))
            cols = rng.integers(0, nb.shape[1], (n, take))
            nb = np.take_along_axis(nb, cols, axis=1)
        # up-to-k reverse neighbors per node, vectorized
        flat_t = idx.reshape(-1)
        flat_s = np.repeat(np.arange(n), k)
        order = np.argsort(flat_t, kind="stable")
        t_s, s_s = flat_t[order], flat_s[order]
        first = np.concatenate([[True], t_s[1:] != t_s[:-1]])
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(t_s)), 0))
        pos = np.arange(len(t_s)) - run_start
        m = pos < k
        rev = rng.integers(0, n, (n, k))
        rev[t_s[m], pos[m]] = s_s[m]
        rev_nb = idx[rev.reshape(-1)].reshape(n, -1)      # fwd of rev
        cand = np.concatenate([idx, nb, rev, rev_nb], axis=1)
        cand = np.where(cand == np.arange(n)[:, None], (cand + 1) % n,
                        cand)
        cd2 = _rowwise_d2(x, cand)
        # dedupe: push duplicates to +inf except first occurrence
        order = np.argsort(cand, axis=1, kind="stable")
        sc = np.take_along_axis(cand, order, axis=1)
        dup = np.concatenate([np.zeros((n, 1), bool),
                              sc[:, 1:] == sc[:, :-1]], axis=1)
        dupmask = np.zeros_like(dup)
        np.put_along_axis(dupmask, order, dup, axis=1)
        cd2 = np.where(dupmask, np.inf, cd2)
        sel = np.argsort(cd2, axis=1)[:, :k]
        new_idx = np.take_along_axis(cand, sel, axis=1)
        new_d2 = np.take_along_axis(cd2, sel, axis=1)
        changed = (new_idx != idx).mean()
        idx, d2 = new_idx, new_d2
        if changed < delta:
            break
    return idx.astype(np.int64)


def _rowwise_d2(x, idx):
    out = np.empty(idx.shape, np.float32)
    chunk = max(1, int(2e7 // max(idx.shape[1] * x.shape[1], 1)))
    for s in range(0, len(x), chunk):
        e = min(s + chunk, len(x))
        out[s:e] = ((x[s:e, None, :] - x[idx[s:e]]) ** 2).sum(-1)
    return out


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
