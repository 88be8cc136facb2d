"""Reddit-statistics synthetic graph generator.

The reference's headline GCN number (28.6 s / 200 epochs,
``docs/source/performance.rst:53``) is measured on REAL Reddit: 232,965
nodes, 114.6M edges (avg in-degree 492), heavy-tailed degrees and strong
community structure (posts cluster by subreddit, 41 classes —
``python/dgl/data/reddit.py``).  A uniform-random benchmark graph is the
tile-dense kernel's worst case and nobody's real workload; this generator
matches the statistics that matter for SpMM performance:

* in-degrees ~ truncated Zipf scaled to the target average (heavy tail:
  the top ~3% of dst nodes carry a large share of edges — what the
  hybrid dense-row path exploits);
* planted communities with ``p_intra`` of each node's in-edges drawn
  from its own community (locality: what tiling/caching exploits).

Generation is vectorized numpy, chunked to bound peak memory.
"""
from __future__ import annotations

import numpy as np


def reddit_like_graph(num_nodes: int = 232_965,
                      num_edges: int = 114_615_892,
                      num_communities: int = 41,
                      p_intra: float = 0.8,
                      zipf_a: float = 0.85,
                      max_degree: int = 21_656,
                      seed: int = 0,
                      chunk: int = 8_000_000):
    """Returns (src, dst) int32 arrays with Reddit-like statistics."""
    rng = np.random.default_rng(seed)
    n, e = num_nodes, num_edges

    # ---- heavy-tailed in-degree target per node -----------------------
    # zipf ranks shuffled over nodes, clipped, scaled to sum ~= e
    w = 1.0 / np.arange(1, n + 1) ** zipf_a
    rng.shuffle(w)
    deg = w * (e / w.sum())
    for _ in range(4):  # rescale under the cap until stable
        deg = np.clip(deg, 1.0, max_degree)
        deg = deg * (e / deg.sum())
    deg = np.clip(deg, 1.0, max_degree)
    deg_int = np.floor(deg).astype(np.int64)
    short = e - int(deg_int.sum())
    if short > 0:  # distribute the rounding remainder
        extra = rng.choice(n, size=short, p=(deg - deg_int) /
                           (deg - deg_int).sum())
        np.add.at(deg_int, extra, 1)

    # ---- communities: contiguous ranges (equal sizes) ------------------
    comm_of = (np.arange(n) * num_communities // n).astype(np.int32)
    comm_start = np.searchsorted(comm_of, np.arange(num_communities))
    comm_end = np.append(comm_start[1:], n)

    dst = np.repeat(np.arange(n, dtype=np.int32), deg_int)
    if len(dst) > e:
        dst = dst[:e]
    elif len(dst) < e:
        dst = np.concatenate(
            [dst, rng.integers(0, n, e - len(dst)).astype(np.int32)])
    rng.shuffle(dst)

    src = np.empty(e, np.int32)
    for lo in range(0, e, chunk):
        hi = min(lo + chunk, e)
        d = dst[lo:hi]
        c = comm_of[d]
        intra = rng.uniform(size=hi - lo) < p_intra
        lo_c = comm_start[c]
        sz_c = comm_end[c] - lo_c
        s_intra = lo_c + (rng.uniform(size=hi - lo) * sz_c).astype(np.int64)
        s_rand = rng.integers(0, n, hi - lo)
        src[lo:hi] = np.where(intra, s_intra, s_rand).astype(np.int32)
    return src, dst


def degree_stats(dst: np.ndarray, num_nodes: int, top_k: int = 8192):
    """Coverage diagnostics for the hybrid dense-row kernel."""
    deg = np.bincount(dst, minlength=num_nodes)
    order = np.argsort(deg)[::-1]
    top = deg[order[:top_k]].sum()
    return {
        "avg_degree": float(deg.mean()),
        "max_degree": int(deg.max()),
        f"top{top_k}_edge_coverage": float(top / max(len(dst), 1)),
    }


def reddit_like_graph_sym(num_nodes: int = 232_965,
                          num_edges: int = 114_615_892,
                          num_communities: int = 41,
                          p_intra: float = 0.8,
                          zipf_a: float = 0.85,
                          max_degree: int = 21_656,
                          seed: int = 0,
                          chunk: int = 8_000_000):
    """SYMMETRIC Reddit-statistics graph (degree-corrected SBM).

    Real Reddit is an undirected graph stored with both edge directions
    (``python/dgl/data/reddit.py``: 114,615,892 directed = 57.3M
    undirected x 2; in-degree == out-degree, both heavy-tailed).  The
    directed generator above only gives the dst side a Zipf tail; this
    one draws BOTH endpoints degree-weighted (endpoint B within the
    community of A w.p. ``p_intra``) and emits both directions, so
    A == A^T exactly — which the symmetric hybrid SpMM exploits (one
    int8 hub block serves rows and columns; reverse formats collapse
    into forward ones).

    Real Reddit is a SIMPLE graph (no multi-edges, no self-loops); the
    degree-weighted pair draws collide heavily on hub-hub pairs (~10%
    duplicates at Reddit scale), so pairs are deduplicated on the
    unordered key and topped up with fresh weighted draws until exactly
    ``num_edges // 2`` distinct undirected pairs exist.

    Returns (src, dst) int32 with ``2 * (num_edges // 2)`` edges.
    """
    rng = np.random.default_rng(seed)
    n = num_nodes
    half = num_edges // 2

    w = 1.0 / np.arange(1, n + 1) ** zipf_a
    rng.shuffle(w)
    # cap w so EXPECTED total degree (2*half*w/sum_w) <= max_degree —
    # role-B picks are weight-proportional, so the cap must live on w
    for _ in range(6):
        w = np.minimum(w, max_degree * w.sum() / (2.0 * half))
    # endpoint-A counts: exact degree-weighted multiset via repeat
    deg = w * (half / w.sum())
    cap = max_degree / 2
    for _ in range(4):
        deg = np.clip(deg, 0.5, cap)
        deg = deg * (half / deg.sum())
    deg_int = np.floor(np.clip(deg, 0.0, cap)).astype(np.int64)
    short = half - int(deg_int.sum())
    if short > 0:
        frac = np.maximum(deg - deg_int, 1e-12)
        extra = rng.choice(n, size=short, p=frac / frac.sum())
        np.add.at(deg_int, extra, 1)
    elif short < 0:
        drop = rng.choice(np.repeat(np.arange(n), np.minimum(deg_int, 1)),
                          size=-short, replace=False)
        np.add.at(deg_int, drop, -1)

    comm_of = (np.arange(n) * num_communities // n).astype(np.int32)
    comm_start = np.searchsorted(comm_of, np.arange(num_communities))
    comm_end = np.append(comm_start[1:], n)

    a_end = np.repeat(np.arange(n, dtype=np.int32), deg_int)
    rng.shuffle(a_end)

    # endpoint-B: degree-weighted inverse-CDF, community-restricted
    cumw = np.cumsum(w)
    total = cumw[-1]
    lo_mass = np.where(comm_start > 0, cumw[comm_start - 1], 0.0)
    hi_mass = cumw[comm_end - 1]
    b_end = np.empty(half, np.int32)
    for lo in range(0, half, chunk):
        hi = min(lo + chunk, half)
        a = a_end[lo:hi]
        c = comm_of[a]
        intra = rng.uniform(size=hi - lo) < p_intra
        u = rng.uniform(size=hi - lo)
        target = np.where(intra,
                          lo_mass[c] + u * (hi_mass[c] - lo_mass[c]),
                          u * total)
        b_end[lo:hi] = np.searchsorted(cumw, target).astype(np.int32)
    b_end = np.minimum(b_end, n - 1)

    # ---- simple-graph repair: dedupe unordered pairs, top up ----------
    def _ukey(a, b):
        lo2 = np.minimum(a, b).astype(np.int64)
        hi2 = np.maximum(a, b).astype(np.int64)
        return lo2 * n + hi2

    keep = a_end != b_end
    keys = np.unique(_ukey(a_end[keep], b_end[keep]))
    for _ in range(64):
        need = half - len(keys)
        if need <= 0:
            break
        m = int(need * 1.6) + 1024
        ua = rng.uniform(size=m) * total
        a2 = np.minimum(np.searchsorted(cumw, ua), n - 1).astype(np.int32)
        c2 = comm_of[a2]
        intra2 = rng.uniform(size=m) < p_intra
        u2 = rng.uniform(size=m)
        t2 = np.where(intra2,
                      lo_mass[c2] + u2 * (hi_mass[c2] - lo_mass[c2]),
                      u2 * total)
        b2 = np.minimum(np.searchsorted(cumw, t2), n - 1).astype(np.int32)
        ok = a2 != b2
        keys = np.union1d(keys, _ukey(a2[ok], b2[ok]))
    if len(keys) > half:
        keys = rng.choice(keys, size=half, replace=False)
    lo_n = (keys // n).astype(np.int32)
    hi_n = (keys % n).astype(np.int32)
    src = np.concatenate([lo_n, hi_n])
    dst = np.concatenate([hi_n, lo_n])
    perm = rng.permutation(len(src))
    return src[perm], dst[perm]
