"""papers100M-shaped synthetic graphs (structure-only, scaled).

ogbn-papers100M is a citation graph: 111M nodes / 1.6B directed edges,
heavy-tailed in-degree (papers cited by many), strong temporal/topical
locality (papers cite recent/nearby work).  The driver environment has
no egress, so scaling experiments (SURVEY §7 GATE #3 structure;
reference ``distributed/partition.py:648`` partitions this class of
graph) use this generator: node ids ordered by "publication time", each
edge from u points to a target drawn from

* 90%: a LOCAL window behind u (lognormal offset — topical/temporal
  locality; keeps range partitions realistic, boundary ~10%),
* 10%: a global preferential target (id^alpha skew — hub papers).

Vectorized and chunked: ~100M edges in ~20 s, O(chunk) peak memory.
"""
from __future__ import annotations

import numpy as np


def papers_like_graph(num_nodes: int = 2_400_000,
                      num_edges: int = 100_000_000,
                      local_frac: float = 0.9,
                      window: int = 50_000,
                      hub_alpha: float = 0.6,
                      seed: int = 0,
                      chunk: int = 20_000_000):
    """Returns (row, col) int32 arrays — row cites col."""
    rng = np.random.default_rng(seed)
    rows = np.empty(num_edges, np.int32)
    cols = np.empty(num_edges, np.int32)
    done = 0
    while done < num_edges:
        m = min(chunk, num_edges - done)
        src = rng.integers(0, num_nodes, m).astype(np.int64)
        is_local = rng.uniform(size=m) < local_frac
        # lognormal backward offset, clipped into the window
        off = np.minimum(
            rng.lognormal(mean=np.log(window / 20), sigma=1.6,
                          size=m).astype(np.int64) + 1, window)
        local_dst = np.maximum(src - off, 0)
        # preferential: older papers (smaller id) accumulate citations
        hub_dst = (num_nodes
                   * rng.uniform(size=m) ** (1.0 / hub_alpha)
                   ).astype(np.int64)
        hub_dst = np.minimum(hub_dst, num_nodes - 1)
        dst = np.where(is_local, local_dst, hub_dst)
        rows[done:done + m] = src.astype(np.int32)
        cols[done:done + m] = dst.astype(np.int32)
        done += m
    return rows, cols
