"""PinSAGE-style samplers (reference ``python/dgl/sampling/pinsage.py:166``):
random-walk-based neighborhood construction with visit-count weights.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph
from ..graph.convert import heterograph as make_hetero, graph as make_graph
from .randomwalks import random_walk


class RandomWalkNeighborSampler:
    """Reference ``pinsage.py RandomWalkNeighborSampler``: run
    ``num_random_walks`` walks of ``random_walk_length`` per seed, count
    terminal visits, keep ``num_neighbors`` most-visited nodes; returns a
    homogeneous neighbor graph with visit counts in ``edata['weights']``."""

    def __init__(self, G: Graph, random_walk_length: int, random_walk_restart_prob: float,
                 num_random_walks: int, num_neighbors: int, metapath=None,
                 weight_column: str = "weights"):
        self.G = G
        self.length = random_walk_length
        self.restart_prob = random_walk_restart_prob
        self.num_random_walks = num_random_walks
        self.num_neighbors = num_neighbors
        self.weight_column = weight_column
        if metapath is None:
            if len(G.canonical_etypes) != 1:
                raise ValueError("need metapath for heterographs")
            metapath = [G.canonical_etypes[0]] * random_walk_length
        self.metapath = metapath

    def __call__(self, seed_nodes):
        seeds = np.asarray(seed_nodes).astype(np.int64)
        rep = np.repeat(seeds, self.num_random_walks)
        traces, _ = random_walk(self.G, rep, metapath=self.metapath,
                                restart_prob=self.restart_prob)
        traces = np.asarray(traces)
        ends = traces[:, -1]
        starts = rep
        ok = ends >= 0
        ends, starts = ends[ok], starts[ok]
        # count (end -> start) visits
        from collections import Counter
        cnt = Counter(zip(ends.tolist(), starts.tolist()))
        by_dst = {}
        for (e, s), c in cnt.items():
            by_dst.setdefault(s, []).append((c, e))
        rows, cols, ws = [], [], []
        for s, lst in by_dst.items():
            lst.sort(reverse=True)
            for c, e in lst[: self.num_neighbors]:
                rows.append(e)
                cols.append(s)
                ws.append(c)
        n = self.G.num_nodes(self.metapath[0][0])
        ng = make_graph((np.array(rows, np.int64), np.array(cols, np.int64)),
                        num_nodes=n)
        ng.edata[self.weight_column] = jnp.asarray(
            np.array(ws, np.float32))
        return ng


class PinSAGESampler(RandomWalkNeighborSampler):
    """Reference ``pinsage.py PinSAGESampler``: bipartite item-user-item
    walks."""

    def __init__(self, G, ntype, other_type, num_traversals, termination_prob,
                 num_random_walks, num_neighbors, weight_column="weights"):
        metagraph_edges = []
        fw = [c for c in G.canonical_etypes
              if c[0] == ntype and c[2] == other_type]
        bw = [c for c in G.canonical_etypes
              if c[0] == other_type and c[2] == ntype]
        if not fw or not bw:
            raise ValueError("need relations both ways between the types")
        metapath = [fw[0], bw[0]] * num_traversals
        super().__init__(G, len(metapath), termination_prob,
                         num_random_walks, num_neighbors, metapath=metapath,
                         weight_column=weight_column)
