"""Subgraph-based minibatch samplers: ClusterGCN, GraphSAINT, ShaDow-KHop.

Reference: ``python/dgl/dataloading/cluster_gcn.py:13``, ``graphsaint.py:13``,
``shadow.py:8``.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from .base import Sampler
from ..graph.graph import Graph, NID
from ..graph.subgraph import node_subgraph, in_subgraph
from ..utils import np_rng


class ClusterGCNSampler(Sampler):
    """Partition the graph into ``k`` clusters; each minibatch is the node
    subgraph induced by a set of clusters (reference ``cluster_gcn.py``).
    Partitioning uses the framework partitioner (METIS if native lib is
    built, else random)."""

    def __init__(self, g: Graph, k: int, cache_path=None,
                 balance_ntypes=None):
        from ..partition import metis_partition_assignment
        self.k = k
        parts = np.asarray(metis_partition_assignment(g, k))
        order = np.argsort(parts, kind="stable")
        self.partition_offset = np.searchsorted(parts[order], np.arange(k + 1))
        self.partition_node_ids = order

    def sample(self, g: Graph, partition_ids):
        nodes = np.concatenate([
            self.partition_node_ids[
                self.partition_offset[i]:self.partition_offset[i + 1]]
            for i in np.asarray(partition_ids).ravel()])
        return node_subgraph(g, nodes)


class SAINTSampler(Sampler):
    """GraphSAINT samplers (reference ``graphsaint.py``): mode in
    {node, edge, walk}."""

    def __init__(self, mode: str, budget, cache: bool = True,
                 prefetch_ndata=None, prefetch_edata=None):
        self.mode = mode
        self.budget = budget

    def sample(self, g: Graph, indices):
        rng = np_rng()
        if self.mode == "node":
            prob = np.asarray(g.out_degrees()).astype(np.float64) + 1e-6
            prob = prob / prob.sum()
            nodes = np.unique(rng.choice(g.num_nodes(), self.budget,
                                         p=prob))
        elif self.mode == "edge":
            eids = rng.choice(g.num_edges(), self.budget, replace=False)
            row, col = (np.asarray(x) for x in g.unit().coo())
            nodes = np.unique(np.concatenate([row[eids], col[eids]]))
        elif self.mode == "walk":
            num_roots, length = self.budget
            from ..sampling.randomwalks import random_walk
            roots = rng.integers(0, g.num_nodes(), num_roots)
            traces, _ = random_walk(g, roots, length=length)
            tr = np.asarray(traces)
            nodes = np.unique(tr[tr >= 0])
        else:
            raise ValueError(self.mode)
        return node_subgraph(g, nodes)


class ShaDowKHopSampler(Sampler):
    """ShaDow-GNN sampler (reference ``shadow.py``): sample a bounded
    k-hop neighborhood subgraph per seed batch; model treats it as a full
    graph and reads out the seed nodes."""

    def __init__(self, fanouts: Sequence[int], replace: bool = False,
                 prob=None, output_device=None):
        self.fanouts = list(fanouts)
        self.replace = replace
        self.prob = prob

    def sample(self, g: Graph, seed_nodes, exclude_eids=None):
        from ..sampling.neighbor import sample_neighbors
        seeds = np.asarray(seed_nodes)
        all_nodes = [seeds]
        cur = seeds
        for fanout in reversed(self.fanouts):
            frontier = sample_neighbors(g, cur, fanout, replace=self.replace,
                                        prob=self.prob)
            row, col = (np.asarray(x) for x in frontier.unit().coo())
            mask = np.isin(col, cur)
            cur = np.unique(row[mask])
            all_nodes.append(cur)
        nodes = np.unique(np.concatenate(all_nodes))
        sg = node_subgraph(g, nodes)
        seed_pos = np.searchsorted(nodes, seeds)
        return jnp.asarray(nodes.astype(np.int32)), sg, jnp.asarray(
            seed_pos.astype(np.int32))
