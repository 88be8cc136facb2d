"""Multi-layer neighbor samplers (reference
``python/dgl/dataloading/neighbor_sampler.py:11``).

``sample`` returns ``(input_nodes, output_nodes, blocks)`` with blocks in
topological order (outermost layer first) — the MFG contract of
``to_block`` (SURVEY Appendix B).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .base import Sampler
from ..graph.graph import Graph, NID, EID
from ..graph.convert import to_block
from ..sampling.neighbor import sample_neighbors
from ..sampling.labor import sample_labors


class NeighborSampler(Sampler):
    def __init__(self, fanouts: Sequence, edge_dir: str = "in", prob=None,
                 replace: bool = False, prefetch_node_feats=None,
                 prefetch_labels=None, prefetch_edge_feats=None,
                 output_device=None, fused: bool = True):
        self.fanouts = list(fanouts)
        self.edge_dir = edge_dir
        self.prob = prob
        self.replace = replace
        self.prefetch_node_feats = prefetch_node_feats or []
        self.prefetch_labels = prefetch_labels or []

    def sample(self, g: Graph, seed_nodes, exclude_eids=None):
        if isinstance(seed_nodes, dict):
            seeds = {nt: np.asarray(v) for nt, v in seed_nodes.items()}
        else:
            seeds = np.asarray(seed_nodes)
        output_nodes = seeds
        blocks = []
        for fanout in reversed(self.fanouts):
            frontier = sample_neighbors(
                g, seeds, fanout, edge_dir=self.edge_dir, prob=self.prob,
                replace=self.replace, exclude_edges=exclude_eids)
            block = to_block(frontier, seeds)
            seeds = (np.asarray(block.srcdata[NID])
                     if not isinstance(seeds, dict) else
                     {nt: np.asarray(block.srcnodes[nt].data[NID])
                      for nt in block.srctypes})
            blocks.insert(0, block)
        input_nodes = seeds
        return input_nodes, output_nodes, blocks


MultiLayerNeighborSampler = NeighborSampler


class MultiLayerFullNeighborSampler(NeighborSampler):
    """All neighbors at every layer (reference
    ``MultiLayerFullNeighborSampler``)."""

    def __init__(self, num_layers: int, **kwargs):
        super().__init__([-1] * num_layers, **kwargs)


class LaborSampler(Sampler):
    """LABOR variance-reduced sampler (reference
    ``python/dgl/dataloading/labor_sampler.py:29``); emits per-block
    ``edata['edge_weights']`` importance weights."""

    def __init__(self, fanouts: Sequence, edge_dir="in", prob=None,
                 importance_sampling=0, layer_dependency=False,
                 batch_dependency=1, output_device=None):
        self.fanouts = list(fanouts)
        self.edge_dir = edge_dir
        self.prob = prob
        self.importance_sampling = importance_sampling
        self.layer_dependency = layer_dependency
        self._seed_counter = 0

    def sample(self, g: Graph, seed_nodes, exclude_eids=None):
        seeds = np.asarray(seed_nodes)
        output_nodes = seeds
        blocks = []
        self._seed_counter += 1
        for li, fanout in enumerate(reversed(self.fanouts)):
            seed = (self._seed_counter * 1000003 +
                    (0 if self.layer_dependency else li))
            frontier, _ = sample_labors(
                g, seeds, fanout, edge_dir=self.edge_dir, prob=self.prob,
                random_seed=seed)
            block = to_block(frontier, seeds)
            seeds = np.asarray(block.srcdata[NID])
            blocks.insert(0, block)
        return seeds, output_nodes, blocks
