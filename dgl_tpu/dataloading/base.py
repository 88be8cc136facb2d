"""Sampler base classes + edge-prediction wrapper (reference
``python/dgl/dataloading/base.py:164-658``)."""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..graph.graph import Graph, EID, NID


class Sampler:
    """Base: ``sample(g, indices) -> minibatch``."""

    def sample(self, g: Graph, indices):
        raise NotImplementedError


def _locate_eids_to_exclude(frontier_parent_eids, exclude_eids):
    mask = np.isin(frontier_parent_eids, exclude_eids)
    return np.nonzero(mask)[0]


class EdgePredictionSampler(Sampler):
    """Wrap a node-wise sampler for edge classification / link prediction
    (reference ``as_edge_prediction_sampler``, ``base.py:450-658``):
    samples blocks for the endpoints of seed edges, builds ``pair_graph``
    (+ ``neg_pair_graph``), optionally excludes seed edges (and reverses)
    from the sampled frontier to prevent leakage.
    """

    def __init__(self, sampler, exclude=None, reverse_eids=None,
                 reverse_etypes=None, negative_sampler=None):
        self.sampler = sampler
        self.exclude = exclude
        self.reverse_eids = reverse_eids
        self.negative_sampler = negative_sampler

    def _build_neg_graph(self, g, seed_edges):
        neg_srcdst = self.negative_sampler(g, seed_edges)
        neg_src, neg_dst = neg_srcdst
        from ..graph.convert import graph as make_graph
        neg_pair = make_graph((np.asarray(neg_src), np.asarray(neg_dst)),
                              num_nodes=g.num_nodes())
        return neg_pair

    def sample(self, g: Graph, seed_edges):
        seed_edges = np.asarray(seed_edges)
        row, col = (np.asarray(x) for x in g.unit().coo())
        u, v = row[seed_edges], col[seed_edges]

        from ..graph.convert import graph as make_graph
        pair_graph = make_graph((u, v), num_nodes=g.num_nodes())
        pair_graph.edata[EID] = jnp.asarray(seed_edges.astype(np.int32))

        neg_pair_graph = None
        if self.negative_sampler is not None:
            neg_pair_graph = self._build_neg_graph(g, seed_edges)

        seeds = np.unique(np.concatenate([u, v]))
        if neg_pair_graph is not None:
            nr, nc = (np.asarray(x) for x in neg_pair_graph.unit().coo())
            seeds = np.unique(np.concatenate([seeds, nr, nc]))

        exclude_eids = None
        if self.exclude == "self":
            exclude_eids = seed_edges
        elif self.exclude == "reverse_id":
            exclude_eids = np.unique(np.concatenate(
                [seed_edges, np.asarray(self.reverse_eids)[seed_edges]]))

        input_nodes, output_nodes, blocks = self.sampler.sample(
            g, seeds, exclude_eids=exclude_eids)

        # compact pair graphs to the seed set
        from ..transforms.functional import compact_graphs
        if neg_pair_graph is not None:
            pair_graph, neg_pair_graph = compact_graphs(
                [pair_graph, neg_pair_graph])
            return (input_nodes, pair_graph, neg_pair_graph, blocks)
        pair_graph = compact_graphs(pair_graph)
        return (input_nodes, pair_graph, blocks)


def as_edge_prediction_sampler(sampler, exclude=None, reverse_eids=None,
                               reverse_etypes=None, negative_sampler=None):
    """Reference ``dgl.dataloading.as_edge_prediction_sampler``."""
    return EdgePredictionSampler(sampler, exclude=exclude,
                                 reverse_eids=reverse_eids,
                                 reverse_etypes=reverse_etypes,
                                 negative_sampler=negative_sampler)
