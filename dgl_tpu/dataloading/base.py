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
        self.reverse_etypes = reverse_etypes
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

        exclude_eids = find_exclude_eids(
            g, seed_edges, self.exclude, self.reverse_eids,
            self.reverse_etypes)

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


def find_exclude_eids(g, seed_edges, exclude, reverse_eids=None,
                      reverse_etypes=None, output_device=None):
    """Edge ids to exclude for link-prediction leakage removal
    (reference ``dataloading/base.py:317``): None / 'self' /
    'reverse_id' / 'reverse_types' / callable."""
    if exclude is None:
        return None
    if callable(exclude):
        return exclude(seed_edges)
    if exclude == "self":
        return seed_edges
    if exclude == "reverse_id":
        if isinstance(seed_edges, dict):
            return {k: np.unique(np.concatenate(
                [np.asarray(v), np.asarray(reverse_eids[k])[
                    np.asarray(v)]]))
                for k, v in seed_edges.items()}
        rev = np.asarray(reverse_eids)[np.asarray(seed_edges)]
        return np.unique(np.concatenate([np.asarray(seed_edges), rev]))
    if exclude == "reverse_types":
        if not isinstance(seed_edges, dict):
            raise ValueError("'reverse_types' needs per-etype seed dict")
        out = dict(seed_edges)
        for et, eids in seed_edges.items():
            rt = (reverse_etypes or {}).get(et)
            if rt is not None:
                prev = out.get(rt)
                out[rt] = (np.unique(np.concatenate(
                    [np.asarray(prev), np.asarray(eids)]))
                    if prev is not None else np.asarray(eids))
        return out
    raise ValueError(f"unknown exclude mode {exclude!r}")


class SpotTarget:
    """Degree-thresholded target-edge excluder (arXiv:2306.00899;
    reference ``dataloading/spot_target.py:7``): only edges whose
    endpoints BOTH have degree below ``degree_threshold`` are excluded —
    pass as ``exclude=`` to :func:`as_edge_prediction_sampler`."""

    def __init__(self, g, exclude="self", degree_threshold=10,
                 reverse_eids=None, reverse_etypes=None):
        self.g = g
        self.exclude = exclude
        self.degree_threshold = degree_threshold
        self.reverse_eids = reverse_eids
        self.reverse_etypes = reverse_etypes

    def __call__(self, seed_edges):
        g = self.g
        seed = np.asarray(seed_edges)
        row, col = (np.asarray(a) for a in g.unit().coo())
        out_deg = np.bincount(row, minlength=g.num_nodes())
        in_deg = np.bincount(col, minlength=g.num_nodes())
        deg = out_deg + in_deg
        head_deg = deg[row[seed]]
        tail_deg = deg[col[seed]]
        low = np.minimum(head_deg, tail_deg) < self.degree_threshold
        return find_exclude_eids(g, seed[low], self.exclude,
                                 self.reverse_eids, self.reverse_etypes)


# reference base-class name: samplers producing MFG block lists
BlockSampler = Sampler
