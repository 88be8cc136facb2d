"""Composable transform modules (reference ``python/dgl/transforms/module.py:
101-1961``): callable objects ``t(g) -> g`` chainable with ``Compose``."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import functional as F
from ..graph.graph import Graph


class BaseTransform:
    def __call__(self, g: Graph) -> Graph:
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}()"


class Compose(BaseTransform):
    """Apply transforms in sequence (reference ``module.py Compose``)."""

    def __init__(self, transforms: Sequence[BaseTransform]):
        self.transforms = list(transforms)

    def __call__(self, g):
        for t in self.transforms:
            g = t(g)
        return g


class AddSelfLoop(BaseTransform):
    def __init__(self, allow_duplicate=False, new_etypes=False,
                 edge_feat_names=None, fill_data=1.0):
        self.allow_duplicate = allow_duplicate
        self.edge_feat_names = edge_feat_names
        self.fill_data = fill_data

    def __call__(self, g):
        for cet in g.canonical_etypes:
            if cet[0] != cet[2]:
                continue
            if not self.allow_duplicate:
                g = F.remove_self_loop(g, etype=cet)
            g = F.add_self_loop(g, edge_feat_names=self.edge_feat_names,
                                fill_data=self.fill_data, etype=cet)
        return g


class RemoveSelfLoop(BaseTransform):
    def __call__(self, g):
        for cet in g.canonical_etypes:
            if cet[0] == cet[2]:
                g = F.remove_self_loop(g, etype=cet)
        return g


class AddReverse(BaseTransform):
    def __init__(self, copy_edata=False, sym_new_etype=False):
        self.copy_edata = copy_edata

    def __call__(self, g):
        return F.add_reverse_edges(g, copy_edata=self.copy_edata)


class ToSimple(BaseTransform):
    def __init__(self, return_counts="count", aggregator="arbitrary"):
        self.return_counts = return_counts

    def __call__(self, g):
        return F.to_simple(g, return_counts=self.return_counts)


class LaplacianPE(BaseTransform):
    def __init__(self, k, feat_name="PE", eigval_name=None, padding=False):
        self.k = k
        self.feat_name = feat_name
        self.eigval_name = eigval_name
        self.padding = padding

    def __call__(self, g):
        if self.eigval_name:
            pe, ev = F.laplacian_pe(g, self.k, padding=self.padding,
                                    return_eigval=True)
            g.ndata[self.eigval_name] = jnp.broadcast_to(
                ev[None, :], (g.num_nodes(), ev.shape[0]))
        else:
            pe = F.laplacian_pe(g, self.k, padding=self.padding)
        g.ndata[self.feat_name] = pe
        return g


class RandomWalkPE(BaseTransform):
    def __init__(self, k, feat_name="PE"):
        self.k = k
        self.feat_name = feat_name

    def __call__(self, g):
        g.ndata[self.feat_name] = F.random_walk_pe(g, self.k)
        return g


class KNNGraph(BaseTransform):
    def __init__(self, k, feat_name="h", algorithm="bruteforce",
                 dist="euclidean"):
        self.k = k
        self.feat_name = feat_name
        self.dist = dist

    def __call__(self, g):
        x = g.ndata[self.feat_name]
        ng = F.knn_graph(x, self.k, dist=self.dist)
        ng._node_frames[0].update(g._node_frames[0])
        return ng


class DropEdge(BaseTransform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, g):
        return F.drop_edge(g, self.p)


class DropNode(BaseTransform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, g):
        from ..utils import np_rng
        drop = np.nonzero(np_rng().random(g.num_nodes()) < self.p)[0]
        return F.remove_nodes(g, drop)


class FeatMask(BaseTransform):
    """Randomly zero feature columns (reference ``module.py FeatMask``)."""

    def __init__(self, p=0.5, node_feat_names=None, edge_feat_names=None):
        self.p = p
        self.node_feat_names = node_feat_names or []
        self.edge_feat_names = edge_feat_names or []

    def __call__(self, g):
        from ..utils import np_rng
        rng = np_rng()
        for name in self.node_feat_names:
            x = g.ndata[name]
            mask = rng.random(x.shape[-1]) >= self.p
            g.ndata[name] = x * jnp.asarray(mask, x.dtype)
        for name in self.edge_feat_names:
            x = g.edata[name]
            mask = rng.random(x.shape[-1]) >= self.p
            g.edata[name] = x * jnp.asarray(mask, x.dtype)
        return g


class RowFeatNormalizer(BaseTransform):
    def __init__(self, subtract_min=False, node_feat_names=None,
                 edge_feat_names=None):
        self.subtract_min = subtract_min
        self.node_feat_names = node_feat_names or []
        self.edge_feat_names = edge_feat_names or []

    def _norm(self, x):
        if self.subtract_min:
            x = x - x.min()
        s = jnp.maximum(x.sum(axis=-1, keepdims=True), 1e-12)
        return x / s

    def __call__(self, g):
        for name in self.node_feat_names:
            g.ndata[name] = self._norm(g.ndata[name])
        for name in self.edge_feat_names:
            g.edata[name] = self._norm(g.edata[name])
        return g


class GCNNorm(BaseTransform):
    """Precompute symmetric GCN normalization weights into ``edata['w']``
    (reference ``module.py GCNNorm``)."""

    def __init__(self, eweight_name="w"):
        self.eweight_name = eweight_name

    def __call__(self, g):
        unit = g.unit()
        row, col = unit.coo()
        deg_out = jnp.maximum(unit.out_degrees(), 1).astype(jnp.float32)
        deg_in = jnp.maximum(unit.in_degrees(), 1).astype(jnp.float32)
        w = (jnp.take(deg_out, row) ** -0.5) * (jnp.take(deg_in, col) ** -0.5)
        if self.eweight_name in g.edata:
            w = w * g.edata[self.eweight_name]
        g.edata[self.eweight_name] = w
        return g
