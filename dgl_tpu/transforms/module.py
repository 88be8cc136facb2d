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


class LineGraph(BaseTransform):
    """Line graph transform (reference ``module.py LineGraph``)."""

    def __init__(self, backtracking=True):
        self.backtracking = backtracking

    def __call__(self, g):
        return F.line_graph(g, backtracking=self.backtracking)


class KHopGraph(BaseTransform):
    """k-hop graph (reference ``module.py KHopGraph``)."""

    def __init__(self, k):
        self.k = k

    def __call__(self, g):
        from .functional_extra import khop_graph
        return khop_graph(g, self.k)


class AddMetaPaths(BaseTransform):
    """Add metapath-reachability relations to a heterograph (reference
    ``module.py AddMetaPaths``)."""

    def __init__(self, metapaths: dict, keep_orig_edges=True):
        self.metapaths = metapaths
        self.keep_orig_edges = keep_orig_edges

    def __call__(self, g):
        from ..graph.convert import heterograph as make_hetero
        data = {}
        num_nodes = {nt: g.num_nodes(nt) for nt in g.ntypes}
        if self.keep_orig_edges:
            for cet in g.canonical_etypes:
                r, c = g.unit(cet).coo()
                data[cet] = (np.asarray(r), np.asarray(c))
        for name, path in self.metapaths.items():
            sub = F.metapath_reachable_graph(g, path)
            r, c = sub.unit().coo()
            st = g.to_canonical_etype(path[0])[0]
            dt = g.to_canonical_etype(path[-1])[2]
            data[(st, name, dt)] = (np.asarray(r), np.asarray(c))
        return make_hetero(data, num_nodes_dict=num_nodes)


class PPR(BaseTransform):
    """Personalized PageRank diffusion (reference ``module.py PPR``):
    rewires the graph with dense PPR weights above ``eps``."""

    def __init__(self, alpha=0.15, eweight_name="w", eps=1e-2,
                 avg_degree=5):
        self.alpha = alpha
        self.eweight_name = eweight_name
        self.eps = eps

    def _diffusion(self, A):
        n = A.shape[0]
        return self.alpha * np.linalg.inv(
            np.eye(n) - (1 - self.alpha) * A)

    def _norm_adj(self, g):
        n = g.num_nodes()
        A = np.asarray(g.adjacency_matrix()).astype(np.float64)
        if self.eweight_name in g.edata:
            import scipy.sparse as sp
            row, col = (np.asarray(a) for a in g.unit().coo())
            w = np.asarray(g.edata[self.eweight_name]).ravel()
            A = sp.coo_matrix((w, (col, row)), shape=(n, n)).toarray()
        deg = np.maximum(A.sum(1), 1e-12)
        return A / deg[:, None]

    def __call__(self, g):
        from ..graph.convert import graph as make_graph
        S = self._diffusion(self._norm_adj(g))
        S[S < self.eps] = 0.0
        dst, src = np.nonzero(S)
        g2 = make_graph((src, dst), num_nodes=g.num_nodes())
        for k, v in g._node_frames[0].items():
            g2.ndata[k] = v
        g2.edata[self.eweight_name] = S[dst, src].astype(np.float32)
        return g2


class HeatKernel(PPR):
    """Heat-kernel diffusion exp(t(A-I)) (reference ``module.py
    HeatKernel``)."""

    def __init__(self, t=2.0, eweight_name="w", eps=1e-2):
        super().__init__(eweight_name=eweight_name, eps=eps)
        self.t = t

    def _diffusion(self, A):
        from scipy.linalg import expm
        n = A.shape[0]
        return expm(self.t * (A - np.eye(n)))


class GDC(BaseTransform):
    """Graph diffusion convolution with arbitrary coefficients (reference
    ``module.py GDC``): S = sum_k coef[k] A^k."""

    def __init__(self, coefs, eweight_name="w", eps=1e-2):
        self.coefs = list(coefs)
        self.eweight_name = eweight_name
        self.eps = eps

    def __call__(self, g):
        ppr = PPR(eweight_name=self.eweight_name, eps=self.eps)
        A = ppr._norm_adj(g)
        n = A.shape[0]
        S = np.zeros_like(A)
        P = np.eye(n)
        for c in self.coefs:
            S += c * P
            P = P @ A
        S[S < self.eps] = 0.0
        from ..graph.convert import graph as make_graph
        dst, src = np.nonzero(S)
        g2 = make_graph((src, dst), num_nodes=n)
        for k, v in g._node_frames[0].items():
            g2.ndata[k] = v
        g2.edata[self.eweight_name] = S[dst, src].astype(np.float32)
        return g2


class NodeShuffle(BaseTransform):
    """Randomly permute node ids (reference ``module.py NodeShuffle``)."""

    def __init__(self, seed=None):
        self.seed = seed

    def __call__(self, g):
        from ..graph.convert import graph as make_graph
        from ..utils import np_rng
        rng = np.random.default_rng(self.seed) if self.seed is not None \
            else np_rng()
        n = g.num_nodes()
        perm = rng.permutation(n)
        row, col = (np.asarray(a) for a in g.unit().coo())
        g2 = make_graph((perm[row], perm[col]), num_nodes=n)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        for k, v in g._node_frames[0].items():
            g2.ndata[k] = np.asarray(v)[inv]
        for k, v in g._edge_frames[0].items():
            g2.edata[k] = v
        return g2


class AddEdge(BaseTransform):
    """Add random edges at a given ratio (reference ``module.py
    AddEdge``)."""

    def __init__(self, ratio=0.2, seed=None):
        self.ratio = ratio
        self.seed = seed

    def __call__(self, g):
        from ..utils import np_rng
        rng = np.random.default_rng(self.seed) if self.seed is not None \
            else np_rng()
        e_add = int(g.num_edges() * self.ratio)
        n = g.num_nodes()
        u = rng.integers(0, n, e_add)
        v = rng.integers(0, n, e_add)
        return F.add_edges(g, u, v)


class SIGNDiffusion(BaseTransform):
    """SIGN: precompute k diffused feature sets (reference ``module.py
    SIGNDiffusion``): ndata[out_i] = (norm-adj)^i @ feat."""

    def __init__(self, k, in_feat_name="feat", out_feat_name="out",
                 eweight_name=None, diffuse_op="raw", alpha=0.2):
        self.k = k
        self.in_feat_name = in_feat_name
        self.out_feat_name = out_feat_name
        self.diffuse_op = diffuse_op
        self.alpha = alpha

    def __call__(self, g):
        from ..ops import gspmm
        unit = g.unit()
        x = jnp.asarray(g.ndata[self.in_feat_name], jnp.float32)
        din = jnp.maximum(unit.in_degrees(), 1).astype(jnp.float32)
        dout = jnp.maximum(unit.out_degrees(), 1).astype(jnp.float32)
        h = x
        for i in range(1, self.k + 1):
            if self.diffuse_op == "rw":
                h = gspmm(unit, "copy_lhs", "sum", h, None) / din[:, None]
            elif self.diffuse_op == "gcn":
                h = gspmm(unit, "copy_lhs", "sum",
                          h * dout[:, None] ** -0.5, None) * \
                    din[:, None] ** -0.5
            elif self.diffuse_op == "ppr":
                prop = gspmm(unit, "copy_lhs", "sum",
                             h * dout[:, None] ** -0.5, None) * \
                    din[:, None] ** -0.5
                h = (1 - self.alpha) * prop + self.alpha * x
            else:  # raw
                h = gspmm(unit, "copy_lhs", "sum", h, None)
            g.ndata[f"{self.out_feat_name}_{i}"] = h
        return g


class ToLevi(BaseTransform):
    """Levi-graph transform (reference ``module.py ToLevi``): edges become
    nodes of a bipartite hetero graph."""

    def __call__(self, g):
        from ..graph.convert import heterograph as make_hetero
        row, col = (np.asarray(a) for a in g.unit().coo())
        e = len(row)
        eid = np.arange(e)
        hg = make_hetero({
            ("node", "n2e", "edge"): (row, eid),
            ("edge", "e2n", "node"): (eid, col),
        }, num_nodes_dict={"node": g.num_nodes(), "edge": e})
        for k, v in g._node_frames[0].items():
            hg.nodes["node"].data[k] = v
        for k, v in g._edge_frames[0].items():
            hg.nodes["edge"].data[k] = v
        return hg


class SVDPE(BaseTransform):
    """SVD positional encoding into ndata (reference ``module.py SVDPE``)."""

    def __init__(self, k, feat_name="svd_pe", padding=False,
                 random_flip=True):
        self.k = k
        self.feat_name = feat_name
        self.padding = padding
        self.random_flip = random_flip

    def __call__(self, g):
        from .functional_extra import svd_pe
        g.ndata[self.feat_name] = svd_pe(g, self.k, padding=self.padding,
                                         random_flip=self.random_flip)
        return g


# Reference alias (``transforms/module.py`` exports ``LapPE`` = LaplacianPE).
LapPE = LaplacianPE
