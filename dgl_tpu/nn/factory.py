"""Graph factory modules (reference ``python/dgl/nn/pytorch/factory.py:16,
269``): KNNGraph / RadiusGraph built from point features."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..transforms.functional import knn_graph as _knn_graph
from ..graph.convert import graph as make_graph


class KNNGraph:
    """Build a KNN graph from positions (callable, not a param module)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x, algorithm="bruteforce", dist="euclidean"):
        return _knn_graph(x, self.k, algorithm=algorithm, dist=dist)


class RadiusGraph:
    """Connect pairs within radius r (reference ``factory.py:269``)."""

    def __init__(self, r: float, p: float = 2.0, self_loop: bool = False):
        self.r = r
        self.p = p
        self.self_loop = self_loop

    def __call__(self, x, get_distances=False):
        x = np.asarray(x)
        n = x.shape[0]
        d = np.linalg.norm(x[:, None, :] - x[None, :, :], ord=self.p, axis=-1)
        mask = d <= self.r
        if not self.self_loop:
            np.fill_diagonal(mask, False)
        row, col = np.nonzero(mask)
        g = make_graph((row, col), num_nodes=n)
        if get_distances:
            return g, jnp.asarray(d[row, col].astype(np.float32))[:, None]
        return g


class SegmentedKNNGraph:
    """KNN graph per segment of a flat point array (reference
    ``factory.py`` SegmentedKNNGraph): points in different segments never
    connect."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x, segs, algorithm="bruteforce", dist="euclidean"):
        from ..transforms.functional_extra import segmented_knn_graph
        return segmented_knn_graph(x, self.k, segs)
