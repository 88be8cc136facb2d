"""Random graph generators (reference ``python/dgl/random*.py``
``dgl.rand_graph`` / ``dgl.rand_bipartite``)."""
from __future__ import annotations

import numpy as np

from ..graph.convert import graph as make_graph, heterograph as make_hetero
from ..utils import np_rng


def rand_graph(num_nodes: int, num_edges: int, seed=None):
    rng = np.random.default_rng(seed) if seed is not None else np_rng()
    row = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    col = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    return make_graph((row, col), num_nodes=num_nodes)


def rand_bipartite(utype, etype, vtype, num_src, num_dst, num_edges,
                   seed=None):
    rng = np.random.default_rng(seed) if seed is not None else np_rng()
    row = rng.integers(0, num_src, num_edges).astype(np.int32)
    col = rng.integers(0, num_dst, num_edges).astype(np.int32)
    return make_hetero({(utype, etype, vtype): (row, col)},
                       num_nodes_dict={utype: num_src, vtype: num_dst})
