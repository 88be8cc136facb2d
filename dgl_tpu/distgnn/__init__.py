"""distgnn: vertex-cut (Libra) partitioning + delayed remote aggregation
(reference ``python/dgl/distgnn/``, ``src/array/libra_partition.cc``).

The partitioner itself is native (``dgl_tpu/csrc/partition.cpp
libra_vertex_cut``); this namespace mirrors the reference's module path.
"""
from ..partition import libra_partition


def partition_graph(g, num_parts: int):
    """Edge-partition a graph with the Libra vertex-cut; returns
    ({part: edge_subgraph}, replication_count)."""
    import numpy as np
    from ..graph.subgraph import edge_subgraph
    epart, rep = libra_partition(g, num_parts)
    epart = np.asarray(epart)
    parts = {}
    for p in range(num_parts):
        eids = np.nonzero(epart == p)[0]
        parts[p] = edge_subgraph(g, {g.canonical_etypes[0]: eids},
                                 relabel_nodes=True, store_ids=True)
    return parts, rep

from .aggregate import (  # noqa: E402,F401
    VertexCutParts,
    build_vertex_cut,
    partial_aggregate,
    combine,
    DelayedAggregator,
)
