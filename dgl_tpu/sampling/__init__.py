"""Sampling APIs (reference ``python/dgl/sampling/``)."""
from .neighbor import sample_neighbors, sample_neighbors_biased, select_topk
from .randomwalks import random_walk, node2vec_random_walk, pack_traces
from .negative import global_uniform_negative_sampling
from .pinsage import PinSAGESampler, RandomWalkNeighborSampler
from .labor import sample_labors
from .neighbor import sample_etype_neighbors, sample_neighbors_fused
from .device import (sample_neighbors_device, unique_with_capacity,
                     bit_has_edge, global_uniform_negative_sampling_device,
                     sample_labors_device)


class EidExcluder:
    """Filter sampled frontiers by excluded parent edge ids (reference
    ``sampling/utils.py:26``): callable mapping a subgraph (with
    ``edata[EID]``) to the same subgraph minus the excluded edges."""

    def __init__(self, exclude_eids):
        import numpy as np
        self._exclude = (
            {k: np.asarray(v) for k, v in exclude_eids.items()}
            if isinstance(exclude_eids, dict)
            else np.asarray(exclude_eids))

    def __call__(self, frontier):
        import numpy as np
        from ..graph.graph import EID
        from ..graph.subgraph import edge_subgraph
        sel = {}
        for cet in frontier.canonical_etypes:
            eids = np.asarray(frontier.edges[cet].data[EID])
            excl = (self._exclude.get(cet, self._exclude.get(cet[1]))
                    if isinstance(self._exclude, dict) else self._exclude)
            keep = ~np.isin(eids, excl) if excl is not None else \
                np.ones(len(eids), bool)
            sel[cet] = np.nonzero(keep)[0]
        return edge_subgraph(frontier, sel, relabel_nodes=False,
                             store_ids=False)
