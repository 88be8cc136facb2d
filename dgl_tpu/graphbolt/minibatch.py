"""MiniBatch: the typed record flowing through the pipeline (reference
``python/dgl/graphbolt/minibatch.py``)."""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Union

import numpy as np
import jax


@dataclasses.dataclass
class MiniBatch:
    seeds: Optional[object] = None              # array or {type: array}
    labels: Optional[object] = None
    indexes: Optional[object] = None
    input_nodes: Optional[object] = None        # after sampling
    sampled_subgraphs: Optional[List] = None    # per-layer CSC subgraphs
    blocks: Optional[List] = None               # dgl_tpu blocks (padded)
    node_features: Optional[Dict] = None
    edge_features: Optional[List] = None
    negative_srcs: Optional[object] = None
    negative_dsts: Optional[object] = None
    compacted_seeds: Optional[object] = None

    def to(self, device):
        return jax.device_put(self, device)

    def __repr__(self):
        parts = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is None:
                continue
            parts.append(f.name)
        return f"MiniBatch({', '.join(parts)})"


jax.tree_util.register_pytree_node(
    MiniBatch,
    lambda mb: (tuple(getattr(mb, f.name)
                      for f in dataclasses.fields(MiniBatch)), None),
    lambda aux, ch: MiniBatch(*ch),
)
