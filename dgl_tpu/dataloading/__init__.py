"""Dataloading (reference ``python/dgl/dataloading/``)."""
from .base import Sampler, as_edge_prediction_sampler, EdgePredictionSampler
from .neighbor_sampler import (
    NeighborSampler,
    MultiLayerNeighborSampler,
    MultiLayerFullNeighborSampler,
    LaborSampler,
)
from .dataloader import DataLoader, NodeDataLoader, EdgeDataLoader, \
    GraphDataLoader
from .pad import pad_block, pad_graph, next_bucket, PAD_MASK
from .subgraph_samplers import ClusterGCNSampler, SAINTSampler, \
    ShaDowKHopSampler
from . import negative_sampler
