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
from .device_loader import (DeviceBlock, sample_block_device,
                            sample_blocks_device,
                            gather_block_features, mean_aggregate,
                            seed_features)
from .subgraph_samplers import ClusterGCNSampler, SAINTSampler, \
    ShaDowKHopSampler
from . import negative_sampler
from .base import (find_exclude_eids, SpotTarget, BlockSampler)
from .negative_sampler import Uniform, PerSourceUniform, GlobalUniform
from .legacy import (
    Collator,
    NodeCollator,
    EdgeCollator,
    GraphCollator,
    TensorizedDataset,
    DDPTensorizedDataset,
    create_tensorized_dataset,
    LazyFeature,
    set_node_lazy_features,
    set_edge_lazy_features,
    set_src_lazy_features,
    set_dst_lazy_features,
    remove_parent_storage_columns,
    restore_parent_storage_columns,
    WorkerInitWrapper,
    CollateWrapper,
)
from ..distributed.dist_dataloader import DistNodeDataLoader  # noqa: F401
try:
    from ..distributed.dist_dataloader import DistEdgeDataLoader  # noqa
except ImportError:  # pragma: no cover
    DistEdgeDataLoader = None
from .inference import layerwise_inference  # noqa: F401,E402
