"""dgl_tpu.graphbolt — the Stack-B minibatch pipeline (reference
``python/dgl/graphbolt/``): CSC sampling graph + composable datapipe stages
+ pluggable feature stores + on-disk datasets."""
from .itemset import ItemSet, ItemSetDict
from .minibatch import MiniBatch
from .sampling_graph import (
    CSCSamplingGraph,
    SampledSubgraph,
    fused_csc_sampling_graph,
    from_dglgraph,
    unique_and_compact,
)
from .pipeline import (
    exclude_seed_edges,
    ItemSampler,
    DistributedItemSampler,
    NeighborSampler,
    LayerNeighborSampler,
    UniformNegativeSampler,
    FeatureFetcher,
    ToBlocks,
    CopyTo,
    Transform,
    DataLoader,
)
from .feature_store import (
    Feature,
    ArrayFeature,
    TorchBasedFeature,
    DiskBasedFeature,
    DeviceCachedFeature,
    GPUCachedFeature,
    BasicFeatureStore,
)
from .ondisk_dataset import OnDiskDataset, OnDiskTask, BuiltinDataset
