"""Distributed training (reference ``python/dgl/distributed/``), TPU-native:
mesh-sharded arrays + local-partition sampling instead of KVStore RPC."""
from .partition import partition_graph, load_partition, load_partition_book
from .graph_partition_book import (
    RangePartitionBook,
    NodePartitionPolicy,
    EdgePartitionPolicy,
)
from .dist_graph import (
    initialize,
    get_mesh,
    DistGraph,
    DistTensor,
    DistEmbedding,
)
