"""Distributed training (reference ``python/dgl/distributed/``).

Two first-class planes, mirroring SURVEY §5.8:
* **SPMD plane** — mesh-sharded ``jax.Array`` features + pjit collectives
  (the NCCL/DDP plane of the reference becomes XLA ICI collectives);
* **RPC plane** — true client/server DistDGL semantics: partition servers
  (``DistGraphServer``) host graph + KVStore shards, clients sample and
  pull/push over the native TCP RPC core (``csrc/rpc.cpp``).
"""
from .partition import partition_graph, load_partition, load_partition_book
from .graph_partition_book import (
    RangePartitionBook,
    NodePartitionPolicy,
    EdgePartitionPolicy,
)
from .dist_graph import (
    get_mesh,
    DistGraph,
    DistGraphRPC,
    DistTensor,
    DistEmbedding,
    KVDistTensor,
)
from .dist_context import (
    initialize,
    exit_client,
    DistGraphServer,
    role,
    get_kvstore,
)
from .kvstore import KVServer, KVClient
from .graph_services import sample_neighbors, in_subgraph, find_edges
from . import rpc
from .dist_dataloader import DistDataLoader, DistNodeDataLoader
