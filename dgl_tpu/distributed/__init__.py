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
from . import optim
from .dist_dataloader import (DistDataLoader, DistNodeDataLoader,
                              DistEdgeDataLoader)
from .dist_graph import node_split, edge_split
from .graph_partition_book import (RangePartitionBook as GraphPartitionBook,
                                   NodePartitionPolicy, EdgePartitionPolicy)
from .graph_partition_book import RangePartitionBook  # noqa: F811
from .rpc import (Request, Response, register_service, serialize,
                  deserialize, get_ctx)
# reference helper names mapped onto the native rpc plane
serialize_to_payload = serialize
deserialize_from_payload = deserialize


def read_ip_config(ip_config: str):
    """Parse an ip_config file into [(ip, port, num_servers)] (reference
    ``distributed/rpc.py read_ip_config``)."""
    out = []
    with open(ip_config) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            ip = parts[0]
            port = int(parts[1]) if len(parts) > 1 else 30050
            n = int(parts[2]) if len(parts) > 2 else 1
            out.append((ip, port, n))
    return out


def get_rank() -> int:
    """This process's rank on the RPC plane (reference
    ``distributed.rpc.get_rank``)."""
    return max(int(getattr(get_ctx(), "rank", 0) or 0), 0)
