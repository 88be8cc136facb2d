"""SPMD parallelism over device meshes."""
from .spmd import (
    ShardedGraph,
    build_sharded_graph,
    shard_graph_arrays,
    pad_node_features,
    sharded_spmm_sum,
    sharded_degrees,
    HaloShardedGraph,
    build_halo_sharded_graph,
    shard_halo_graph,
    halo_spmm_sum,
    halo_degrees,
)
from .collectives import (
    sparse_all_to_all_push,
    sparse_all_to_all_pull,
    push_sharded,
    pull_sharded,
)
