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
from .halo_ops import (
    edge_slots_from_canonical,
    edge_slots_to_canonical,
    halo_gspmm,
    halo_gsddmm,
    halo_edge_softmax,
    HaloUnit,
    MeshGraph,
    shard_graph,
)
from .hetero_mesh import (
    HeteroMeshGraph,
    RelMeshView,
    shard_hetero_graph,
)
from .bitspmd import (
    BitShardedFormat,
    build_bit_sharded_format,
    shard_format as shard_bit_format,
    pad_nodes as pad_bit_nodes,
    bit_sharded_spmm,
    sharded_in_degrees as bit_sharded_in_degrees,
)
from .bitgat_spmd import bit_sharded_gat
from .collectives import (
    sparse_all_to_all_push,
    sparse_all_to_all_pull,
    push_sharded,
    pull_sharded,
)
