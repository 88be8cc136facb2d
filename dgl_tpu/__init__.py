"""dgl_tpu — a TPU-native graph deep learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of DGL
(reference: ango12138/dgl v2.3).  The graph is a pytree of ``jnp`` arrays;
kernels are XLA segment ops with Pallas TPU fast paths; scaling is
``jax.sharding`` over device meshes.
"""

__version__ = "0.1.0"

from .graph import (
    Graph,
    DGLGraph,
    UnitGraph,
    NID,
    EID,
    NTYPE,
    ETYPE,
    graph,
    heterograph,
    create_block,
    to_block,
    block_to_graph,
    node_subgraph,
    edge_subgraph,
    in_subgraph,
    out_subgraph,
    khop_in_subgraph,
    khop_out_subgraph,
    from_scipy,
    to_scipy,
    from_networkx,
    to_networkx,
)

from . import function
from . import ops
from . import core
from .core import apply_edges, update_all
from .batch import batch, unbatch
from .merge import merge

from . import transforms
from .transforms.functional import (
    add_self_loop,
    remove_self_loop,
    add_reverse_edges,
    reverse,
    to_bidirected,
    to_simple,
    compact_graphs,
    remove_edges,
    remove_nodes,
    add_nodes,
    add_edges,
    knn_graph,
    laplacian_pe,
    random_walk_pe,
    reorder_graph,
    line_graph,
    metapath_reachable_graph,
    shortest_dist,
)
from .transforms.functional_extra import (
    segmented_knn_graph,
    khop_adj,
    khop_graph,
    laplacian_lambda_max,
    adj_product_graph,
    adj_sum_graph,
    sort_csr_by_tag,
    sort_csc_by_tag,
    radius_graph,
    to_half,
    to_double,
    double_radius_node_labeling,
    svd_pe,
)
from . import nn
from . import data
from .data.generators import rand_graph, rand_bipartite
from .utils import seed, set_seed, DGLError
from . import random

from . import sampling
from . import dataloading
from . import distributed
from . import parallel
from . import optim
from . import sparse
from . import geometry
from . import traversal
from . import propagate
from .propagate import prop_nodes, prop_edges, prop_nodes_bfs, \
    prop_nodes_topo, prop_edges_dfs
from . import convert_hetero
from .convert_hetero import to_homogeneous, to_heterogeneous
from . import mpops
from .homophily import (
    node_homophily,
    edge_homophily,
    linkx_homophily,
    adjusted_homophily,
    label_informativeness,
)
from .partition import (
    metis_partition_assignment,
    partition_graph_with_halo,
    random_partition_assignment,
)

from .readout import (
    readout_nodes,
    readout_edges,
    sum_nodes,
    sum_edges,
    mean_nodes,
    mean_edges,
    max_nodes,
    max_edges,
    softmax_nodes,
    softmax_edges,
    broadcast_nodes,
    broadcast_edges,
    topk_nodes,
)

from . import profiler
from .partition import libra_partition
from . import graphbolt
from . import storages
from . import distgnn
from . import checkpoint
from . import models

# --- reference top-level API completion (dgl.* namespace parity) ---------
from .traversal import (
    bfs_nodes_generator,
    bfs_edges_generator,
    dfs_edges_generator,
    dfs_labeled_edges_generator,
    topological_nodes_generator,
)
from .readout import topk_edges
from .batch import slice_batch
from .transforms import (
    to_simple_graph,
    lap_pe,
    metis_partition,
    norm_by_dst,
    to_bfloat16,
    to_float,
)
from .homophily import (
    edge_label_informativeness,
    node_label_informativeness,
)
from .graph.subgraph import node_type_subgraph, edge_type_subgraph
from .graph.convert import bipartite_from_scipy, bipartite_from_networkx
from .multiprocessing import hetero_from_shared_memory
from .utils import combine_names
from . import cuda
from . import backend


def use_libxsmm(flag):
    """Reference API alias (``python/dgl/global_config.py:7``): the
    CPU-kernel toggle maps to this build's Pallas fast-path toggle."""
    from .utils import config as _config
    _config.set_use_pallas(bool(flag))


def is_libxsmm_enabled():
    from .utils import config as _config
    return _config.use_pallas()
