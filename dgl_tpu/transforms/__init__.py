"""Graph transforms: functional API + module (composable) API."""
from .functional import (
    add_self_loop,
    remove_self_loop,
    reverse,
    add_reverse_edges,
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
    to_bfloat16,
    to_float,
    reorder_graph,
    drop_edge,
    line_graph,
    metapath_reachable_graph,
    norm_by_dst,
    shortest_dist,
)

# Reference-parity aliases (``transforms/functional.py`` exports
# ``to_simple_graph`` and ``lap_pe`` as aliases, and re-exports the
# partition helpers in the transforms namespace).
to_simple_graph = to_simple
lap_pe = laplacian_pe
from ..partition import (  # noqa: E402
    metis_partition_assignment,
    partition_graph_with_halo,
    metis_partition,
)
from .functional_extra import (
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
from .module import (
    BaseTransform,
    Compose,
    AddSelfLoop,
    RemoveSelfLoop,
    AddReverse,
    ToSimple,
    LaplacianPE,
    RandomWalkPE,
    KNNGraph,
    DropEdge,
    DropNode,
    FeatMask,
    RowFeatNormalizer,
    GCNNorm,
    LineGraph,
    KHopGraph,
    AddMetaPaths,
    PPR,
    HeatKernel,
    GDC,
    NodeShuffle,
    AddEdge,
    SIGNDiffusion,
    ToLevi,
    SVDPE,
    LapPE,
)
