"""Neural network modules (flax.linen) — reference ``python/dgl/nn/``."""
from .conv.graphconv import GraphConv, EdgeWeightNorm
from .conv.sageconv import SAGEConv
from .conv.gatconv import GATConv, GATv2Conv, DotGatConv, EGATConv
from .conv.relgraphconv import RelGraphConv
from .conv.misc import (
    GINConv,
    GINEConv,
    SGConv,
    APPNPConv,
    TAGConv,
    ChebConv,
    EdgeConv,
    NNConv,
    GatedGraphConv,
    AGNNConv,
    CFConv,
    PNAConv,
)
from .conv.extra import (
    GCN2Conv,
    GMMConv,
    EdgeGATConv,
    EGNNConv,
    GatedGCNConv,
    HGTConv,
    DGNConv,
    TWIRLSConv,
    AtomicConv,
    GroupRevRes,
    DenseGraphConv,
    DenseSAGEConv,
    DenseChebConv,
)
from .hetero import HeteroGraphConv
from .linear import TypedLinear, HeteroLinear, HeteroEmbedding
from .glob import (
    SumPooling,
    AvgPooling,
    MaxPooling,
    SortPooling,
    GlobalAttentionPooling,
    WeightAndSum,
    Set2Set,
    SetTransformerEncoder,
    SetTransformerDecoder,
    SetAttentionBlock,
    InducedSetAttentionBlock,
    PMALayer,
    MultiHeadAttention,
)
from .network_emb import DeepWalk, MetaPath2Vec
from .sparse_emb import NodeEmbedding
from .factory import KNNGraph, RadiusGraph, SegmentedKNNGraph
from .utils import (JumpingKnowledge, LabelPropagation, Sequential,
                    WeightBasis, Identity, matmul_maybe_select,
                    bmm_maybe_select, pairwise_squared_distance,
                    get_aggregate_fn)
from .link import TransE, TransR, EdgePredictor
from .gt import (
    DegreeEncoder,
    SpatialEncoder3d,
    LapPosEncoder,
    SpatialEncoder,
    PathEncoder,
    BiasedMHA,
    GraphormerLayer,
    EGTLayer,
)
from .explain import (GNNExplainer, PGExplainer, SubgraphX,
                      HeteroGNNExplainer, HeteroPGExplainer,
                      HeteroSubgraphX, MCTSNode)
