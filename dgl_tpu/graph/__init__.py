from .unitgraph import UnitGraph, CSR, coo_to_csr
from .graph import Graph, DGLGraph, NID, EID, NTYPE, ETYPE
from .convert import (graph, heterograph, create_block, to_block,
                      block_to_graph, from_scipy, to_scipy,
                      from_networkx, to_networkx)
from .subgraph import (
    node_subgraph,
    edge_subgraph,
    in_subgraph,
    out_subgraph,
    khop_in_subgraph,
    khop_out_subgraph,
)
