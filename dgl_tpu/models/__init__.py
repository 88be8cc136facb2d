"""Ready-made model architectures (the dglgo model zoo,
``dglgo/dglgo/model/``, as flax modules).  Node encoders: GCN, GraphSAGE,
GAT, GIN, SGC; edge scorers: DotPredictor, MLPPredictor, BilinearPredictor;
graph encoder: GINGraphEncoder."""
from .node_encoders import GCN, GraphSAGE, GAT, GIN, SGC
from .edge_scorers import DotPredictor, MLPPredictor, BilinearPredictor
from .graph_encoders import GINGraphEncoder
