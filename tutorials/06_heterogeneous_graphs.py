"""Tutorial 6: heterogeneous graphs (mirrors the reference blitz
chapter on heterographs) — multiple node/edge types, per-relation
message passing, and the fused multi-relation dispatch.

Run: python tutorials/06_heterogeneous_graphs.py
"""
import numpy as np
import jax.numpy as jnp

import dgl_tpu as dgl
import dgl_tpu.function as fn

rng = np.random.default_rng(0)
g = dgl.heterograph({
    ("user", "follows", "user"): (rng.integers(0, 10, 40),
                                  rng.integers(0, 10, 40)),
    ("user", "plays", "game"): (rng.integers(0, 10, 30),
                                rng.integers(0, 5, 30)),
    ("developer", "develops", "game"): (rng.integers(0, 3, 5),
                                        rng.integers(0, 5, 5)),
})
print(g)
print("node types:", g.ntypes)
print("canonical edge types:", g.canonical_etypes)

# per-type features
for nt in g.ntypes:
    g.nodes[nt].data["h"] = jnp.asarray(
        rng.normal(size=(g.num_nodes(nt), 8)).astype(np.float32))

# multi-relation message passing: relations that share a destination
# type, message kind, and sum reduce are fused into ONE stacked SpMM
# (25x on chip at scale -- docs/performance.md)
g.multi_update_all(
    {"plays": (fn.copy_u("h", "m"), fn.sum("m", "agg")),
     "develops": (fn.copy_u("h", "m"), fn.sum("m", "agg"))},
    cross_reducer="sum")
print("game agg:", g.nodes["game"].data["agg"].shape)

# relation slicing + type subgraphs
sub = dgl.edge_type_subgraph(g, ["follows"])
print("follows-only subgraph:", sub)

# convert to homogeneous for typed-linear models (RelGraphConv)
homo = dgl.to_homogeneous(g)
print("homogeneous:", homo.num_nodes(), "nodes,",
      homo.num_edges(), "edges; etype tags:",
      np.unique(np.asarray(homo.edata[dgl.ETYPE])))
