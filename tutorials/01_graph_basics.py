"""Tutorial 1: graphs, features, message passing (mirrors the reference's
'blitz' tutorial chapter 1-3).

Run: python tutorials/01_graph_basics.py
"""
import numpy as np
import jax.numpy as jnp

import dgl_tpu as dgl
import dgl_tpu.function as fn

# -- construction ------------------------------------------------------
u = np.array([0, 0, 1, 2, 3])
v = np.array([1, 2, 2, 3, 0])
g = dgl.graph((u, v), num_nodes=4)
print(g)

# features are columns in ndata/edata
g.ndata["h"] = jnp.arange(8.0).reshape(4, 2)
g.edata["w"] = jnp.ones((5, 1))

# -- message passing ----------------------------------------------------
# sum neighbor features: builtin pair fuses into one g-SpMM
out = dgl.update_all(g, fn.copy_u("h", "m"), fn.sum("m", "agg"))["agg"]
print("aggregated:\n", out)

# edge-wise op: u_dot_v lowers to g-SDDMM
g.srcdata["h"] = g.ndata["h"]
scores = dgl.apply_edges(g, fn.u_dot_v("h", "h", "s"))
print("edge scores:", scores.ravel())

# -- heterographs -------------------------------------------------------
hg = dgl.heterograph({
    ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
    ("user", "plays", "game"): (np.array([0, 2]), np.array([0, 1])),
})
print(hg)
print("metagraph edges:", list(hg.metagraph().edges()))
