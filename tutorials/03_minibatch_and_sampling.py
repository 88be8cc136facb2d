"""Tutorial 3: stochastic training with neighbor sampling and the padded
static-shape block contract (the TPU-specific chapter)."""
import numpy as np
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu.dataloading import DataLoader, NeighborSampler
from dgl_tpu.dataloading.pad import PAD_MASK

ds = dgl.data.CoraGraphDataset()
g = dgl.add_self_loop(ds[0])
train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]

loader = DataLoader(g, train_ids, NeighborSampler([5, 5]),
                    batch_size=32, shuffle=True)
shapes = set()
for input_nodes, output_nodes, blocks in loader:
    # blocks are PADDED to pow2 buckets: the same shapes recur, so the
    # jitted train step compiles a handful of times then runs hot
    shapes.add(tuple((b.num_src_nodes(), b.num_dst_nodes(),
                      b.num_edges()) for b in blocks))
    x = blocks[0].srcdata["feat"]          # features ride the frames
    mask = blocks[-1].dstdata[PAD_MASK]    # mask your loss with this
print("distinct block-shape signatures over the epoch:", len(shapes))
