"""GraphBolt-style minibatch pipeline (reference
examples/sampling/graphbolt/node_classification.py): ItemSampler ->
NeighborSampler -> FeatureFetcher -> device blocks.
"""
import numpy as np
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu import graphbolt as gb


def main():
    ds = dgl.data.CoraGraphDataset()
    g = ds[0]
    csc = gb.from_dglgraph(g)
    feats = gb.BasicFeatureStore({
        ("node", None, "feat"): gb.ArrayFeature(np.asarray(g.ndata["feat"])),
        ("node", None, "label"): gb.ArrayFeature(
            np.asarray(g.ndata["label"])),
    })
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
    item_set = gb.ItemSet(train_ids, names="seeds")
    pipe = (gb.ItemSampler(item_set, batch_size=64, shuffle=True)
            .sample_neighbor(csc, [5, 5])
            .fetch_feature(feats, node_feature_keys=["feat", "label"])
            .to_blocks())
    for i, mb in enumerate(gb.DataLoader(pipe)):
        x = mb.node_features["feat"]
        print(f"batch {i}: seeds {len(mb.seeds)}, input feats {x.shape}, "
              f"blocks {[(b.num_src_nodes(), b.num_dst_nodes()) for b in mb.blocks]}")
        if i >= 2:
            break


if __name__ == "__main__":
    main()
