"""Minibatch GraphSAGE with neighbor sampling (reference
examples/pytorch/graphsage + examples/sampling/graphbolt/
node_classification.py): padded static-shape blocks, features riding
the block frames, pad-masked loss.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.dataloading import DataLoader, NeighborSampler
from dgl_tpu.dataloading.pad import PAD_MASK


class SAGE(nn.Module):
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, blocks, x):
        h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], self.hidden,
                                       "mean")(blocks[0], x))
        return dglnn.SAGEConv(self.hidden, self.classes, "mean")(blocks[1], h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=256)
    args = ap.parse_args()

    ds = dgl.data.RedditDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
    model = SAGE(64, ds.num_classes)
    sampler = NeighborSampler([10, 10])
    loader = DataLoader(g, train_ids, sampler,
                        batch_size=args.batch_size, shuffle=True)
    tx = optax.adam(3e-3)
    params = opt = None

    @jax.jit
    def step(params, opt, blocks, x, y, mask):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * mask).sum() / mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for epoch in range(args.epochs):
        tot, cnt = 0.0, 0
        for input_nodes, output_nodes, blocks in loader:
            x = blocks[0].srcdata["feat"]
            y = blocks[-1].dstdata["label"]
            mask = blocks[-1].dstdata[PAD_MASK].astype(jnp.float32)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), blocks, x)
                opt = tx.init(params)
            params, opt, loss = step(params, opt, blocks, x, y, mask)
            tot += float(loss); cnt += 1
        print(f"epoch {epoch} loss {tot / cnt:.4f}")


if __name__ == "__main__":
    main()
