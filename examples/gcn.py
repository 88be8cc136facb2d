"""Full-batch GCN node classification (reference examples/pytorch/gcn).

Usage: python examples/gcn.py [--dataset cora] [--epochs 200]
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


class GCN(nn.Module):
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GraphConv(x.shape[-1], self.hidden,
                            activation=jax.nn.relu)(g, x)
        return dglnn.GraphConv(self.hidden, self.classes)(g, h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora",
                    choices=["cora", "citeseer", "pubmed"])
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-2)
    args = ap.parse_args()

    ds = {"cora": dgl.data.CoraGraphDataset,
          "citeseer": dgl.data.CiteseerGraphDataset,
          "pubmed": dgl.data.PubmedGraphDataset}[args.dataset]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x, y = g.ndata["feat"], g.ndata["label"]
    train_mask = jnp.asarray(g.ndata["train_mask"])
    test_mask = np.asarray(g.ndata["test_mask"])

    model = GCN(16, ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adamw(args.lr, weight_decay=5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * train_mask).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for epoch in range(args.epochs):
        params, opt, loss = step(params, opt)
        if epoch % 20 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")
    pred = np.asarray(model.apply(params, g, x).argmax(-1))
    acc = (pred[test_mask] == np.asarray(y)[test_mask]).mean()
    print(f"test accuracy {acc:.4f}")


if __name__ == "__main__":
    main()
