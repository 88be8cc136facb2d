"""Jumping Knowledge Network (reference examples/pytorch/jknet/,
Xu et al. 2018): deep GCN whose final representation aggregates ALL
intermediate layers (cat/max/lstm) so shallow nodes keep local detail.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=60, num_layers=4, mode="cat"):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    y = jnp.asarray(np.asarray(g.ndata["label"]))
    classes = ds.num_classes
    tm = jnp.asarray(np.asarray(g.ndata["train_mask"]).astype(np.float32))

    class JKNet(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            hs = []
            h = x
            for i in range(num_layers):
                h = jax.nn.relu(
                    dglnn.GraphConv(h.shape[-1], 32, name=f"gc{i}")(g, h))
                hs.append(h)
            h = dglnn.JumpingKnowledge(mode, 32, num_layers)(hs)
            return nn.Dense(classes)(h)

    model = JKNet()
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adamw(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            ls = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, g, x), y)
            return (ls * tm).sum() / tm.sum()
        loss, grads = jax.value_and_grad(lf)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)

    pred = np.asarray(jnp.argmax(model.apply(params, g, x), -1))
    te = np.asarray(g.ndata["test_mask"]).astype(bool)
    yl = np.asarray(g.ndata["label"])
    acc = float((pred[te] == yl[te]).mean())
    print("test acc", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--mode", default="cat", choices=["cat", "max", "lstm"])
    a = ap.parse_args()
    main(a.epochs, mode=a.mode)
