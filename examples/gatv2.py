"""GATv2 node classification (reference examples/pytorch/gatv2) on the
synthetic cora stand-in."""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=60):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    y = g.ndata["label"]
    classes = ds.num_classes

    class GATv2(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = dglnn.GATv2Conv(x.shape[-1], 8, num_heads=8)(g, x)
            h = jax.nn.elu(h.reshape(h.shape[0], -1))
            h = dglnn.GATv2Conv(h.shape[-1], classes, num_heads=1)(g, h)
            return h.reshape(h.shape[0], -1)

    model = GATv2()
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    opt = tx.init(params)
    tm = g.ndata["train_mask"].astype(jnp.float32)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * tm).sum() / tm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    pred = np.asarray(model.apply(params, g, x).argmax(-1))
    test = np.asarray(g.ndata["test_mask"]).astype(bool)
    print("test accuracy", (pred[test] == np.asarray(y)[test]).mean())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    main(ap.parse_args().epochs)
