"""Full-batch GAT (reference examples/pytorch/gat)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


class GAT(nn.Module):
    classes: int

    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GATConv(x.shape[-1], 8, num_heads=8)(g, x)
        h = jax.nn.elu(h.reshape(h.shape[0], -1))
        h = dglnn.GATConv(h.shape[-1], self.classes, num_heads=1)(g, h)
        return h.reshape(h.shape[0], -1)


def main(epochs=100):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x, y = g.ndata["feat"], g.ndata["label"]
    train_mask = jnp.asarray(g.ndata["train_mask"])
    test_mask = np.asarray(g.ndata["test_mask"])
    model = GAT(ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
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

    for epoch in range(epochs):
        params, opt, loss = step(params, opt)
    pred = np.asarray(model.apply(params, g, x).argmax(-1))
    print("test accuracy",
          (pred[test_mask] == np.asarray(y)[test_mask]).mean())


if __name__ == "__main__":
    main()
