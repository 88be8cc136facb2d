"""R-GCN entity classification on AIFB (reference examples/pytorch/rgcn)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=60):
    ds = dgl.data.AIFBDataset()
    hg = ds[0]
    rows, cols, ets = [], [], []
    for i, cet in enumerate(hg.canonical_etypes):
        r, c = (np.asarray(a) for a in hg.unit(cet).coo())
        rows.append(r); cols.append(c)
        ets.append(np.full(len(r), i))
    g = dgl.graph((np.concatenate(rows), np.concatenate(cols)),
                  num_nodes=hg.num_nodes("_N"))
    et = jnp.asarray(np.concatenate(ets).astype(np.int32))
    y = hg.nodes["_N"].data["label"]
    train_mask = jnp.asarray(hg.nodes["_N"].data["train_mask"])
    test_mask = np.asarray(hg.nodes["_N"].data["test_mask"])
    num_rels = len(hg.canonical_etypes)

    class RGCN(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = dglnn.RelGraphConv(16, 16, num_rels, regularizer="basis",
                                   num_bases=8,
                                   activation=jax.nn.relu)(g, x, et)
            return dglnn.RelGraphConv(16, ds.num_classes, num_rels,
                                      regularizer="basis", num_bases=8,
                                      self_loop=False)(g, h, et)

    n = g.num_nodes()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, 16)).astype(np.float32))
    model = RGCN()
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * train_mask).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    pred = np.asarray(model.apply(params, g, x).argmax(-1))
    print("test accuracy",
          (pred[test_mask] == np.asarray(y)[test_mask]).mean())


if __name__ == "__main__":
    main()
