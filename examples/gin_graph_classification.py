"""GIN graph classification (reference examples/pytorch/gin)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=80):
    ds = dgl.data.MiniGCDataset(num_graphs=120)
    items = [ds[i] for i in range(len(ds))]
    graphs = [t[0] for t in items]
    labels = jnp.asarray(np.array([int(t[1]) for t in items]))
    bg = dgl.batch(graphs)
    # structural features: one-hot clipped degree (topology is the label)
    deg = np.clip(np.asarray(bg.unit().in_degrees()), 0, 15)
    x = jnp.asarray(np.eye(16, dtype=np.float32)[deg])

    class GIN(nn.Module):
        @nn.compact
        def __call__(self, bg, x):
            h = jax.nn.relu(dglnn.GINConv(nn.Dense(64), "sum")(bg, x))
            h = jax.nn.relu(dglnn.GINConv(nn.Dense(64), "sum")(bg, h))
            pooled = jnp.concatenate([dglnn.SumPooling()(bg, h),
                                      dglnn.MaxPooling()(bg, h)], -1)
            return nn.Dense(ds.num_classes)(pooled)

    model = GIN()
    params = model.init(jax.random.PRNGKey(0), bg, x)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, bg, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    acc = (np.asarray(model.apply(params, bg, x).argmax(-1)) ==
           np.asarray(labels)).mean()
    print("train accuracy", acc)


if __name__ == "__main__":
    main()
