"""Tutorial 2: training a GCN for node classification (mirrors the
reference's node-classification blitz)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn

ds = dgl.data.CoraGraphDataset()
g = dgl.add_self_loop(ds[0])
x, y = g.ndata["feat"], g.ndata["label"]


class GCN(nn.Module):
    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GraphConv(x.shape[-1], 16, activation=jax.nn.relu)(g, x)
        return dglnn.GraphConv(16, ds.num_classes)(g, h)


model = GCN()
params = model.init(jax.random.PRNGKey(0), g, x)
tx = optax.adam(1e-2)
opt = tx.init(params)
mask = jnp.asarray(g.ndata["train_mask"])


@jax.jit
def step(params, opt):
    def loss_fn(p):
        ls = optax.softmax_cross_entropy_with_integer_labels(
            model.apply(p, g, x), y)
        return (ls * mask).sum() / mask.sum()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(grads, opt)
    return optax.apply_updates(params, up), opt, loss


for epoch in range(50):
    params, opt, loss = step(params, opt)
test = np.asarray(g.ndata["test_mask"])
pred = np.asarray(model.apply(params, g, x).argmax(-1))
print("test acc:", (pred[test] == np.asarray(y)[test]).mean())
