"""Tutorial 5: graph classification (mirrors the reference blitz
chapter 5): batch graphs, pool node representations per component.

Run: python tutorials/05_graph_classification.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn

ds = dgl.data.MiniGCDataset(num_graphs=100)
items = [ds[i] for i in range(len(ds))]
bg = dgl.batch([t[0] for t in items])          # ONE batched graph
labels = jnp.asarray(np.asarray([int(t[1]) for t in items]))
deg = np.clip(np.asarray(bg.unit().in_degrees()), 0, 15)
x = jnp.asarray(np.eye(16, dtype=np.float32)[deg])


class Classifier(nn.Module):
    @nn.compact
    def __call__(self, bg, x):
        h = jax.nn.relu(dglnn.GraphConv(x.shape[-1], 32)(bg, x))
        h = jax.nn.relu(dglnn.GraphConv(32, 32)(bg, h))
        pooled = dglnn.AvgPooling()(bg, h)     # (batch, 32)
        return nn.Dense(ds.num_classes)(pooled)


model = Classifier()
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


for _ in range(60):
    params, opt, loss = step(params, opt)
acc = (np.asarray(model.apply(params, bg, x).argmax(-1))
       == np.asarray(labels)).mean()
print(f"train accuracy {acc:.3f}")
