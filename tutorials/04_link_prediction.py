"""Tutorial 4: link prediction (mirrors the reference blitz chapter 4).

Train a GraphSAGE encoder; score edges with a dot product; negatives by
corruption.  Run: python tutorials/04_link_prediction.py
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn

ds = dgl.data.CoraGraphDataset()
g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
x = g.ndata["feat"]
row, col = (np.asarray(a) for a in g.unit().coo())

# train/test edge split
rng = np.random.default_rng(0)
perm = rng.permutation(len(row))
test_pos, train_pos = perm[: len(row) // 10], perm[len(row) // 10:]


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, g, x):
        h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], 32, "mean")(g, x))
        return dglnn.SAGEConv(32, 32, "mean")(g, h)


model = Encoder()
params = model.init(jax.random.PRNGKey(0), g, x)
tx = optax.adam(1e-2)
opt = tx.init(params)
tp_r = jnp.asarray(row[train_pos])
tp_c = jnp.asarray(col[train_pos])


@jax.jit
def step(params, opt, key):
    # negative sampling: corrupt destinations uniformly
    neg_c = jax.random.randint(key, tp_r.shape, 0, g.num_nodes())

    def loss_fn(p):
        h = model.apply(p, g, x)
        pos = (h[tp_r] * h[tp_c]).sum(-1)
        neg = (h[tp_r] * h[neg_c]).sum(-1)
        return (optax.sigmoid_binary_cross_entropy(
            pos, jnp.ones_like(pos)).mean()
            + optax.sigmoid_binary_cross_entropy(
                neg, jnp.zeros_like(neg)).mean())

    loss, grads = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(grads, opt)
    return optax.apply_updates(params, up), opt, loss


for i in range(40):
    params, opt, loss = step(params, opt, jax.random.PRNGKey(i))

h = np.asarray(model.apply(params, g, x))
pos_s = (h[row[test_pos]] * h[col[test_pos]]).sum(-1)
neg_s = (h[rng.integers(0, g.num_nodes(), len(test_pos))]
         * h[rng.integers(0, g.num_nodes(), len(test_pos))]).sum(-1)
auc = (pos_s[:, None] > neg_s[None, :]).mean()
print(f"final loss {float(loss):.4f}, AUC-proxy {auc:.3f}")
