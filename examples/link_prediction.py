"""GraphSAGE link prediction with negative sampling (reference
examples/pytorch/graphsage/link_pred.py)."""
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
    row, col = (np.asarray(a) for a in g.unit().coo())
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(row))
    n_test = len(row) // 10
    test_pos, train_pos = perm[:n_test], perm[n_test:]

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], 64, "mean")(g, x))
            return dglnn.SAGEConv(64, 64, "mean")(g, h)

    model = Encoder()
    pred = dglnn.EdgePredictor("dot")
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    tp_r, tp_c = jnp.asarray(row[train_pos]), jnp.asarray(col[train_pos])

    @jax.jit
    def step(params, opt, key):
        nr = jax.random.randint(key, tp_r.shape, 0, g.num_nodes())
        nc = jax.random.randint(jax.random.fold_in(key, 1), tp_r.shape,
                                0, g.num_nodes())

        def loss_fn(p):
            h = model.apply(p, g, x)
            pos = (h[tp_r] * h[tp_c]).sum(-1)
            neg = (h[nr] * h[nc]).sum(-1)
            return (optax.sigmoid_binary_cross_entropy(
                pos, jnp.ones_like(pos)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    h = np.asarray(model.apply(params, g, x))
    pos_s = (h[row[test_pos]] * h[col[test_pos]]).sum(-1)
    nr = rng.integers(0, g.num_nodes(), n_test)
    nc = rng.integers(0, g.num_nodes(), n_test)
    neg_s = (h[nr] * h[nc]).sum(-1)
    auc = (pos_s[:, None] > neg_s[None, :]).mean()
    print("test AUC", auc)


if __name__ == "__main__":
    main()
