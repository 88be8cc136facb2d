"""TransE knowledge-graph embedding (reference examples/pytorch/TransE /
nn/pytorch/link/transe.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
import flax.linen as nn


class TransEModel(nn.Module):
    num_nodes: int
    num_rels: int
    dim: int = 64

    def setup(self):
        self.ent = nn.Embed(self.num_nodes, self.dim)
        self.rel_scorer = dglnn.TransE(self.num_rels, self.dim)

    def __call__(self, h, r, t):
        return self.rel_scorer(self.ent(h), self.ent(t), r)


def main(epochs=40):
    ds = dgl.data.FB15k237Dataset()
    g = ds[0]
    row, col = (np.asarray(a) for a in g.unit().coo())
    rel = np.asarray(g.edata["etype"])
    train = np.asarray(g.edata["train_mask"]).astype(bool)
    h, r, t = row[train], rel[train], col[train]
    n = g.num_nodes()
    model = TransEModel(n, ds.num_rels)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(h[:2]),
                        jnp.asarray(r[:2]), jnp.asarray(t[:2]))
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    hj, rj, tj = (jnp.asarray(a) for a in (h, r, t))

    @jax.jit
    def step(params, opt, key):
        neg_t = jax.random.randint(key, tj.shape, 0, n)

        def loss_fn(p):
            pos = model.apply(p, hj, rj, tj)
            neg = model.apply(p, hj, rj, neg_t)
            # margin ranking loss; TransE score = -distance (higher=better)
            return jnp.maximum(0.0, 1.0 - pos + neg).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        if i % 10 == 0:
            print(f"epoch {i} loss {float(loss):.4f}")
    # eval: mean rank proxy — pos score vs 100 random corruptions
    test = np.asarray(g.edata["test_mask"]).astype(bool)
    ht, rt, tt = (jnp.asarray(a[test][:500]) for a in (row, rel, col))
    pos = model.apply(params, ht, rt, tt)
    rng = jax.random.PRNGKey(99)
    wins = 0
    for k in range(20):
        neg_t = jax.random.randint(jax.random.fold_in(rng, k),
                                   tt.shape, 0, n)
        neg = model.apply(params, ht, rt, neg_t)
        wins += float((pos > neg).mean())
    print("hit-rate vs random corruption:", wins / 20)


if __name__ == "__main__":
    main()
