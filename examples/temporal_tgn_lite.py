"""Temporal link prediction on ICEWS18 (reference examples/pytorch/tgn,
simplified): time-bucketed message passing with learned time encoding;
predict future edges from past structure."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


class TimeEncoder(nn.Module):
    dim: int = 16

    @nn.compact
    def __call__(self, t):
        w = self.param("w", nn.initializers.normal(1.0), (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        return jnp.cos(t[:, None] * w[None] + b[None])


class TGNLite(nn.Module):
    num_nodes: int
    num_rels: int
    dim: int = 32

    @nn.compact
    def __call__(self, g, etypes, etime):
        emb = nn.Embed(self.num_nodes, self.dim, name="node_emb")(
            jnp.arange(self.num_nodes))
        te = TimeEncoder(8)(etime.astype(jnp.float32) / 100.0)
        re = nn.Embed(self.num_rels, 8, name="rel_emb")(etypes)
        g.edata["ef"] = jnp.concatenate([te, re], -1)
        h = dglnn.EdgeGATConv(self.dim, 16, self.dim, num_heads=2)(
            g, emb, g.edata["ef"])
        return jax.nn.relu(h.reshape(self.num_nodes, -1))


def main(epochs=30):
    tr = dgl.data.ICEWS18Dataset("train")
    te = dgl.data.ICEWS18Dataset("test")
    g = tr[0]
    etypes = jnp.asarray(np.asarray(g.edata["rel_type"]), jnp.int32)
    etime = jnp.asarray(np.asarray(g.edata["timestamp"]))
    n = g.num_nodes()
    model = TGNLite(n, tr.num_rels)
    params = model.init(jax.random.PRNGKey(0), g, etypes, etime)
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    # future edges (the test split) are the positives to predict
    fr, fc = (np.asarray(a) for a in te[0].unit().coo())
    fr_j, fc_j = jnp.asarray(fr), jnp.asarray(fc)

    @jax.jit
    def step(params, opt, key):
        nr = jax.random.randint(key, fr_j.shape, 0, n)
        nc = jax.random.randint(jax.random.fold_in(key, 1), fr_j.shape,
                                0, n)

        def loss_fn(p):
            h = model.apply(p, g, etypes, etime)
            pos = (h[fr_j] * h[fc_j]).sum(-1)
            neg = (h[nr] * h[nc]).sum(-1)
            return (optax.sigmoid_binary_cross_entropy(
                pos, jnp.ones_like(pos)).mean() +
                optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    h = np.asarray(model.apply(params, g, etypes, etime))
    pos = (h[fr] * h[fc]).sum(-1)
    rng = np.random.default_rng(0)
    neg = (h[rng.integers(0, n, len(fr))] *
           h[rng.integers(0, n, len(fr))]).sum(-1)
    auc = (pos[:, None] > neg[None, :500]).mean()
    print("future-link AUC", auc)


if __name__ == "__main__":
    main()
