"""Deep Graph Infomax unsupervised pretraining (reference
examples/pytorch/dgi/): maximize mutual information between node
embeddings and a graph summary vector, negatives = feature-shuffled
graph; then probe the frozen embeddings with logistic regression.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


class Encoder(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GraphConv(x.shape[-1], self.hidden)(g, x)
        return jax.nn.relu(h)


class DGI(nn.Module):
    """Encoder + bilinear discriminator (reference dgi.py DGI/
    Discriminator)."""
    hidden: int = 64

    def setup(self):
        self.encoder = Encoder(self.hidden)
        self.disc_w = self.param("disc_w",
                                 nn.initializers.xavier_uniform(),
                                 (self.hidden, self.hidden))

    def __call__(self, g, x, key):
        h_pos = self.encoder(g, x)              # positives
        perm = jax.random.permutation(key, x.shape[0])
        h_neg = self.encoder(g, x[perm])        # corrupted: shuffled rows
        summary = jax.nn.sigmoid(h_pos.mean(0))
        pos_score = h_pos @ (self.disc_w @ summary)
        neg_score = h_neg @ (self.disc_w @ summary)
        loss = (optax.sigmoid_binary_cross_entropy(
                    pos_score, jnp.ones_like(pos_score)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    neg_score, jnp.zeros_like(neg_score)).mean())
        return loss

    def embed(self, g, x):
        return self.encoder(g, x)


def main(epochs=60):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = jnp.asarray(g.ndata["feat"])
    y = np.asarray(g.ndata["label"])
    model = DGI()
    params = model.init(jax.random.PRNGKey(0), g, x, jax.random.PRNGKey(1))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, g, x, key))(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i + 2))

    emb = model.apply(params, g, x, method=model.embed)
    # frozen-embedding logistic-regression probe
    tm = np.asarray(g.ndata["train_mask"]).astype(bool)
    te = np.asarray(g.ndata["test_mask"]).astype(bool)
    classes = ds.num_classes
    wp = {"w": jnp.zeros((emb.shape[1], classes)),
          "b": jnp.zeros((classes,))}
    ptx = optax.adam(1e-2)
    popt = ptx.init(wp)
    ytr = jnp.asarray(y[tm])
    etr = emb[np.where(tm)[0]]

    @jax.jit
    def pstep(wp, popt):
        def lf(wp):
            return optax.softmax_cross_entropy_with_integer_labels(
                etr @ wp["w"] + wp["b"], ytr).mean()
        loss, grads = jax.value_and_grad(lf)(wp)
        up, popt = ptx.update(grads, popt)
        return optax.apply_updates(wp, up), popt

    for _ in range(150):
        wp, popt = pstep(wp, popt)
    pred = np.asarray(jnp.argmax(emb @ wp["w"] + wp["b"], -1))
    acc = float((pred[te] == y[te]).mean())
    print("probe test acc", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    main(ap.parse_args().epochs)
