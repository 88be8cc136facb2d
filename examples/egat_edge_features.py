"""EGAT: attention from node AND edge features (reference
examples/pytorch/... egatconv usage): edge type/strength modulates
attention; returns updated node + edge representations.

At scale (>= the tiled-SpMM threshold) the layer switches to chunked
flat-layout attention automatically; pass compute_edge_feats=False to
skip the (E, H, De) edge outputs (see docs/performance.md).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=60):
    rng = np.random.default_rng(0)
    n, e = 300, 2400
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl.graph((src, dst), num_nodes=n)
    # planted signal: node label = majority edge "type" of in-edges
    etype = rng.integers(0, 3, e)
    ef = jnp.asarray(np.eye(3, dtype=np.float32)[etype]
                     + rng.normal(scale=0.1, size=(e, 3)))
    lab = np.zeros(n, np.int64)
    for v in range(n):
        mask = dst == v
        lab[v] = np.bincount(etype[mask], minlength=3).argmax() if \
            mask.any() else 0
    labels = jnp.asarray(lab)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    class Net(nn.Module):
        @nn.compact
        def __call__(self, g, x, ef):
            h, f = dglnn.EGATConv(8, 3, 16, 8, num_heads=4)(g, x, ef)
            h = jax.nn.relu(h.reshape(h.shape[0], -1))
            h2, _ = dglnn.EGATConv(64, 32, 3, 8, num_heads=1)(
                g, h, f.reshape(f.shape[0], -1))
            return h2.reshape(h2.shape[0], -1)

    model = Net()
    params = model.init(jax.random.PRNGKey(0), g, x, ef)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, x, ef)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    acc = (np.asarray(model.apply(params, g, x, ef).argmax(-1))
           == lab).mean()
    print("train accuracy", acc)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    main(ap.parse_args().epochs)
