"""Cluster-GCN training (reference examples/pytorch/cluster_gcn):
partition the graph into clusters, train on cluster-induced subgraphs.
Synthetic cora stands in for the real download (zero-egress container).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.dataloading import ClusterGCNSampler


def main(epochs=20, k=8, clusters_per_batch=2):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    sampler = ClusterGCNSampler(g, k)
    classes = ds.num_classes

    class GCN(nn.Module):
        @nn.compact
        def __call__(self, sg, x):
            h = jax.nn.relu(dglnn.GraphConv(x.shape[-1], 64)(sg, x))
            return dglnn.GraphConv(64, classes)(sg, h)

    model = GCN()
    params = None
    tx = optax.adam(1e-2)
    opt = None
    rng = np.random.default_rng(0)

    def loss_fn(p, sg, x, y, mask):
        logits = model.apply(p, sg, x)
        ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return (ls * mask).sum() / jnp.maximum(mask.sum(), 1)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for epoch in range(epochs):
        order = rng.permutation(k)
        for i in range(0, k, clusters_per_batch):
            sg = sampler.sample(g, order[i:i + clusters_per_batch])
            x = sg.ndata["feat"]
            y = sg.ndata["label"]
            mask = sg.ndata["train_mask"].astype(jnp.float32)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), sg, x)
                opt = tx.init(params)
            loss, grads = grad_fn(params, sg, x, y, mask)
            up, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, up)

    logits = model.apply(params, g, g.ndata["feat"])
    pred = np.asarray(logits.argmax(-1))
    test = np.asarray(g.ndata["test_mask"]).astype(bool)
    y = np.asarray(g.ndata["label"])
    print("test accuracy", (pred[test] == y[test]).mean())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    main(ap.parse_args().epochs)
