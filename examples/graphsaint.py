"""GraphSAINT subgraph-sampled training (reference
examples/pytorch/graphsaint/): train a GCN on stochastic node-/edge-/
walk-budget subgraphs, evaluate full-graph.  Synthetic cora stands in
for the real download (zero-egress container).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
from dgl_tpu.dataloading import SAINTSampler


def main(epochs=30, mode="node", budget=800):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    classes = ds.num_classes
    if mode == "walk":
        budget = (budget // 4, 4)
    sampler = SAINTSampler(mode, budget)

    class GCN(nn.Module):
        @nn.compact
        def __call__(self, sg, x):
            h = jax.nn.relu(dglnn.GraphConv(x.shape[-1], 64)(sg, x))
            return dglnn.GraphConv(64, classes)(sg, h)

    model = GCN()
    params = None
    tx = optax.adam(1e-2)
    opt = None

    def loss_fn(p, sg, x, y, mask):
        logits = model.apply(p, sg, x)
        ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        # GraphSAINT normalizes the loss by sampled-node counts; with a
        # uniform-ish node budget the per-subgraph mean is the estimator
        return (ls * mask).sum() / jnp.maximum(mask.sum(), 1)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for epoch in range(epochs):
        sg = sampler.sample(g, None)
        x, y = sg.ndata["feat"], sg.ndata["label"]
        mask = sg.ndata["train_mask"].astype(jnp.float32)
        if params is None:
            params = model.init(jax.random.PRNGKey(0), sg, x)
            opt = tx.init(params)
        loss, grads = grad_fn(params, sg, x, y, mask)
        up, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, up)

    logits = model.apply(params, g, g.ndata["feat"])
    pred = jnp.argmax(logits, -1)
    tm = np.asarray(g.ndata["test_mask"]).astype(bool)
    acc = float((np.asarray(pred)[tm]
                 == np.asarray(g.ndata["label"])[tm]).mean())
    print("test acc", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--mode", default="node",
                    choices=["node", "edge", "walk"])
    ap.add_argument("--budget", type=int, default=800)
    a = ap.parse_args()
    main(a.epochs, a.mode, a.budget)
