"""Heterogeneous (multi-relation) node classification with
HeteroGraphConv (reference examples/pytorch/rgcn-hetero pattern):
fraud detection on a 3-relation user graph — per-relation GraphConv
modules + cross-relation aggregation."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=100):
    ds = dgl.data.FraudYelpDataset()
    hg = ds[0]
    y = hg.nodes["user"].data["label"]
    train_mask = jnp.asarray(hg.nodes["user"].data["train_mask"])
    test_mask = np.asarray(hg.nodes["user"].data["test_mask"])
    feats = {"user": jnp.asarray(hg.nodes["user"].data["feature"])}

    class HeteroRGCN(nn.Module):
        @nn.compact
        def __call__(self, hg, x):
            conv1 = dglnn.HeteroGraphConv(
                {et: dglnn.SAGEConv(32, 32, "mean")
                 for et in hg.etypes}, aggregate="sum")
            h = {k: jax.nn.relu(v) for k, v in conv1(hg, x).items()}
            # self feature skip keeps isolated nodes informed
            h = {k: jnp.concatenate([v, x[k]], -1) for k, v in h.items()}
            conv2 = dglnn.HeteroGraphConv(
                {et: dglnn.SAGEConv(64, ds.num_classes, "mean")
                 for et in hg.etypes}, aggregate="sum")
            return conv2(hg, h)

    model = HeteroRGCN()
    params = model.init(jax.random.PRNGKey(0), hg, feats)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, hg, feats)["user"]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * train_mask).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)
    logits = np.asarray(model.apply(params, hg, feats)["user"])
    pred = logits.argmax(-1)
    yn = np.asarray(y)
    acc = (pred[test_mask] == yn[test_mask]).mean()
    # fraud is imbalanced: also report recall on the fraud class
    fraud = test_mask & (yn == 1)
    rec = (pred[fraud] == 1).mean() if fraud.sum() else 0.0
    print(f"test accuracy {acc:.3f}  fraud recall {rec:.3f}")


if __name__ == "__main__":
    main()
