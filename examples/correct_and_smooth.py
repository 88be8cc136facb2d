"""Correct & Smooth (reference examples/pytorch/correct_and_smooth/,
Huang et al. 2021): a graph-agnostic MLP base predictor, then two
label-propagation post-processing passes — (1) propagate the training
residual errors to correct the soft predictions, (2) propagate with
known train labels clamped to smooth them.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def main(epochs=100):
    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    y = np.asarray(g.ndata["label"])
    classes = ds.num_classes
    tm = np.asarray(g.ndata["train_mask"]).astype(bool)
    te = np.asarray(g.ndata["test_mask"]).astype(bool)
    ytr = jnp.asarray(y)
    trmask = jnp.asarray(tm.astype(np.float32))

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = jax.nn.relu(nn.Dense(64)(x))
            return nn.Dense(classes)(h)

    model = MLP()
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            ls = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x), ytr)
            return (ls * trmask).sum() / trmask.sum()
        loss, grads = jax.value_and_grad(lf)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(epochs):
        params, opt, loss = step(params, opt)

    soft = jax.nn.softmax(model.apply(params, x), -1)
    base_acc = float((np.asarray(jnp.argmax(soft, -1))[te] == y[te]).mean())

    # --- Correct: propagate train residuals (autoscale per the paper) ---
    yhot = jax.nn.one_hot(ytr, classes)
    err = (yhot - soft) * trmask[:, None]
    lp_err = dglnn.LabelPropagation(k=20, alpha=0.9, clamp=False)
    smoothed_err = lp_err.apply({}, g, err)
    sigma = jnp.abs(err).sum() / jnp.maximum(trmask.sum(), 1.0)
    scale = sigma / jnp.maximum(
        jnp.abs(smoothed_err).sum(-1, keepdims=True), 1e-9)
    corrected = soft + jnp.clip(scale, 0, 1.0) * smoothed_err

    # --- Smooth: clamp train rows to ground truth, propagate ---
    h = jnp.where(trmask[:, None] > 0, yhot, corrected)
    lp_sm = dglnn.LabelPropagation(k=20, alpha=0.8, clamp=False)
    final = lp_sm.apply({}, g, h)

    acc = float((np.asarray(jnp.argmax(final, -1))[te] == y[te]).mean())
    print("base MLP acc", base_acc)
    print("C&S test acc", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    main(ap.parse_args().epochs)
