"""Heterogeneous Graph Transformer node classification (reference
examples/pytorch/hgt/): typed K/Q/V attention over a heterograph
flattened to homogeneous form with ntype/etype arrays.  A synthetic
author-paper citation graph with planted paper communities stands in
for ogbn-mag (zero-egress container).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn


def make_data(num_papers=300, num_authors=120, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    com_p = rng.integers(0, classes, num_papers)
    com_a = rng.integers(0, classes, num_authors)
    # papers cite mostly within their community; authors write in theirs
    cite_u, cite_v = [], []
    for p in range(num_papers):
        same = np.where(com_p == com_p[p])[0]
        cite_u += [p] * 4
        cite_v += list(rng.choice(same, 3)) + [rng.integers(num_papers)]
    writes_a, writes_p = [], []
    for a in range(num_authors):
        same = np.where(com_p == com_a[a])[0]
        writes_a += [a] * 3
        writes_p += list(rng.choice(same, 2)) + [rng.integers(num_papers)]
    g = dgl.heterograph({
        ("paper", "cites", "paper"): (np.array(cite_u), np.array(cite_v)),
        ("author", "writes", "paper"): (np.array(writes_a),
                                        np.array(writes_p)),
        ("paper", "written-by", "author"): (np.array(writes_p),
                                            np.array(writes_a)),
    })
    feat_dim = 16
    # weak planted features per node type
    centers = rng.normal(size=(classes, feat_dim))
    g.nodes["paper"].data["feat"] = jnp.asarray(
        (centers[com_p] * 0.5 + rng.normal(
            size=(num_papers, feat_dim))).astype(np.float32))
    g.nodes["author"].data["feat"] = jnp.asarray(
        (centers[com_a] * 0.5 + rng.normal(
            size=(num_authors, feat_dim))).astype(np.float32))
    return g, com_p, com_a, classes


def main(epochs=80):
    g, com_p, com_a, classes = make_data()
    ntype_order = g.ntypes                      # homogenize keeps order
    homo = dgl.to_homogeneous(g, ndata=["feat"])
    ntype = jnp.asarray(np.asarray(homo.ndata[dgl.NTYPE]).astype(np.int32))
    etype = jnp.asarray(np.asarray(homo.edata[dgl.ETYPE]).astype(np.int32))
    x = homo.ndata["feat"]
    # labels in homogeneous node order
    labels = np.concatenate([com_a, com_p] if ntype_order[0] == "author"
                            else [com_p, com_a])
    paper_mask = np.asarray(homo.ndata[dgl.NTYPE]) == \
        ntype_order.index("paper")
    y = jnp.asarray(labels.astype(np.int32))
    rng = np.random.default_rng(1)
    train = rng.random(len(labels)) < 0.6
    train &= paper_mask
    test = (~train) & paper_mask

    class HGT(nn.Module):
        @nn.compact
        def __call__(self, hg, x, ntype, etype):
            h = dglnn.HGTConv(x.shape[-1], 16, 2, len(g.ntypes),
                              len(g.etypes))(hg, x, ntype, etype)
            h = jax.nn.gelu(h)
            return nn.Dense(classes)(h)

    model = HGT()
    params = model.init(jax.random.PRNGKey(0), homo, x, ntype, etype)
    tx = optax.adamw(5e-3)
    opt = tx.init(params)
    tr = jnp.asarray(train)

    @jax.jit
    def step(params, opt):
        def lf(p):
            logits = model.apply(p, homo, x, ntype, etype)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * tr).sum() / tr.sum()
        loss, grads = jax.value_and_grad(lf)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for i in range(epochs):
        params, opt, loss = step(params, opt)

    logits = model.apply(params, homo, x, ntype, etype)
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = float((pred[test] == labels[test]).mean())
    print("paper test acc", acc)
    return acc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    main(ap.parse_args().epochs)
