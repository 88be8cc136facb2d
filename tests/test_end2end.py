"""End-to-end training gates (reference GATE #1 in SURVEY.md §7):
full-batch GCN / GAT / SAGE on the (synthetic) Cora reaching high accuracy.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import dgl_tpu as dgl
from dgl_tpu import nn as dglnn
import flax.linen as nn


@pytest.fixture(scope="module")
def cora():
    ds = dgl.data.CoraGraphDataset()
    g = ds[0]
    g = dgl.add_self_loop(dgl.remove_self_loop(g))
    return g, ds.num_classes


class GCN(nn.Module):
    hidden: int
    num_classes: int

    @nn.compact
    def __call__(self, g, x):
        h = dglnn.GraphConv(x.shape[-1], self.hidden,
                            activation=jax.nn.relu)(g, x)
        return dglnn.GraphConv(self.hidden, self.num_classes)(g, h)


def _train(model_fn, g, num_classes, epochs=100, lr=1e-2):
    x = g.ndata["feat"]
    y = g.ndata["label"]
    train_mask = np.asarray(g.ndata["train_mask"])
    test_mask = np.asarray(g.ndata["test_mask"])
    model = model_fn()
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    tm = jnp.asarray(train_mask)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * tm).sum() / tm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, g, x)
    pred = np.asarray(logits.argmax(-1))
    yn = np.asarray(y)
    return (pred[test_mask] == yn[test_mask]).mean()


def test_gcn_cora_accuracy(cora):
    g, c = cora
    acc = _train(lambda: GCN(16, c), g, c, epochs=100)
    # synthetic planted graph is separable: expect >= 0.75 (analogous to the
    # reference golden ~0.81 on real cora, examples/pytorch/gcn/README.md:19)
    assert acc >= 0.75, f"GCN accuracy too low: {acc}"


def test_gat_cora_accuracy(cora):
    g, c = cora

    class GAT(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = dglnn.GATConv(x.shape[-1], 8, num_heads=4)(g, x)
            h = jax.nn.elu(h.reshape(h.shape[0], -1))
            h = dglnn.GATConv(h.shape[-1], c, num_heads=1)(g, h)
            return h.reshape(h.shape[0], -1)

    acc = _train(lambda: GAT(), g, c, epochs=60)
    assert acc >= 0.70, f"GAT accuracy too low: {acc}"


def test_sage_cora_accuracy(cora):
    g, c = cora

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], 16, "mean")(g, x))
            return dglnn.SAGEConv(16, c, "mean")(g, h)

    acc = _train(lambda: SAGE(), g, c, epochs=100)
    assert acc >= 0.75, f"SAGE accuracy too low: {acc}"


def test_rgcn_entity_classification():
    ds = dgl.data.AIFBDataset()
    g = ds[0]
    c = ds.num_classes
    # homogeneous view with etype array
    etype_list = []
    rows, cols = [], []
    for i, cet in enumerate(g.canonical_etypes):
        r, cc = g.unit(cet).coo()
        rows.append(np.asarray(r))
        cols.append(np.asarray(cc))
        etype_list.append(np.full(len(np.asarray(r)), i))
    row = np.concatenate(rows)
    col = np.concatenate(cols)
    et = jnp.asarray(np.concatenate(etype_list).astype(np.int32))
    hg = dgl.graph((row, col), num_nodes=g.num_nodes("_N"))
    y = g.nodes["_N"].data["label"]
    train_mask = jnp.asarray(g.nodes["_N"].data["train_mask"])
    test_mask = np.asarray(g.nodes["_N"].data["test_mask"])
    num_rels = len(g.canonical_etypes)

    class RGCN(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = dglnn.RelGraphConv(16, 16, num_rels, regularizer="basis",
                                   num_bases=4,
                                   activation=jax.nn.relu)(g, x, et)
            return dglnn.RelGraphConv(16, c, num_rels, regularizer="basis",
                                      num_bases=4, self_loop=False)(g, h, et)

    n = hg.num_nodes()
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, 16)).astype(np.float32))
    model = RGCN()
    params = model.init(jax.random.PRNGKey(0), hg, x0)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, hg, x0)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * train_mask).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, hg, x0)
    pred = np.asarray(logits.argmax(-1))
    yn = np.asarray(y)
    acc = (pred[test_mask] == yn[test_mask]).mean()
    assert acc >= 0.6, f"RGCN accuracy too low: {acc}"


def test_graph_classification():
    ds = dgl.data.TUDataset("SYNTH")
    graphs_and_labels = [ds[i] for i in range(len(ds))]
    graphs = [t[0] for t in graphs_and_labels]
    labels = jnp.asarray(np.array([int(t[1]) for t in graphs_and_labels]))
    for g in graphs:
        pass
    bg = dgl.batch(graphs)
    c = ds.num_classes

    class GIN(nn.Module):
        @nn.compact
        def __call__(self, bg, x):
            h = dglnn.GINConv(apply_func=nn.Dense(32),
                              aggregator_type="sum")(bg, x)
            h = jax.nn.relu(h)
            h = dglnn.GINConv(apply_func=nn.Dense(32),
                              aggregator_type="sum")(bg, h)
            pooled = dglnn.AvgPooling()(bg, h)
            return nn.Dense(c)(pooled)

    x = bg.ndata["feat"]
    model = GIN()
    params = model.init(jax.random.PRNGKey(0), bg, x)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, bg, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, bg, x)
    acc = (np.asarray(logits.argmax(-1)) == np.asarray(labels)).mean()
    assert acc >= 0.8, f"graph classification accuracy too low: {acc}"
