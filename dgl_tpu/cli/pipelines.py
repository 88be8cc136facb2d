"""Training pipelines for the CLI (reference ``dglgo/dglgo/pipeline/``):
nodepred (full graph), nodepred-ns (neighbor sampling), linkpred,
graphpred.  Each pipeline is (default_config, run(cfg) -> metrics dict).
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np


DATASETS = {
    "cora": lambda: _ds("CoraGraphDataset"),
    "citeseer": lambda: _ds("CiteseerGraphDataset"),
    "pubmed": lambda: _ds("PubmedGraphDataset"),
    "reddit": lambda: _ds("RedditDataset"),
    "minigc": lambda: _ds("MiniGCDataset"),
}


def _ds(name, *args, **kw):
    from .. import data
    return getattr(data, name)(*args, **kw)


def _build_node_model(name: str, in_dim: int, hidden: int, classes: int,
                      num_layers: int = 2, num_heads: int = 4):
    import jax
    import flax.linen as nn
    from .. import nn as dglnn

    class Model(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = x
            for i in range(num_layers):
                out = hidden if i < num_layers - 1 else classes
                if name == "gcn":
                    h = dglnn.GraphConv(h.shape[-1], out)(g, h)
                elif name == "sage":
                    h = dglnn.SAGEConv(h.shape[-1], out, "mean")(g, h)
                elif name == "gat":
                    heads = num_heads if i < num_layers - 1 else 1
                    h = dglnn.GATConv(h.shape[-1], out, heads)(g, h)
                    h = h.reshape(h.shape[0], -1)
                elif name == "sgc":
                    h = dglnn.SGConv(h.shape[-1], out, k=2)(g, h)
                elif name == "gin":
                    h = dglnn.GINConv(nn.Dense(out), "sum")(g, h)
                else:
                    raise ValueError(f"unknown model {name}")
                if i < num_layers - 1:
                    h = jax.nn.relu(h)
            return h

    return Model()


def _train_full(model, g, x, y, train_mask, val_mask, test_mask, cfg):
    import jax
    import jax.numpy as jnp
    import optax
    params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)), g, x)
    tx = optax.adamw(cfg.get("lr", 1e-2),
                     weight_decay=cfg.get("weight_decay", 5e-4))
    opt = tx.init(params)
    tm = jnp.asarray(train_mask)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * tm).sum() / tm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(cfg.get("epochs", 100)):
        params, opt, loss = step(params, opt)
    logits = np.asarray(model.apply(params, g, x))
    pred = logits.argmax(-1)
    yn = np.asarray(y)
    metrics = {
        "loss": float(loss),
        "val_acc": float((pred[val_mask] == yn[val_mask]).mean())
        if val_mask.sum() else 0.0,
        "test_acc": float((pred[test_mask] == yn[test_mask]).mean()),
    }
    save_dir = cfg.get("checkpoint_dir")
    if save_dir:
        from .. import checkpoint as ckpt
        ckpt.save_checkpoint(save_dir, {"params": params, "cfg": cfg},
                             step=cfg.get("epochs", 100))
    return metrics


# ---------------------------------------------------------------------------

def run_nodepred(cfg: Dict) -> Dict:
    """Full-graph node classification (reference pipeline ``nodepred``)."""
    import dgl_tpu as dgl
    ds = DATASETS[cfg["data"]["name"]]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    y = g.ndata["label"]
    model = _build_node_model(cfg["model"]["name"], x.shape[-1],
                              cfg["model"].get("hidden_size", 16),
                              ds.num_classes,
                              cfg["model"].get("num_layers", 2))
    pcfg = dict(cfg.get("general_pipeline", {}))
    if cfg.get("checkpoint_dir"):
        pcfg["checkpoint_dir"] = cfg["checkpoint_dir"]
    return _train_full(model, g, x, y,
                       np.asarray(g.ndata["train_mask"]),
                       np.asarray(g.ndata["val_mask"]),
                       np.asarray(g.ndata["test_mask"]),
                       pcfg)


def run_nodepred_ns(cfg: Dict) -> Dict:
    """Minibatch node classification with neighbor sampling (reference
    pipeline ``nodepred-ns``)."""
    import jax
    import jax.numpy as jnp
    import optax
    import dgl_tpu as dgl
    from ..dataloading import DataLoader, NeighborSampler
    import flax.linen as nn
    from .. import nn as dglnn

    ds = DATASETS[cfg["data"]["name"]]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x_all = g.ndata["feat"]
    y_all = g.ndata["label"]
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
    test_mask = np.asarray(g.ndata["test_mask"])
    pcfg = cfg.get("general_pipeline", {})
    hidden = cfg["model"].get("hidden_size", 32)
    classes = ds.num_classes
    fanouts = cfg.get("sampler", {}).get("fanouts", [10, 10])

    class SAGE(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], hidden,
                                           "mean")(blocks[0], x))
            return dglnn.SAGEConv(hidden, classes, "mean")(blocks[1], h)

    model = SAGE()
    sampler = NeighborSampler(fanouts)
    loader = DataLoader(g, train_ids, sampler,
                        batch_size=pcfg.get("batch_size", 256),
                        shuffle=True)
    tx = optax.adam(pcfg.get("lr", 3e-3))
    params = opt = None
    from ..dataloading.pad import PAD_MASK
    for _ in range(pcfg.get("epochs", 5)):
        for input_nodes, output_nodes, blocks in loader:
            # padded-block contract: features/labels ride the block frames
            xb = blocks[0].srcdata["feat"]
            yb = blocks[-1].dstdata["label"]
            mask = blocks[-1].dstdata[PAD_MASK].astype(jnp.float32)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), blocks, xb)
                opt = tx.init(params)

            def loss_fn(p):
                logits = model.apply(p, blocks, xb)
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb)
                return (ls * mask).sum() / mask.sum()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, up)
    # full-graph inference for eval
    class SAGEFull(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = jax.nn.relu(dglnn.SAGEConv(x.shape[-1], hidden,
                                           "mean")(g, x))
            return dglnn.SAGEConv(hidden, classes, "mean")(g, h)
    logits = np.asarray(SAGEFull().apply(params, g, x_all))
    pred = logits.argmax(-1)
    yn = np.asarray(y_all)
    return {"loss": float(loss),
            "test_acc": float((pred[test_mask] == yn[test_mask]).mean())}


def _build_link_encoder(hidden: int):
    import jax
    import flax.linen as nn
    from .. import nn as dglnn

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = jax.nn.relu(dglnn.GraphConv(x.shape[-1], hidden)(g, x))
            return dglnn.GraphConv(hidden, hidden)(g, h)

    return Encoder()


def _build_graph_model(hidden: int, classes: int):
    import jax
    import flax.linen as nn
    from .. import nn as dglnn

    class GIN(nn.Module):
        @nn.compact
        def __call__(self, bg, x):
            h = jax.nn.relu(dglnn.GINConv(nn.Dense(hidden), "sum")(bg, x))
            h = jax.nn.relu(dglnn.GINConv(nn.Dense(hidden), "sum")(bg, h))
            return nn.Dense(classes)(dglnn.AvgPooling()(bg, h))

    return GIN()


def run_linkpred(cfg: Dict) -> Dict:
    """Link prediction with negative sampling (reference ``linkpred``)."""
    import jax
    import jax.numpy as jnp
    import optax
    import dgl_tpu as dgl

    ds = DATASETS[cfg["data"]["name"]]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    row, col = (np.asarray(a) for a in g.unit().coo())
    rng = np.random.default_rng(0)
    e = len(row)
    perm = rng.permutation(e)
    n_test = e // 10
    test_pos = perm[:n_test]
    train_pos = perm[n_test:]
    hidden = cfg["model"].get("hidden_size", 32)
    model = _build_link_encoder(hidden)
    params = model.init(jax.random.PRNGKey(0), g, x)
    tx = optax.adam(cfg.get("general_pipeline", {}).get("lr", 1e-2))
    opt = tx.init(params)
    tp_r = jnp.asarray(row[train_pos])
    tp_c = jnp.asarray(col[train_pos])

    @jax.jit
    def step(params, opt, key):
        neg_r = jax.random.randint(key, tp_r.shape, 0, g.num_nodes())
        neg_c = jax.random.randint(jax.random.fold_in(key, 1),
                                   tp_r.shape, 0, g.num_nodes())

        def loss_fn(p):
            h = model.apply(p, g, x)
            pos = (h[tp_r] * h[tp_c]).sum(-1)
            neg = (h[neg_r] * h[neg_c]).sum(-1)
            return (optax.sigmoid_binary_cross_entropy(
                pos, jnp.ones_like(pos)).mean() +
                optax.sigmoid_binary_cross_entropy(
                    neg, jnp.zeros_like(neg)).mean())
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    epochs = cfg.get("general_pipeline", {}).get("epochs", 40)
    for i in range(epochs):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
    # AUC-proxy eval: pos scores vs random-neg scores
    h = np.asarray(model.apply(params, g, x))
    pos_s = (h[row[test_pos]] * h[col[test_pos]]).sum(-1)
    neg_r = rng.integers(0, g.num_nodes(), n_test)
    neg_c = rng.integers(0, g.num_nodes(), n_test)
    neg_s = (h[neg_r] * h[neg_c]).sum(-1)
    auc = (pos_s[:, None] > neg_s[None, :]).mean()
    save_dir = (cfg.get("checkpoint_dir")
                or cfg.get("general_pipeline", {}).get("checkpoint_dir"))
    if save_dir:
        from .. import checkpoint as ckpt
        ckpt.save_checkpoint(save_dir, {"params": params, "cfg": cfg},
                             step=epochs)
    return {"loss": float(loss), "test_auc": float(auc)}


def run_graphpred(cfg: Dict) -> Dict:
    """Graph classification (reference ``graphpred``)."""
    import jax
    import jax.numpy as jnp
    import optax
    import dgl_tpu as dgl
    import flax.linen as nn
    from .. import nn as dglnn

    ds = DATASETS[cfg["data"]["name"]]()
    items = [ds[i] for i in range(len(ds))]
    graphs = [t[0] for t in items]
    labels = jnp.asarray(np.asarray([int(t[1]) for t in items]))
    for g in graphs:
        if "feat" not in g.ndata:
            g.ndata["feat"] = np.ones((g.num_nodes(), 1), np.float32)
    bg = dgl.batch(graphs)
    x = bg.ndata["feat"]
    classes = ds.num_classes
    hidden = cfg["model"].get("hidden_size", 32)
    model = _build_graph_model(hidden, classes)
    params = model.init(jax.random.PRNGKey(0), bg, x)
    tx = optax.adam(cfg.get("general_pipeline", {}).get("lr", 5e-3))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, bg, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(grads, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(cfg.get("general_pipeline", {}).get("epochs", 60)):
        params, opt, loss = step(params, opt)
    logits = np.asarray(model.apply(params, bg, x))
    acc = (logits.argmax(-1) == np.asarray(labels)).mean()
    save_dir = (cfg.get("checkpoint_dir")
                or cfg.get("general_pipeline", {}).get("checkpoint_dir"))
    if save_dir:
        from .. import checkpoint as ckpt
        ckpt.save_checkpoint(save_dir, {"params": params, "cfg": cfg},
                             step=cfg.get("general_pipeline",
                                          {}).get("epochs", 60))
    return {"loss": float(loss), "train_acc": float(acc)}


PIPELINES: Dict[str, Callable] = {
    "nodepred": run_nodepred,
    "nodepred-ns": run_nodepred_ns,
    "linkpred": run_linkpred,
    "graphpred": run_graphpred,
}


def get_pipeline(name: str) -> Callable:
    return PIPELINES[name]


def default_config(pipeline: str, data: str = "cora",
                   model: str = "gcn") -> Dict:
    """A recipe skeleton (reference ``dglgo config``)."""
    cfg = {
        "pipeline_name": pipeline,
        "device": "tpu",
        "data": {"name": data},
        "model": {"name": model, "hidden_size": 16, "num_layers": 2},
        "general_pipeline": {"epochs": 100, "lr": 1e-2,
                             "weight_decay": 5e-4, "seed": 0},
    }
    if pipeline == "nodepred-ns":
        cfg["sampler"] = {"fanouts": [10, 10]}
        cfg["general_pipeline"].update(epochs=5, batch_size=256, lr=3e-3)
    if pipeline == "graphpred":
        cfg["data"]["name"] = "minigc" if data == "cora" else data
        cfg["general_pipeline"].update(epochs=60, lr=5e-3)
        cfg["model"]["hidden_size"] = 32
    if pipeline == "linkpred":
        cfg["general_pipeline"].update(epochs=40)
        cfg["model"]["hidden_size"] = 32
    return cfg


def run_apply_nodepred(cfg: Dict, checkpoint_dir: str, output: str) -> Dict:
    """Inference from a saved checkpoint (reference ``dglgo apply``):
    writes predicted labels + logits to ``output`` (.npz)."""
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from .. import checkpoint as ckpt
    state, step = ckpt.load_checkpoint(checkpoint_dir)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    ds = DATASETS[cfg["data"]["name"]]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    model = _build_node_model(cfg["model"]["name"], x.shape[-1],
                              cfg["model"].get("hidden_size", 16),
                              ds.num_classes,
                              cfg["model"].get("num_layers", 2))
    import jax
    params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    logits = np.asarray(model.apply(params, g, x))
    np.savez(output, logits=logits, pred=logits.argmax(-1))
    return {"num_nodes": int(logits.shape[0]), "output": output}


def run_apply_linkpred(cfg: Dict, checkpoint_dir: str, output: str) -> Dict:
    """``dglgo apply`` for link prediction: loads the trained encoder,
    embeds all nodes, scores every existing edge (dot product) and writes
    ``node_emb`` + per-edge ``scores`` to ``output`` (.npz)."""
    import jax
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from .. import checkpoint as ckpt
    state, _ = ckpt.load_checkpoint(checkpoint_dir)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    ds = DATASETS[cfg["data"]["name"]]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    x = g.ndata["feat"]
    model = _build_link_encoder(cfg["model"].get("hidden_size", 32))
    params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    h = np.asarray(model.apply(params, g, x))
    row, col = (np.asarray(a) for a in g.unit().coo())
    scores = (h[row] * h[col]).sum(-1)
    np.savez(output, node_emb=h, src=row, dst=col, scores=scores)
    return {"num_nodes": int(h.shape[0]), "num_edges": int(len(scores)),
            "output": output}


def run_apply_graphpred(cfg: Dict, checkpoint_dir: str, output: str) -> Dict:
    """``dglgo apply`` for graph classification: predicts a class per
    graph in the dataset; writes ``logits`` + ``pred`` to ``output``."""
    import jax
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from .. import checkpoint as ckpt
    state, _ = ckpt.load_checkpoint(checkpoint_dir)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    ds = DATASETS[cfg["data"]["name"]]()
    graphs = [ds[i][0] for i in range(len(ds))]
    for g in graphs:
        if "feat" not in g.ndata:
            g.ndata["feat"] = np.ones((g.num_nodes(), 1), np.float32)
    bg = dgl.batch(graphs)
    model = _build_graph_model(cfg["model"].get("hidden_size", 32),
                               ds.num_classes)
    params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    logits = np.asarray(model.apply(params, bg, bg.ndata["feat"]))
    np.savez(output, logits=logits, pred=logits.argmax(-1))
    return {"num_graphs": int(logits.shape[0]), "output": output}


APPLY_PIPELINES: Dict[str, Callable] = {
    "nodepred": run_apply_nodepred,
    "nodepred-ns": run_apply_nodepred,   # same full-graph inference
    "linkpred": run_apply_linkpred,
    "graphpred": run_apply_graphpred,
}
