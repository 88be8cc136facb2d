"""Model explainers (reference ``python/dgl/nn/pytorch/explain/``:
GNNExplainer, PGExplainer)."""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn


class GNNExplainer:
    """Learn an edge mask (+ feature mask) that preserves the model's
    prediction (reference ``explain/gnnexplainer.py``).

    ``model_fn(g, x, edge_weight) -> logits`` must accept an edge-weight
    array; the explainer optimizes a sigmoid-masked weight vector.
    """

    def __init__(self, model_fn: Callable, num_hops: int, lr: float = 0.01,
                 num_epochs: int = 100, alpha1: float = 0.005,
                 alpha2: float = 1.0, beta1: float = 1.0,
                 beta2: float = 0.1):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.lr = lr
        self.num_epochs = num_epochs
        self.alpha1 = alpha1
        self.alpha2 = alpha2
        self.beta1 = beta1
        self.beta2 = beta2

    def explain_node(self, node_id, graph, feat):
        from ..graph.subgraph import khop_in_subgraph
        sg, inv = khop_in_subgraph(graph, np.array([node_id]),
                                   self.num_hops)
        x = sg.ndata.get("feat", feat[np.asarray(sg.ndata["_ID"])]
                         if "_ID" in sg.ndata else feat)
        center = int(np.asarray(inv)[0])
        target = jax.nn.log_softmax(
            self.model_fn(sg, x, jnp.ones(sg.num_edges())))
        label = int(np.asarray(target[center].argmax()))
        E, F = sg.num_edges(), x.shape[-1]
        key = jax.random.PRNGKey(0)
        params = {
            "edge_mask": jax.random.normal(key, (E,)) * 0.1,
            "feat_mask": jax.random.normal(key, (F,)) * 0.1,
        }
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                em = jax.nn.sigmoid(p["edge_mask"])
                fm = jax.nn.sigmoid(p["feat_mask"])
                logits = self.model_fn(sg, x * fm[None, :], em)
                logp = jax.nn.log_softmax(logits)[center]
                pred_loss = -logp[label]
                # sparsity + entropy regularizers (reference loss terms)
                ent = -(em * jnp.log(em + 1e-12)
                        + (1 - em) * jnp.log(1 - em + 1e-12)).mean()
                fent = -(fm * jnp.log(fm + 1e-12)
                         + (1 - fm) * jnp.log(1 - fm + 1e-12)).mean()
                return (pred_loss + self.alpha1 * em.sum()
                        + self.alpha2 * ent + self.beta1 * fm.mean()
                        + self.beta2 * fent)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(self.num_epochs):
            params, opt_state, loss = step(params, opt_state)
        return (center, sg, jax.nn.sigmoid(params["feat_mask"]),
                jax.nn.sigmoid(params["edge_mask"]))

    def explain_graph(self, graph, feat):
        E, F = graph.num_edges(), feat.shape[-1]
        target = jax.nn.log_softmax(
            self.model_fn(graph, feat, jnp.ones(E)).sum(0))
        label = int(np.asarray(target.argmax()))
        params = {
            "edge_mask": jnp.zeros((E,)),
            "feat_mask": jnp.zeros((F,)),
        }
        tx = optax.adam(self.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                em = jax.nn.sigmoid(p["edge_mask"])
                fm = jax.nn.sigmoid(p["feat_mask"])
                logits = self.model_fn(graph, feat * fm[None, :], em)
                logp = jax.nn.log_softmax(logits.sum(0))
                return (-logp[label] + self.alpha1 * em.sum()
                        + self.beta1 * fm.mean())
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(self.num_epochs):
            params, opt_state, _ = step(params, opt_state)
        return (jax.nn.sigmoid(params["feat_mask"]),
                jax.nn.sigmoid(params["edge_mask"]))


class PGExplainer(nn.Module):
    """Parameterized explainer (reference ``explain/pgexplainer.py``): an
    MLP over concatenated endpoint embeddings predicts edge importance;
    trained across instances."""
    hidden: int = 64

    @nn.compact
    def __call__(self, graph, emb, temperature: float = 1.0, *,
                 rngs_key=None):
        row, col = graph.unit().coo()
        h = jnp.concatenate([jnp.take(emb, row, axis=0),
                             jnp.take(emb, col, axis=0)], axis=-1)
        h = jax.nn.relu(nn.Dense(self.hidden, name="fc1")(h))
        logits = nn.Dense(1, name="fc2")(h).squeeze(-1)
        if rngs_key is not None:
            u = jax.random.uniform(rngs_key, logits.shape, minval=1e-6,
                                   maxval=1 - 1e-6)
            logits = (logits + jnp.log(u) - jnp.log(1 - u)) / temperature
        return jax.nn.sigmoid(logits)
