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


class _MCTSNode:
    """MCTS tree node over a subgraph node-set (reference
    ``explain/subgraphx.py:18``)."""

    __slots__ = ("nodes", "num_visit", "total_reward", "immediate_reward",
                 "children")

    def __init__(self, nodes):
        self.nodes = tuple(sorted(int(v) for v in nodes))
        self.num_visit = 0
        self.total_reward = 0.0
        self.immediate_reward = 0.0
        self.children = []


class SubgraphX:
    """SubgraphX (reference ``explain/subgraphx.py:45``): Monte-Carlo tree
    search over node-subset prunings, scored by a Monte-Carlo Shapley
    value of the model's target-class probability.

    ``model_fn(graph, feat) -> logits (num_classes,)`` is a jitted graph
    classifier; the search itself is host-side (data-dependent subgraph
    shapes), as in the reference.
    """

    def __init__(self, model_fn: Callable, num_hops: int = 2,
                 coef: float = 10.0, high2low: bool = True,
                 num_child: int = 6, num_rollouts: int = 10,
                 node_min: int = 3, shapley_steps: int = 20, seed: int = 0):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.coef = coef
        self.high2low = high2low
        self.num_child = num_child
        self.num_rollouts = num_rollouts
        self.node_min = node_min
        self.shapley_steps = shapley_steps
        self._rng = np.random.default_rng(seed)

    # -- model value of a node coalition (feature-masked) ------------------
    def _value(self, coalition):
        mask = np.zeros((self.graph.num_nodes(), 1), np.float32)
        mask[list(coalition)] = 1.0
        logits = self.model_fn(self.graph, self.feat * jnp.asarray(mask))
        return float(jax.nn.softmax(logits.reshape(-1))[self.target_class])

    def _shapley(self, subgraph_nodes):
        """MC Shapley: marginal contribution of S against sampled
        coalitions from its k-hop neighborhood (reference
        ``subgraphx.py:114``)."""
        S = set(int(v) for v in subgraph_nodes)
        # neighborhood = num_hops-expanded region minus S
        region = set(S)
        frontier = set(S)
        for _ in range(self.num_hops):
            nxt = set()
            for v in frontier:
                nxt |= set(self._nbrs.get(v, ()))
            frontier = nxt - region
            region |= nxt
        outside = sorted(region - S)
        total = 0.0
        for _ in range(self.shapley_steps):
            pick = [v for v in outside if self._rng.random() < 0.5]
            with_s = self._value(S | set(pick))
            without_s = self._value(set(pick)) if pick else \
                self._value(set())
            total += with_s - without_s
        return total / max(self.shapley_steps, 1)

    def _children(self, node: _MCTSNode):
        """Expand by deleting one node (highest/lowest degree first),
        keeping the remainder's largest connected component (reference
        ``get_mcts_children``)."""
        if node.children:
            return node.children
        nodes = list(node.nodes)
        if len(nodes) <= self.node_min:
            return []
        deg = {v: len([u for u in self._nbrs.get(v, ()) if u in
                       set(nodes)]) for v in nodes}
        order = sorted(nodes, key=lambda v: deg[v],
                       reverse=self.high2low)[: self.num_child]
        seen = set()
        for v in order:
            rest = [u for u in nodes if u != v]
            comp = self._largest_component(rest)
            if comp and comp not in seen:
                seen.add(comp)
                child = _MCTSNode(comp)
                child.immediate_reward = self._shapley(comp)
                node.children.append(child)
        return node.children

    def _largest_component(self, nodes):
        nodes_set = set(nodes)
        best = ()
        todo = set(nodes)
        while todo:
            start = todo.pop()
            comp = {start}
            stack = [start]
            while stack:
                v = stack.pop()
                for u in self._nbrs.get(v, ()):
                    if u in nodes_set and u not in comp:
                        comp.add(u)
                        stack.append(u)
                        todo.discard(u)
            if len(comp) > len(best):
                best = tuple(sorted(comp))
        return best

    def _rollout(self, node: _MCTSNode):
        children = self._children(node)
        if not children:
            reward = node.immediate_reward
            node.num_visit += 1
            node.total_reward += reward
            return reward
        total_visits = sum(c.num_visit for c in children) + 1e-9
        def uct(c):
            q = c.total_reward / max(c.num_visit, 1)
            u = self.coef * c.immediate_reward * np.sqrt(total_visits) / (
                1 + c.num_visit)
            return q + u
        best = max(children, key=uct)
        reward = self._rollout(best)
        node.num_visit += 1
        node.total_reward += reward
        return reward

    def explain_graph(self, graph, feat, target_class: int,
                      node_max: int = 10):
        """Returns the best explanatory node subset (np.ndarray)."""
        self.graph = graph
        self.feat = jnp.asarray(feat)
        self.target_class = int(target_class)
        row, col = (np.asarray(a) for a in graph.unit().coo())
        nbrs = {}
        for u, v in zip(row.tolist(), col.tolist()):
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        self._nbrs = {k: tuple(v) for k, v in nbrs.items()}
        root = _MCTSNode(range(graph.num_nodes()))
        for _ in range(self.num_rollouts):
            self._rollout(root)
        # best = highest immediate reward among visited nodes <= node_max
        best, best_r = None, -np.inf
        stack = [root]
        while stack:
            nd = stack.pop()
            if len(nd.nodes) <= node_max and nd.immediate_reward > best_r:
                best, best_r = nd, nd.immediate_reward
            stack.extend(nd.children)
        if best is None:
            best = root
        return np.asarray(best.nodes, np.int64)


class HeteroGNNExplainer:
    """GNNExplainer over heterographs (reference ``gnnexplainer.py:442``):
    learns per-etype edge masks + per-ntype feature masks."""

    def __init__(self, model_fn: Callable, num_hops: int = 1,
                 lr: float = 0.01, num_epochs: int = 100,
                 alpha1: float = 0.005, alpha2: float = 1.0):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.lr = lr
        self.num_epochs = num_epochs
        self.alpha1 = alpha1
        self.alpha2 = alpha2

    def explain_graph(self, graph, feat: dict):
        """Returns ({etype: edge_mask}, {ntype: feat_mask})."""
        masks = {cet: jnp.zeros(graph.num_edges(cet), jnp.float32)
                 for cet in graph.canonical_etypes}
        fmasks = {nt: jnp.zeros(feat[nt].shape[-1], jnp.float32)
                  for nt in feat}
        params = {"e": masks, "f": fmasks}
        logits0 = self.model_fn(graph, feat, None)
        target = int(np.asarray(logits0).reshape(-1).argmax())
        tx = optax.adam(self.lr)
        opt = tx.init(params)

        def loss_fn(p):
            emask = {k: jax.nn.sigmoid(v) for k, v in p["e"].items()}
            fmask = {k: jax.nn.sigmoid(v) for k, v in p["f"].items()}
            xf = {k: feat[k] * fmask[k][None, :] for k in feat}
            logits = self.model_fn(graph, xf, emask).reshape(-1)
            ce = -jax.nn.log_softmax(logits)[target]
            reg = sum(m.sum() for m in emask.values()) * self.alpha1
            ent = sum((-(m * jnp.log(m + 1e-12) + (1 - m) *
                         jnp.log(1 - m + 1e-12))).mean()
                      for m in emask.values()) * self.alpha2
            return ce + reg + ent

        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(grads, opt)
            return optax.apply_updates(params, up), opt, loss

        for _ in range(self.num_epochs):
            params, opt, _ = step(params, opt)
        return ({k: jax.nn.sigmoid(v) for k, v in params["e"].items()},
                {k: jax.nn.sigmoid(v) for k, v in params["f"].items()})


# public alias (reference exports MCTSNode from explain/subgraphx.py)
MCTSNode = _MCTSNode


class HeteroPGExplainer(nn.Module):
    """PGExplainer over heterographs (reference
    ``explain/pgexplainer.py`` hetero variant): one shared MLP scores
    every relation's edges from concatenated endpoint embeddings;
    returns {canonical_etype: edge importance in [0, 1]}."""
    hidden: int = 64

    @nn.compact
    def __call__(self, graph, emb: dict, temperature: float = 1.0, *,
                 rngs_key=None):
        fc1 = nn.Dense(self.hidden, name="fc1")
        fc2 = nn.Dense(1, name="fc2")
        out = {}
        for cet in graph.canonical_etypes:
            st, _, dt = cet
            row, col = graph._units[graph.get_etype_id(cet)].coo()
            h = jnp.concatenate(
                [jnp.take(emb[st], row, axis=0),
                 jnp.take(emb[dt], col, axis=0)], axis=-1)
            logits = fc2(jax.nn.relu(fc1(h))).squeeze(-1)
            if rngs_key is not None:
                key = jax.random.fold_in(rngs_key,
                                         graph.get_etype_id(cet))
                u = jax.random.uniform(key, logits.shape, minval=1e-6,
                                       maxval=1 - 1e-6)
                logits = (logits + jnp.log(u) - jnp.log(1 - u)) \
                    / temperature
            out[cet] = jax.nn.sigmoid(logits)
        return out


class HeteroSubgraphX:
    """SubgraphX over heterographs (reference ``explain/subgraphx.py``
    hetero variant): MCTS over typed node coalitions, scored by MC
    Shapley of ``model_fn(graph, feat_dict) -> logits``."""

    def __init__(self, model_fn: Callable, num_hops: int = 2,
                 coef: float = 10.0, high2low: bool = True,
                 num_child: int = 6, num_rollouts: int = 10,
                 node_min: int = 3, shapley_steps: int = 20,
                 seed: int = 0):
        self.inner = SubgraphX(None, num_hops, coef, high2low, num_child,
                               num_rollouts, node_min, shapley_steps,
                               seed)
        self.model_fn = model_fn

    def explain_graph(self, graph, feat: dict, target_class: int,
                      node_max: int = 10):
        """Returns {ntype: np.ndarray of kept node ids}."""
        # flatten the heterograph: typed node -> global id
        offsets, total = {}, 0
        for nt in graph.ntypes:
            offsets[nt] = total
            total += graph.num_nodes(nt)
        nbrs = {}
        for cet in graph.canonical_etypes:
            st, _, dt = cet
            row, col = (np.asarray(a) for a in
                        graph._units[graph.get_etype_id(cet)].coo())
            for u, v in zip(row + offsets[st], col + offsets[dt]):
                nbrs.setdefault(int(u), set()).add(int(v))
                nbrs.setdefault(int(v), set()).add(int(u))
        inner = self.inner
        inner._nbrs = {k: tuple(v) for k, v in nbrs.items()}
        inner.target_class = int(target_class)

        def value(coalition):
            masked = {}
            for nt in graph.ntypes:
                sel = [g - offsets[nt] for g in coalition
                       if offsets[nt] <= g < offsets[nt]
                       + graph.num_nodes(nt)]
                m = np.zeros((graph.num_nodes(nt), 1), np.float32)
                if sel:
                    m[sel] = 1.0
                masked[nt] = feat[nt] * jnp.asarray(m)
            logits = self.model_fn(graph, masked)
            return float(jax.nn.softmax(
                jnp.asarray(logits).reshape(-1))[inner.target_class])

        inner._value = value
        root = _MCTSNode(range(total))
        for _ in range(inner.num_rollouts):
            inner._rollout(root)
        best, best_r = None, -np.inf
        stack = [root]
        while stack:
            nd = stack.pop()
            if len(nd.nodes) <= node_max and nd.immediate_reward > best_r:
                best, best_r = nd, nd.immediate_reward
            stack.extend(nd.children)
        if best is None:
            best = root
        out = {}
        for nt in graph.ntypes:
            lo = offsets[nt]
            hi = lo + graph.num_nodes(nt)
            out[nt] = np.asarray(
                [g - lo for g in best.nodes if lo <= g < hi], np.int64)
        return out
