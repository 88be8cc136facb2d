"""Sparse optimizers for embedding tables (reference
``python/dgl/optim/pytorch/sparse_optim.py:509 SparseAdam, :647
SparseAdagrad``).

TPU-native design: rather than NCCL all-to-all of sparse gradient rows, the
embedding table (and its optimizer moments) are row-sharded ``jax.Array``s;
updates are scatter-applied only to the touched rows.  XLA routes the
scattered update through the sharding's collective automatically.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class SparseAdam:
    """Adam applied only to rows touched in the step (lazy moments)."""

    def __init__(self, params: Sequence, lr: float, betas=(0.9, 0.999),
                 eps: float = 1e-8):
        self._params = list(params)   # NodeEmbedding / DistEmbedding objects
        self.lr = lr
        self.beta1, self.beta2 = betas
        self.eps = eps
        self._state = []
        for p in self._params:
            shape = (p.num_embeddings, p.embedding_dim) if hasattr(
                p, "num_embeddings") else p.weight.shape
            self._state.append({
                "m": jnp.zeros(shape, jnp.float32),
                "v": jnp.zeros(shape, jnp.float32),
                "t": jnp.zeros(shape[0], jnp.int32),
            })

    def step(self, grads_and_ids: List):
        """grads_and_ids: per-param (row_ids, grad_rows) pairs — the output
        of ``jax.grad`` restricted to gathered rows."""
        for p, st, (ids, grad) in zip(self._params, self._state,
                                      grads_and_ids):
            ids = jnp.asarray(ids, jnp.int32)
            t = st["t"].at[ids].add(1)
            ti = jnp.take(t, ids).astype(jnp.float32)[:, None]
            m_rows = jnp.take(st["m"], ids, axis=0)
            v_rows = jnp.take(st["v"], ids, axis=0)
            m_rows = self.beta1 * m_rows + (1 - self.beta1) * grad
            v_rows = self.beta2 * v_rows + (1 - self.beta2) * grad * grad
            m_hat = m_rows / (1 - self.beta1 ** ti)
            v_hat = v_rows / (1 - self.beta2 ** ti)
            upd = self.lr * m_hat / (jnp.sqrt(v_hat) + self.eps)
            st["m"] = st["m"].at[ids].set(m_rows)
            st["v"] = st["v"].at[ids].set(v_rows)
            st["t"] = t
            new_w = p.weight.at[ids].add(-upd)
            if hasattr(p, "all_set_embedding"):
                p.all_set_embedding(new_w)
            else:
                p.weight = new_w

    def zero_grad(self):
        pass


class SparseAdagrad:
    """Adagrad on touched rows (reference ``sparse_optim.py:647``)."""

    def __init__(self, params: Sequence, lr: float, eps: float = 1e-10):
        self._params = list(params)
        self.lr = lr
        self.eps = eps
        self._state = []
        for p in self._params:
            shape = (p.num_embeddings, p.embedding_dim) if hasattr(
                p, "num_embeddings") else p.weight.shape
            self._state.append({"G": jnp.zeros(shape, jnp.float32)})

    def step(self, grads_and_ids: List):
        for p, st, (ids, grad) in zip(self._params, self._state,
                                      grads_and_ids):
            ids = jnp.asarray(ids, jnp.int32)
            G_rows = jnp.take(st["G"], ids, axis=0) + grad * grad
            st["G"] = st["G"].at[ids].set(G_rows)
            upd = self.lr * grad / (jnp.sqrt(G_rows) + self.eps)
            new_w = p.weight.at[ids].add(-upd)
            if hasattr(p, "all_set_embedding"):
                p.all_set_embedding(new_w)
            else:
                p.weight = new_w


class SparseGradOptimizer:
    """Abstract base of row-sparse embedding optimizers (reference
    ``optim/pytorch/sparse_optim.py:184 SparseGradOptimizer``): concrete
    subclasses are :class:`SparseAdam` and :class:`SparseAdagrad`."""

    def __init__(self, params, lr):
        self._params = list(params)
        self.lr = lr

    def step(self, *args, **kwargs):
        raise NotImplementedError

    def zero_grad(self):
        pass
