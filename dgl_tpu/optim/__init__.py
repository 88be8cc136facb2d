"""Sparse optimizers for embedding tables (reference
``python/dgl/optim/pytorch/sparse_optim.py``: ``SparseGradOptimizer`` at
:19, ``SparseAdagrad`` at :509, ``SparseAdam`` at :647).

TPU-native design: rather than NCCL all-to-all of sparse gradient rows
(reference ``_comm_step`` at :143) or shared-memory grad shuttling
(``_shared_step`` at :202), the embedding table and its optimizer moments
are row-sharded ``jax.Array``s; updates touch only the gathered rows and
XLA routes the scattered writes through the sharding's collective.  The
UVA/pinned-memory staging of the reference (``_setup_uva`` at :729) has no
TPU analog and is intentionally absent.

Semantics matched to the reference ``update()`` (:814):

* duplicate indices in a minibatch are coalesced — the gradient of each
  unique row is the **mean** over its duplicates (reference :857-884);
* Adam keeps a **per-row step count** used for bias correction, so rarely
  touched rows are corrected by their own age (reference ``state_step``);
* moments are stored fp32 per row and only touched rows are read/written.
"""
from __future__ import annotations


from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _coalesce(ids, grad):
    """Unique the row ids and mean-reduce duplicate gradients (reference
    ``sparse_optim.py:857-884``: ``th.unique`` + ``index_add_`` / counts).

    Runs on host (ids are concrete between train steps — the optimizer is a
    host-side loop, like the reference's)."""
    ids = np.asarray(ids).reshape(-1)
    grad = jnp.asarray(grad)
    uniq, inverse, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
    if len(uniq) == len(ids):
        return jnp.asarray(ids.astype(np.int32)), grad
    summed = jax.ops.segment_sum(grad, jnp.asarray(inverse),
                                 num_segments=len(uniq))
    mean = summed / jnp.asarray(cnt, grad.dtype)[:, None]
    return jnp.asarray(uniq.astype(np.int32)), mean


# NOTE: no donate_argnums — table/moment arrays are user-visible objects
# that may be aliased (e.g. ``all_set_embedding(other.weight)``); donation
# would invalidate the alias.
@jax.jit
def _adam_apply(w, m, v, t, ids, grad, lr, beta1, beta2, eps):
    t = t.at[ids].add(1)
    ti = jnp.take(t, ids).astype(jnp.float32)[:, None]
    m_rows = beta1 * jnp.take(m, ids, axis=0) + (1 - beta1) * grad
    v_rows = beta2 * jnp.take(v, ids, axis=0) + (1 - beta2) * grad * grad
    m_hat = m_rows / (1 - beta1 ** ti)
    v_hat = v_rows / (1 - beta2 ** ti)
    upd = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    return (w.at[ids].add(-upd.astype(w.dtype)),
            m.at[ids].set(m_rows), v.at[ids].set(v_rows), t)


@jax.jit
def _adagrad_apply(w, G, ids, grad, lr, eps):
    G_rows = jnp.take(G, ids, axis=0) + grad * grad
    upd = lr * grad / (jnp.sqrt(G_rows) + eps)
    return (w.at[ids].add(-upd.astype(w.dtype)), G.at[ids].set(G_rows))


class SparseGradOptimizer:
    """Base of row-sparse embedding optimizers (reference
    ``optim/pytorch/sparse_optim.py:19``).

    ``step(grads_and_ids)`` takes per-param ``(row_ids, grad_rows)`` pairs —
    the JAX analog of the reference's autograd trace (grads are explicit
    under ``jax.grad``, so there is no hidden trace to drain)."""

    def __init__(self, params: Sequence, lr: float):
        self._params = list(params)
        self.lr = lr
        for p in self._params:
            if not hasattr(p, "weight"):
                raise TypeError(
                    "SparseGradOptimizer expects NodeEmbedding-like params "
                    f"with a .weight; got {type(p).__name__}")

    # -- shared plumbing ---------------------------------------------------
    def _table_shape(self, p):
        if hasattr(p, "num_embeddings"):
            return (p.num_embeddings, p.embedding_dim)
        return tuple(p.weight.shape)

    def _write_weight(self, p, new_w):
        if hasattr(p, "all_set_embedding"):
            p.all_set_embedding(new_w)
        else:
            p.weight = new_w

    def step(self, grads_and_ids: List):
        """Apply one sparse update.

        grads_and_ids: per-param ``(row_ids, grad_rows)``; duplicate ids are
        coalesced to the mean gradient (reference semantics)."""
        for p, st, (ids, grad) in zip(self._params, self._state,
                                      grads_and_ids):
            if ids is None or (hasattr(ids, "__len__") and len(ids) == 0):
                continue
            ids, grad = _coalesce(ids, grad)
            self._update(p, st, ids, grad)

    def _update(self, p, st, ids, grad):
        raise NotImplementedError

    def zero_grad(self):
        """No-op (JAX gradients are functional); kept for API parity."""

    # -- checkpointing (reference :455 state_dict / :476 load_state_dict) --
    def state_dict(self):
        return {
            "state": {p.name if hasattr(p, "name") else str(i):
                      {k: np.asarray(v) for k, v in st.items()}
                      for i, (p, st) in enumerate(zip(self._params,
                                                      self._state))},
            "param_groups": self.param_groups,
        }

    def load_state_dict(self, state_dict):
        for i, (p, st) in enumerate(zip(self._params, self._state)):
            name = p.name if hasattr(p, "name") else str(i)
            saved = state_dict["state"][name]
            for k in st:
                st[k] = jnp.asarray(saved[k])
        self._set_param_groups(state_dict["param_groups"])

    @property
    def param_groups(self):
        """Hyper-parameters only — like the reference (:497), embeddings are
        deliberately not included (fetching whole tables is expensive)."""
        return [{"lr": self.lr}]

    def _set_param_groups(self, groups):
        self.lr = groups[0]["lr"]


class SparseAdam(SparseGradOptimizer):
    """Adam applied only to rows touched in the step, with per-row step
    counts for bias correction (reference ``sparse_optim.py:647``)."""

    def __init__(self, params: Sequence, lr: float, betas=(0.9, 0.999),
                 eps: float = 1e-8):
        super().__init__(params, lr)
        self.beta1, self.beta2 = betas
        self.eps = eps
        self._state = []
        for p in self._params:
            shape = self._table_shape(p)
            self._state.append({
                "m": jnp.zeros(shape, jnp.float32),
                "v": jnp.zeros(shape, jnp.float32),
                "t": jnp.zeros(shape[0], jnp.int32),
            })

    def _update(self, p, st, ids, grad):
        new_w, st["m"], st["v"], st["t"] = _adam_apply(
            p.weight, st["m"], st["v"], st["t"], ids,
            jnp.asarray(grad, jnp.float32),
            self.lr, self.beta1, self.beta2, self.eps)
        self._write_weight(p, new_w)

    @property
    def param_groups(self):
        return [{"lr": self.lr, "betas": (self.beta1, self.beta2),
                 "eps": self.eps}]

    def _set_param_groups(self, groups):
        g = groups[0]
        self.lr = g["lr"]
        self.beta1, self.beta2 = g["betas"]
        self.eps = g["eps"]


class SparseAdagrad(SparseGradOptimizer):
    """Adagrad on touched rows (reference ``sparse_optim.py:509``)."""

    def __init__(self, params: Sequence, lr: float, eps: float = 1e-10):
        super().__init__(params, lr)
        self.eps = eps
        self._state = [{"G": jnp.zeros(self._table_shape(p), jnp.float32)}
                       for p in self._params]

    def _update(self, p, st, ids, grad):
        new_w, st["G"] = _adagrad_apply(
            p.weight, st["G"], ids, jnp.asarray(grad, jnp.float32),
            self.lr, self.eps)
        self._write_weight(p, new_w)

    @property
    def param_groups(self):
        return [{"lr": self.lr, "eps": self.eps}]

    def _set_param_groups(self, groups):
        self.lr = groups[0]["lr"]
        self.eps = groups[0]["eps"]
