"""Distributed sparse optimizers for ``DistEmbedding`` (reference
``python/dgl/distributed/optim/pytorch/sparse_optim.py``: base at :40,
``SparseAdagrad`` at :465, ``SparseAdam`` at :579).

Two backings, matching this repo's two distributed regimes:

* **Mesh mode** (``DistEmbedding``/``DistTensor`` over a jax mesh): the
  optimizer moments are DistTensors with the SAME row sharding as the
  table — O(rows/P) state per chip; the row-sparse apply is jitted, so
  XLA routes the scattered reads/writes through the mesh's collectives.
  This replaces the reference's NCCL all-to-all of gradient rows
  (``sparse_optim.py:143 _comm_step``).
* **KVStore mode** (``KVDistTensor``): moments live in the kvstore as
  ``name + "_mean"`` / ``"_power"`` / ``"_step"`` tensors (the
  reference's naming, ``sparse_optim.py:628-652``); ``step`` pulls only
  the touched rows, updates, and pushes back.

As in the local ``dgl_tpu.optim`` (and the reference ``update()``
semantics at :658-714): duplicate ids are coalesced to the mean
gradient, and Adam bias correction uses a per-row step count so rarely
touched rows are corrected by their own age.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..optim import _coalesce, _adam_apply, _adagrad_apply

__all__ = ["SparseAdam", "SparseAdagrad", "DistSparseAdam",
           "DistSparseAdagrad"]


def _is_kv(p) -> bool:
    return hasattr(p, "kv")


def _padded_rows(p) -> int:
    # mesh-mode DistTensor pads rows to a multiple of the mesh size
    return int(p.data.shape[0])


def _sharded_zeros(p, shape, dtype):
    """State tensor with the same NamedSharding as the embedding data."""
    return jax.device_put(jnp.zeros(shape, dtype), p.data.sharding)


class DistSparseGradOptimizer:
    """Base (reference ``sparse_optim.py:40``).  ``step(grads_and_ids)``
    takes per-param ``(row_ids, grad_rows)`` — explicit under ``jax.grad``,
    so there is no autograd trace to drain."""

    def __init__(self, params: Sequence, lr: float):
        self._params = list(params)
        self.lr = lr
        for p in self._params:
            if not (hasattr(p, "data") or _is_kv(p)):
                raise TypeError(
                    "expects DistEmbedding (mesh) or KVDistTensor-backed "
                    f"embeddings; got {type(p).__name__}")

    def step(self, grads_and_ids: List):
        for p, st, (ids, grad) in zip(self._params, self._state,
                                      grads_and_ids):
            if ids is None or (hasattr(ids, "__len__") and len(ids) == 0):
                continue
            ids, grad = _coalesce(ids, grad)
            if _is_kv(p):
                self._update_kv(p, st, np.asarray(ids),
                                np.asarray(grad, np.float32))
            else:
                self._update_mesh(p, st, ids,
                                  jnp.asarray(grad, jnp.float32))

    def zero_grad(self):
        """No-op (functional gradients); API parity."""

    @property
    def param_groups(self):
        return [{"lr": self.lr}]


class SparseAdam(DistSparseGradOptimizer):
    """Distributed sparse Adam (reference ``sparse_optim.py:579``)."""

    def __init__(self, params: Sequence, lr: float, betas=(0.9, 0.999),
                 eps: float = 1e-8):
        super().__init__(params, lr)
        self.beta1, self.beta2 = betas
        self.eps = eps
        self._state = []
        for p in self._params:
            if _is_kv(p):
                name = p.name
                dim = p.shape[1]
                # reference registers _mean/_power (+ per-row step) in
                # the kvstore (sparse_optim.py:628-652)
                for suffix, width in (("_mean", dim), ("_power", dim),
                                      ("_step", 1)):
                    if name + suffix not in p.kv._meta:
                        p.kv.init_data(name + suffix,
                                       (p.shape[0], width), np.float32,
                                       None)
                self._state.append(name)
            else:
                rows = _padded_rows(p)
                dim = p.data.shape[1]
                self._state.append({
                    "m": _sharded_zeros(p, (rows, dim), jnp.float32),
                    "v": _sharded_zeros(p, (rows, dim), jnp.float32),
                    "t": jnp.zeros(rows, jnp.int32),
                })

    def _update_mesh(self, p, st, ids, grad):
        new_w, st["m"], st["v"], st["t"] = _adam_apply(
            p.data, st["m"], st["v"], st["t"], ids, grad,
            self.lr, self.beta1, self.beta2, self.eps)
        p._data = new_w

    def _update_kv(self, p, name, ids, grad):
        kv = p.kv
        t = kv.pull(name + "_step", ids)[:, 0] + 1.0
        kv.push(name + "_step", ids, t[:, None].astype(np.float32),
                mode="set")
        m = (self.beta1 * kv.pull(name + "_mean", ids)
             + (1 - self.beta1) * grad)
        v = (self.beta2 * kv.pull(name + "_power", ids)
             + (1 - self.beta2) * grad * grad)
        kv.push(name + "_mean", ids, m.astype(np.float32), mode="set")
        kv.push(name + "_power", ids, v.astype(np.float32), mode="set")
        m_hat = m / (1 - self.beta1 ** t[:, None])
        v_hat = v / (1 - self.beta2 ** t[:, None])
        upd = -self.lr * m_hat / (np.sqrt(v_hat) + self.eps)
        kv.push(p.name, ids, upd.astype(np.float32), mode="add")

    @property
    def param_groups(self):
        return [{"lr": self.lr, "betas": (self.beta1, self.beta2),
                 "eps": self.eps}]


class SparseAdagrad(DistSparseGradOptimizer):
    """Distributed sparse Adagrad (reference ``sparse_optim.py:465``)."""

    def __init__(self, params: Sequence, lr: float, eps: float = 1e-10):
        super().__init__(params, lr)
        self.eps = eps
        self._state = []
        for p in self._params:
            if _is_kv(p):
                name = p.name
                if name + "_sum" not in p.kv._meta:
                    p.kv.init_data(name + "_sum", tuple(p.shape),
                                   np.float32, None)
                self._state.append(name)
            else:
                self._state.append({"G": _sharded_zeros(
                    p, p.data.shape, jnp.float32)})

    def _update_mesh(self, p, st, ids, grad):
        new_w, st["G"] = _adagrad_apply(p.data, st["G"], ids, grad,
                                        self.lr, self.eps)
        p._data = new_w

    def _update_kv(self, p, name, ids, grad):
        kv = p.kv
        G = kv.pull(name + "_sum", ids) + grad * grad
        kv.push(name + "_sum", ids, G.astype(np.float32), mode="set")
        upd = -self.lr * grad / (np.sqrt(G) + self.eps)
        kv.push(p.name, ids, upd.astype(np.float32), mode="add")

    @property
    def param_groups(self):
        return [{"lr": self.lr, "eps": self.eps}]


# reference import path is ``dgl.distributed.optim.SparseAdam``; the
# Dist-prefixed aliases match this repo's docs
DistSparseAdam = SparseAdam
DistSparseAdagrad = SparseAdagrad
