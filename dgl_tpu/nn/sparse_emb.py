"""NodeEmbedding: large learnable embedding tables (reference
``python/dgl/nn/pytorch/sparse_emb.py:14``).

The reference stores embeddings outside the DDP module and updates them with
a sparse optimizer + NCCL all-to-all.  TPU-native design: the table is a
``jax.Array`` that can be sharded over the mesh (row-sharded); lookups are
``jnp.take`` (XLA inserts the all-to-all when the table is sharded); sparse
updates come from ``dgl_tpu.optim.SparseAdam`` operating on the gathered
rows only.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class NodeEmbedding:
    """A standalone embedding table (not a flax module — it owns its state,
    mirroring the reference design where the table lives outside the
    model)."""

    def __init__(self, num_embeddings: int, embedding_dim: int, name: str,
                 init_func: Optional[Callable] = None, device=None,
                 partition=None):
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        self.name = name
        if init_func is None:
            key = jax.random.PRNGKey(abs(hash(name)) % (2 ** 31))
            scale = 1.0 / np.sqrt(embedding_dim)
            weight = jax.random.uniform(
                key, (num_embeddings, embedding_dim), jnp.float32,
                -scale, scale)
        else:
            weight = init_func(
                jnp.zeros((num_embeddings, embedding_dim), jnp.float32))
        if device is not None:
            weight = jax.device_put(weight, device)
        self.weight = weight

    def __call__(self, node_ids, device=None):
        emb = jnp.take(self.weight, node_ids, axis=0)
        return emb

    @property
    def num_embeddings_(self):
        return self.num_embeddings

    def all_set_embedding(self, values):
        self.weight = jnp.asarray(values)

    def all_get_embedding(self):
        return self.weight
