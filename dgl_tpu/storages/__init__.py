"""Feature-storage abstraction for dataloader prefetch (reference
``python/dgl/storages/base.py``).  Thin protocol over array-likes; the
GraphBolt feature stores (``dgl_tpu.graphbolt.feature_store``) are the
full implementations — these wrappers keep the reference's module path
and ``fetch(ids, device)`` contract."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class FeatureStorage:
    """Base protocol (reference ``storages/base.py FeatureStorage``)."""

    def requires_ddp(self) -> bool:
        return False

    def fetch(self, indices, device=None, pin_memory=False):
        raise NotImplementedError


class TensorStorage(FeatureStorage):
    """Wrap an in-memory array (reference ``storages/tensor.py``)."""

    def __init__(self, tensor):
        self.storage = tensor

    def fetch(self, indices, device=None, pin_memory=False):
        out = jnp.take(jnp.asarray(self.storage),
                       jnp.asarray(indices, jnp.int32), axis=0)
        if device is not None:
            out = jax.device_put(out, device)
        return out


class NumpyStorage(FeatureStorage):
    """Host-resident numpy (possibly memmap) storage (reference
    ``storages/numpy.py``): gather on host, ship to device."""

    def __init__(self, arr):
        self.storage = np.asarray(arr) if not isinstance(
            arr, np.memmap) else arr

    def fetch(self, indices, device=None, pin_memory=False):
        rows = self.storage[np.asarray(indices)]
        out = jnp.asarray(rows)
        if device is not None:
            out = jax.device_put(out, device)
        return out


def wrap_storage(obj) -> FeatureStorage:
    if isinstance(obj, FeatureStorage):
        return obj
    if isinstance(obj, np.ndarray):
        return NumpyStorage(obj)
    return TensorStorage(obj)
