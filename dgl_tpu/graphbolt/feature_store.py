"""Feature stores (reference ``python/dgl/graphbolt/feature_store.py``,
``impl/torch_based_feature_store.py``, ``impl/gpu_cached_feature.py:19``,
``DiskBasedFeature`` via io_uring ``cnumpy.cc``).

TPU-native variants:
* ``ArrayFeature`` — in-memory numpy (host) feature;
* ``DiskBasedFeature`` — numpy memmap (the io_uring analogue: the OS page
  cache plays the async-read role on TPU hosts);
* ``DeviceCachedFeature`` — hot rows pinned in device HBM with host
  fallback (role of the reference's HugeCTR GPU cache).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Feature:
    def read(self, ids=None):
        raise NotImplementedError

    def size(self):
        raise NotImplementedError

    def update(self, value, ids=None):
        raise NotImplementedError


class ArrayFeature(Feature):
    def __init__(self, array):
        self._a = np.asarray(array)

    def read(self, ids=None):
        return self._a if ids is None else self._a[np.asarray(ids)]

    def size(self):
        return self._a.shape[1:]

    def count(self):
        return self._a.shape[0]

    def update(self, value, ids=None):
        if ids is None:
            self._a = np.asarray(value)
        else:
            self._a[np.asarray(ids)] = np.asarray(value)


TorchBasedFeature = ArrayFeature  # name-compat


class DiskBasedFeature(Feature):
    """Memory-mapped .npy on disk (reference ``cnumpy.cc`` OnDiskNpyArray)."""

    def __init__(self, path: str):
        self._a = np.load(path, mmap_mode="r")

    def read(self, ids=None):
        if ids is None:
            return np.asarray(self._a)
        return np.asarray(self._a[np.asarray(ids)])

    def size(self):
        return self._a.shape[1:]

    def count(self):
        return self._a.shape[0]


class DeviceCachedFeature(Feature):
    """Top-k hottest rows live in device HBM; misses fall back to the host
    array (reference ``gpu_cached_feature.py:19`` semantics, degree-based
    static cache policy)."""

    def __init__(self, fallback: Feature, cache_ids):
        self._fallback = fallback
        self._cache_ids = np.asarray(cache_ids)
        self._slot = np.full(fallback.count(), -1, np.int64)
        self._slot[self._cache_ids] = np.arange(len(self._cache_ids))
        self._cache = jnp.asarray(fallback.read(self._cache_ids))

    def read(self, ids=None):
        if ids is None:
            return self._fallback.read()
        ids = np.asarray(ids)
        slots = self._slot[ids]
        hit = slots >= 0
        out = np.empty((len(ids),) + tuple(self._fallback.size()),
                       np.asarray(self._cache).dtype)
        if hit.any():
            out[hit] = np.asarray(
                jnp.take(self._cache, jnp.asarray(slots[hit]), axis=0))
        if (~hit).any():
            out[~hit] = self._fallback.read(ids[~hit])
        return out

    def size(self):
        return self._fallback.size()

    def count(self):
        return self._fallback.count()

    @property
    def hit_info(self):
        return {"cached_rows": len(self._cache_ids)}


GPUCachedFeature = DeviceCachedFeature  # name-compat


class BasicFeatureStore:
    """{(domain, type, name) -> Feature} (reference ``BasicFeatureStore``)."""

    def __init__(self, features: Dict[Tuple[str, Optional[str], str],
                                      Feature]):
        self._features = dict(features)

    def read(self, domain, type_name, feature_name, ids=None):
        return self._features[(domain, type_name, feature_name)].read(ids)

    def size(self, domain, type_name, feature_name):
        return self._features[(domain, type_name, feature_name)].size()

    def update(self, domain, type_name, feature_name, value, ids=None):
        self._features[(domain, type_name, feature_name)].update(value, ids)

    def keys(self):
        return list(self._features.keys())

    def __getitem__(self, key):
        return self._features[key]

    def __setitem__(self, key, value):
        self._features[key] = value
