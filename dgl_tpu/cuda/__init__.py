"""Reference ``dgl.cuda`` namespace mapped to TPU equivalents.

The reference exposes NCCL sparse all-to-all (``cuda/nccl.py:7-60``) and
a HugeCTR GPU feature cache (``cuda/gpu_cache.py:24``).  On TPU the
communication plane is XLA collectives over ICI
(``dgl_tpu.parallel.collectives``) and the cache is HBM-resident
(``graphbolt.feature_store.DeviceCachedFeature``).  This shim keeps
reference import paths working and routes to those implementations.
"""
from ..graphbolt.feature_store import DeviceCachedFeature as GPUCache
from ..graphbolt.compat import num_cache_items  # noqa: F401
from . import nccl

__all__ = ["GPUCache", "nccl"]
