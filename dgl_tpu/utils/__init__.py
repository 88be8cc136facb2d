"""Utilities: RNG seeding, checks, small helpers."""
from __future__ import annotations

import threading

import jax
import numpy as np

from . import config

_STATE = threading.local()


def set_seed(value: int) -> None:
    """Seed the framework RNG (reference ``dgl.seed``,
    ``src/random/random.cc``): drives host-side sampling and any Pallas PRNG
    seeds derived from it."""
    _STATE.key = jax.random.PRNGKey(int(value))
    _STATE.np_rng = np.random.default_rng(int(value))


def seed(value: int) -> None:
    set_seed(value)


def next_key():
    """Split and return a fresh jax PRNG key."""
    if not hasattr(_STATE, "key"):
        set_seed(np.random.SeedSequence().entropy % (2 ** 31))
    _STATE.key, sub = jax.random.split(_STATE.key)
    return sub


def np_rng() -> np.random.Generator:
    """The host-side numpy RNG used by samplers."""
    if not hasattr(_STATE, "np_rng"):
        set_seed(np.random.SeedSequence().entropy % (2 ** 31))
    return _STATE.np_rng


def expand_as_pair(input_, g=None):
    """Split a single feature into (src, dst) pair (reference
    ``python/dgl/utils/internal.py expand_as_pair``): on a block the dst
    features are the first ``num_dst`` rows of the src features."""
    if isinstance(input_, tuple):
        return input_
    if g is not None and g.is_block:
        src = input_
        dst = src[: g.num_dst_nodes()]
        return src, dst
    return input_, input_


class Filter:
    """Membership filter over an id universe (reference
    ``python/dgl/utils/filter.py``, C++ ``src/array/filter.cc``):
    ``find_included_indices(q)`` returns positions of q present in the
    filter set."""

    def __init__(self, ids):
        import numpy as np
        self._set = np.unique(np.asarray(ids))

    def find_included_indices(self, test_ids):
        import numpy as np
        t = np.asarray(test_ids)
        return np.nonzero(np.isin(t, self._set))[0]

    def find_excluded_indices(self, test_ids):
        import numpy as np
        t = np.asarray(test_ids)
        return np.nonzero(~np.isin(t, self._set))[0]


def pin_memory_inplace(arr):
    """Reference ``utils/pin_memory.py:8``: pins host memory so the GPU
    can read zero-copy (UVA).  On TPU there is no host-mapped device
    access; the analogue is committed host staging — we return the array
    as a C-contiguous numpy buffer that jax.device_put DMAs from without
    an extra copy."""
    import numpy as np
    return np.ascontiguousarray(arr)


def gather_pinned_tensor_rows(arr, rows):
    """Reference ``utils/pin_memory.py:38`` (UVA gather): host gather +
    device transfer fused through dispatch."""
    import numpy as np
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(arr)[np.asarray(rows)])


class DGLError(Exception):
    """API-parity exception type (reference ``dgl.DGLError``)."""


def combine_names(names, ids=None):
    """Combine selected names into one "+"-joined name (reference
    ``heterograph.py:6610``; used when merging relations)."""
    if ids is None:
        return "+".join(sorted(names))
    return "+".join(sorted(names[i] for i in ids))
