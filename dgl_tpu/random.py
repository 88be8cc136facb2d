"""Random-state control (reference ``python/dgl/random.py``: dgl.seed,
dgl.random.choice backed by the C++ PCG RNG — here numpy PCG64 + jax
PRNG seeding through ``dgl_tpu.utils.seed``)."""
from __future__ import annotations

import numpy as np

from .utils import seed, np_rng


def choice(a, size, replace=True, prob=None):
    """Random choice mirroring ``dgl.random.choice``."""
    rng = np_rng()
    p = None if prob is None else np.asarray(prob, np.float64)
    if p is not None:
        p = p / p.sum()
    return rng.choice(a, size=size, replace=replace, p=p)
