"""Array helpers that keep host-pipeline work on numpy.

Sampling / block construction is host work; features stored as numpy must
never bounce through the accelerator (on a TPU-tunnel setup every stray
``jnp`` op is a network round trip).  These helpers dispatch on array type:
numpy in -> numpy out; jax in -> jax out.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


import os
# OpenMP row gather beats numpy fancy indexing only with real cores to
# fan out over; default by core count, env var forces either way.
_env = os.environ.get("DGL_TPU_NATIVE_GATHER")
_NATIVE_GATHER = ((os.cpu_count() or 1) >= 4 if _env is None
                  else _env != "0")


def is_host(x) -> bool:
    return isinstance(x, np.ndarray)


def take_rows(v, idx):
    if isinstance(v, np.ndarray):
        idx = np.asarray(idx)
        # csrc.gather_rows (OpenMP row memcpy) exists for many-core
        # hosts, but this container exposes ONE core (nproc=1) where
        # numpy fancy indexing wins — opt in via DGL_TPU_NATIVE_GATHER
        if _NATIVE_GATHER and v.nbytes > (1 << 22) and len(idx) > 4096:
            from .. import csrc
            out = csrc.gather_rows(v, idx)
            if out is not None:
                return out
        return v[idx]
    return jnp.take(v, jnp.asarray(idx, jnp.int32), axis=0)


def concat(arrs):
    if all(isinstance(a, np.ndarray) for a in arrs):
        return np.concatenate(arrs, axis=0)
    return jnp.concatenate([jnp.asarray(a) for a in arrs], axis=0)


def zeros_like_rows(v, n):
    if isinstance(v, np.ndarray):
        return np.zeros((n,) + v.shape[1:], v.dtype)
    return jnp.zeros((n,) + v.shape[1:], v.dtype)


def pad_rows(v, total):
    pad = total - v.shape[0]
    if pad <= 0:
        return v
    return concat([v, zeros_like_rows(v, pad)])


def asarray_host(v):
    return np.asarray(v)
