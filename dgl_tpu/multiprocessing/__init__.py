"""Fork-safe multiprocessing helpers (reference
``python/dgl/multiprocessing/pytorch.py``): share node/edge features
across worker processes through named POSIX shared memory, so sampler
workers read features zero-copy."""
from __future__ import annotations

import multiprocessing as _mp
from multiprocessing import shared_memory

_LIVE_SEGMENTS = []  # keeps shm segments alive for returned arrays

import numpy as np


def call_once_and_share(fn, shape, dtype, name: str):
    """Run ``fn`` once (rank-0 semantics handled by the caller) and share
    the resulting array via named shm; other processes attach."""
    import atexit
    nbytes = max(int(np.prod(shape)) * np.dtype(dtype).itemsize, 1)
    try:
        shm = shared_memory.SharedMemory(name=name, create=True,
                                         size=nbytes)
        arr = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
        arr[:] = fn()
        atexit.register(lambda: _cleanup(shm, unlink=True))
    except FileExistsError:
        shm = shared_memory.SharedMemory(name=name)
        arr = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
        atexit.register(lambda: _cleanup(shm, unlink=False))
    _LIVE_SEGMENTS.append(shm)  # keep segment alive with the array
    return arr


def _cleanup(shm, unlink):
    try:
        shm.close()
        if unlink:
            shm.unlink()
    except Exception:
        pass


def shared_tensor(shape, dtype=np.float32, name: str = None):
    """Allocate a zero-filled shared array visible to forked/spawned
    workers (reference ``shared_tensor``)."""
    import secrets
    name = name or f"dgltpu_{secrets.token_hex(6)}"
    return call_once_and_share(
        lambda: np.zeros(shape, dtype), shape, dtype, name)


class Process(_mp.Process):
    """Alias kept for reference-API parity (torch-free)."""
