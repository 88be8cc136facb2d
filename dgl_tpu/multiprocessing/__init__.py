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


def graph_to_shared_memory(g, name: str, formats: str = "coo"):
    """Publish a graph's STRUCTURE into a named POSIX shm segment
    (reference ``DGLGraph.shared_memory`` /
    ``src/graph/shared_mem_manager.cc``).  Features are not shared —
    share them with :func:`shared_tensor`.  Returns ``g`` unchanged."""
    import pickle
    arrays = []
    specs = []
    for etid, cet in enumerate(g.canonical_etypes):
        row, col = (np.asarray(a) for a in g._units[etid].coo())
        for tag, arr in (("row", row), ("col", col)):
            arr = np.ascontiguousarray(arr)
            specs.append((etid, tag, arr.dtype.str, arr.shape))
            arrays.append(arr)
    header = pickle.dumps({
        "ntypes": list(g.ntypes),
        "canonical_etypes": [tuple(c) for c in g.canonical_etypes],
        "num_nodes": list(g._num_nodes),
        "specs": specs,
    })
    total = 8 + len(header) + sum(a.nbytes for a in arrays)
    try:
        shm = shared_memory.SharedMemory(name=name, create=True,
                                         size=total)
    except FileExistsError:
        old = shared_memory.SharedMemory(name=name)
        old.close()
        old.unlink()
        shm = shared_memory.SharedMemory(name=name, create=True,
                                         size=total)
    off = 0
    shm.buf[:8] = len(header).to_bytes(8, "little")
    off = 8
    shm.buf[off:off + len(header)] = header
    off += len(header)
    for a in arrays:
        shm.buf[off:off + a.nbytes] = a.tobytes()
        off += a.nbytes
    _LIVE_SEGMENTS.append(shm)
    return g


def hetero_from_shared_memory(name: str):
    """Attach to a graph structure published by
    :func:`graph_to_shared_memory` (reference
    ``dgl.hetero_from_shared_memory``).  The returned graph's edge
    arrays are zero-copy views of the segment."""
    import pickle
    from ..graph.graph import Graph
    from ..graph.unitgraph import UnitGraph
    shm = shared_memory.SharedMemory(name=name)
    _LIVE_SEGMENTS.append(shm)
    hlen = int.from_bytes(bytes(shm.buf[:8]), "little")
    meta = pickle.loads(bytes(shm.buf[8:8 + hlen]))
    off = 8 + hlen
    per_etype = {}
    for etid, tag, dtype, shape in meta["specs"]:
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        arr = np.frombuffer(shm.buf, dtype=np.dtype(dtype), count=int(
            np.prod(shape)), offset=off).reshape(shape)
        off += n
        per_etype.setdefault(etid, {})[tag] = arr
    units = []
    nt_index = {nt: i for i, nt in enumerate(meta["ntypes"])}
    for etid, cet in enumerate(meta["canonical_etypes"]):
        st, _, dt = cet
        units.append(UnitGraph.from_coo(
            meta["num_nodes"][nt_index[st]],
            meta["num_nodes"][nt_index[dt]],
            per_etype[etid]["row"], per_etype[etid]["col"]))
    return Graph(meta["ntypes"], meta["canonical_etypes"],
                 meta["num_nodes"], units)
