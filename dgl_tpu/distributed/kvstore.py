"""Distributed key-value store for partition-sharded tensors.

Reference: ``python/dgl/distributed/kvstore.py`` — ``KVServer`` (:732),
``KVClient`` (:962), Pull/Push request classes (:19-84).  Same design:
each server owns the rows of every named tensor that fall in its
partition's contiguous id range (RangePartitionBook reshuffle, SURVEY
Appendix B); clients split global ids by partition, pull/push remote rows
over RPC, and read *local* rows through a POSIX shared-memory fast path
(reference ``dist_graph.py:540``, ``src/runtime/shared_mem.cc`` — here
``multiprocessing.shared_memory`` named segments).

Push is asynchronous with gradient-accumulate semantics (``add``), the
contract the sparse optimizers rely on
(``optim/pytorch/sparse_optim.py:184``); call ``rpc.barrier()`` to fence.
"""
from __future__ import annotations

import atexit
from multiprocessing import shared_memory
from typing import Dict, List, Optional

import numpy as np

from . import rpc
from .graph_partition_book import RangePartitionBook, NodePartitionPolicy


def _shm_name(graph_name: str, tensor_name: str, part_id: int) -> str:
    return f"dgltpu_{graph_name}_{tensor_name}_{part_id}"[:250].replace(
        "/", "_")


class BarrierRequest(rpc.Request):
    """Handled inline by the serve loop (rpc.start_server)."""

    def process_request(self, server_state):  # pragma: no cover
        return None


BarrierRequest.service_id = rpc.BARRIER


class PullRequest(rpc.Request):
    def __init__(self, name: str, local_ids: np.ndarray):
        self.name = name
        self.local_ids = local_ids

    def process_request(self, server_state):
        data = server_state.kv.data_store[self.name]
        return PullResponse(data[self.local_ids])


class PullResponse(rpc.Response):
    def __init__(self, data):
        self.data = data


class PushRequest(rpc.Request):
    def __init__(self, name: str, local_ids: np.ndarray, data: np.ndarray,
                 mode: str = "add"):
        self.name = name
        self.local_ids = local_ids
        self.data = data
        self.mode = mode

    def process_request(self, server_state):
        store = server_state.kv.data_store[self.name]
        if self.mode == "add":
            np.add.at(store, self.local_ids, self.data)
        else:
            store[self.local_ids] = self.data
        return None  # async push: no response


class InitDataRequest(rpc.Request):
    def __init__(self, name: str, shape, dtype: str, policy_str: str):
        self.name = name
        self.shape = tuple(shape)
        self.dtype = dtype
        self.policy_str = policy_str

    def process_request(self, server_state):
        server_state.kv.init_data(self.name, self.shape,
                                  np.dtype(self.dtype), self.policy_str)
        return InitDataResponse()


class InitDataResponse(rpc.Response):
    pass


class MetaRequest(rpc.Request):
    def __init__(self, name: str):
        self.name = name

    def process_request(self, server_state):
        kv = server_state.kv
        if self.name not in kv.full_shapes:
            return MetaResponse(None, None, None)
        return MetaResponse(kv.full_shapes[self.name],
                            str(kv.data_store[self.name].dtype),
                            kv.policies[self.name])


class MetaResponse(rpc.Response):
    def __init__(self, shape, dtype, policy_str):
        self.shape = shape
        self.dtype = dtype
        self.policy_str = policy_str


rpc.register_service(rpc.KVSTORE_PULL, PullRequest, PullResponse)
rpc.register_service(rpc.KVSTORE_PUSH, PushRequest)
rpc.register_service(rpc.KVSTORE_INIT, InitDataRequest, InitDataResponse)
rpc.register_service(rpc.KVSTORE_META, MetaRequest, MetaResponse)


class KVServer:
    """Holds the local shard of every named tensor in shared memory
    (reference ``kvstore.py:732``)."""

    def __init__(self, server_id: int, partition_book: RangePartitionBook,
                 graph_name: str = "g"):
        self.server_id = server_id
        self.book = partition_book
        self.graph_name = graph_name
        self.data_store: Dict[str, np.ndarray] = {}
        self.full_shapes: Dict[str, tuple] = {}
        self.policies: Dict[str, str] = {}
        self._shms: List[shared_memory.SharedMemory] = []
        atexit.register(self._cleanup)

    def _part_range(self, policy_str: str):
        kind, ty = policy_str.split("~")
        m = (self.book._node_map if kind == "node" else
             self.book._edge_map)[ty]
        return int(m[self.server_id, 0]), int(m[self.server_id, 1])

    def init_data(self, name: str, full_shape, dtype, policy_str: str,
                  data: Optional[np.ndarray] = None):
        """Allocate the local shard in a named shm segment."""
        if name in self.data_store:
            return
        b, e = self._part_range(policy_str)
        shape = (e - b,) + tuple(full_shape[1:])
        nbytes = max(int(np.prod(shape)) * np.dtype(dtype).itemsize, 1)
        shm_name = _shm_name(self.graph_name, name, self.server_id)
        try:
            shm = shared_memory.SharedMemory(name=shm_name, create=True,
                                             size=nbytes)
        except FileExistsError:
            old = shared_memory.SharedMemory(name=shm_name)
            old.close()
            old.unlink()
            shm = shared_memory.SharedMemory(name=shm_name, create=True,
                                             size=nbytes)
        arr = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
        if data is not None:
            arr[:] = data
        else:
            arr[:] = 0
        self._shms.append(shm)
        self.data_store[name] = arr
        self.full_shapes[name] = tuple(full_shape)
        self.policies[name] = policy_str

    def _cleanup(self):
        for shm in self._shms:
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass
        self._shms = []


class KVClient:
    """Client handle (reference ``kvstore.py:962``): pull/push by global
    ids; rows owned by a co-located server are read straight from shm."""

    def __init__(self, partition_book: RangePartitionBook,
                 graph_name: str = "g", local_server_id: Optional[int] = None):
        self.book = partition_book
        self.graph_name = graph_name
        self.local_server_id = local_server_id
        self._local_cache: Dict[str, np.ndarray] = {}
        self._meta: Dict[str, MetaResponse] = {}

    # -- metadata ----------------------------------------------------------
    def _get_meta(self, name: str) -> MetaResponse:
        if name not in self._meta:
            res = rpc.remote_call(0, MetaRequest(name))
            if res.shape is None:
                raise KeyError(f"kvstore tensor {name!r} not initialized")
            self._meta[name] = res
        return self._meta[name]

    def init_data(self, name: str, shape, dtype=np.float32,
                  part_policy: str = None, init_func=None):
        policy = part_policy or f"node~{self.book.ntypes[0]}"
        ctx = rpc.get_ctx()
        reqs = [InitDataRequest(name, shape, np.dtype(dtype).name, policy)
                for _ in range(ctx.num_servers)]
        rpc.remote_call_multi(list(range(ctx.num_servers)), reqs)
        self._meta[name] = MetaResponse(tuple(shape), np.dtype(dtype).name,
                                        policy)

    def data_name_list(self):
        return list(self._meta.keys())

    def get_data_meta(self, name: str):
        m = self._get_meta(name)
        policy = NodePartitionPolicy(self.book) if \
            m.policy_str.startswith("node") else None
        return np.dtype(m.dtype), m.shape, policy

    # -- local shm fast path -------------------------------------------------
    def _local_view(self, name: str) -> Optional[np.ndarray]:
        if self.local_server_id is None:
            return None
        if name in self._local_cache:
            return self._local_cache[name]
        m = self._get_meta(name)
        kind, ty = m.policy_str.split("~")
        book_map = (self.book._node_map if kind == "node" else
                    self.book._edge_map)[ty]
        b, e = book_map[self.local_server_id]
        shape = (int(e - b),) + tuple(m.shape[1:])
        try:
            shm = shared_memory.SharedMemory(
                name=_shm_name(self.graph_name, name, self.local_server_id))
        except FileNotFoundError:
            return None
        arr = np.ndarray(shape, dtype=np.dtype(m.dtype), buffer=shm.buf)
        # keep the segment alive with the array
        arr._dgltpu_shm = shm  # type: ignore[attr-defined]
        self._local_cache[name] = arr
        return arr

    # -- pull / push ---------------------------------------------------------
    def _split(self, name: str, ids: np.ndarray):
        m = self._get_meta(name)
        kind, ty = m.policy_str.split("~")
        if kind == "node":
            parts = self.book.nid2partid(ids, ty)
            ranges = self.book._node_map[ty]
        else:
            parts = self.book.eid2partid(ids, ty)
            ranges = self.book._edge_map[ty]
        return parts, ranges

    def pull(self, name: str, ids) -> np.ndarray:
        ids = np.asarray(ids).astype(np.int64).ravel()
        parts, ranges = self._split(name, ids)
        m = self._get_meta(name)
        out = np.empty((len(ids),) + tuple(m.shape[1:]), np.dtype(m.dtype))
        server_ids, reqs, slots = [], [], []
        for p in np.unique(parts):
            sel = parts == p
            local = ids[sel] - ranges[p, 0]
            if p == self.local_server_id:
                view = self._local_view(name)
                if view is not None:
                    out[sel] = view[local]
                    continue
            server_ids.append(int(p))
            reqs.append(PullRequest(name, local))
            slots.append(sel)
        if server_ids:
            ress = rpc.remote_call_multi(server_ids, reqs)
            for sel, res in zip(slots, ress):
                out[sel] = res.data
        return out

    def push(self, name: str, ids, data, mode: str = "add"):
        ids = np.asarray(ids).astype(np.int64).ravel()
        data = np.asarray(data)
        parts, ranges = self._split(name, ids)
        for p in np.unique(parts):
            sel = parts == p
            local = ids[sel] - ranges[p, 0]
            if p == self.local_server_id:
                view = self._local_view(name)
                if view is not None:
                    # Synchronous local apply (reference KVClient's shm
                    # fast path, ``distributed/kvstore.py``): push via
                    # async RPC + pull via shm would let a step-N+1 pull
                    # read state from BEFORE the server applied step N's
                    # push — read-modify-write users (dist sparse
                    # optimizers) would silently lose updates.
                    if mode == "add":
                        np.add.at(view, local, data[sel])
                    else:
                        view[local] = data[sel]
                    continue
            rpc.send_request(int(p),
                             PushRequest(name, local, data[sel], mode))

    def barrier(self):
        rpc.barrier()
