"""Role bootstrap for distributed training.

Reference: ``python/dgl/distributed/dist_context.py:208 initialize`` and
``dist_graph.py:359 DistGraphServer``.  A deployment is N server
processes (one per partition, line i of ``ip_config`` = server i) plus M
client (trainer) processes.  Servers load their partition, host the
KVStore shards in shared memory, and answer sampling/pull/push RPCs;
clients connect, then train — dense gradients ride the XLA mesh
collectives (``jax.distributed``), sparse embedding gradients ride
KVStore push (the reference's NCCL-alltoall plane,
``optim/pytorch/sparse_optim.py:184``, is replaced by these two).

Roles come from env vars set by the launcher (``DGL_TPU_ROLE``,
``DGL_TPU_SERVER_ID``, ``DGL_TPU_CLIENT_ID``, ``DGL_TPU_NUM_CLIENTS``,
``DGL_TPU_IP_CONFIG``, ``DGL_TPU_PART_CONFIG``) or explicit kwargs.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import rpc
from .kvstore import KVServer, KVClient
from .partition import load_partition
from . import graph_services  # noqa: F401  (registers services)

_ROLE = None
_KV_CLIENT: Optional[KVClient] = None


def role() -> Optional[str]:
    return _ROLE


def get_kvstore() -> Optional[KVClient]:
    return _KV_CLIENT


class DistGraphServer:
    """Load a partition and serve it (reference ``dist_graph.py:359``)."""

    def __init__(self, server_id: int, ip_config: str, num_clients: int,
                 part_config: str, disable_shared_mem: bool = False):
        self.server_id = server_id
        self.ip_config = ip_config
        self.num_clients = num_clients
        (g, node_feats, edge_feats, book, graph_name, ntypes,
         etypes) = load_partition(part_config, server_id)
        self.state = rpc.ServerState()
        self.state.graph = g
        self.state.partition_book = book
        self.state.meta = {"graph_name": graph_name, "ntypes": ntypes,
                           "etypes": etypes}
        kv = KVServer(server_id, book, graph_name=graph_name)
        # host every partition feature tensor in shm-backed shards
        n_total = int(book._node_map[ntypes[0]][-1, 1])
        e_total = int(book._edge_map[etypes[0]][-1, 1])
        from ..graph.graph import NID
        inner = np.asarray(g.ndata["inner_node"]).astype(bool)
        n_inner = int(inner.sum())
        for k, v in node_feats.items():
            v = np.asarray(v)
            kv.init_data(k, (n_total,) + v.shape[1:], v.dtype,
                         f"node~{ntypes[0]}", data=v[:n_inner])
        for k, v in edge_feats.items():
            v = np.asarray(v)
            # partition edge feats are exactly the owned contiguous range
            kv.init_data(k, (e_total,) + v.shape[1:], v.dtype,
                         f"edge~{etypes[0]}", data=v)
        self.state.kv = kv

    def start(self, max_idle_ms: int = -1):
        """Blocks until a client sends SHUTDOWN (or idle timeout)."""
        global _ROLE
        _ROLE = "server"
        rpc.start_server(self.server_id, self.ip_config, self.num_clients,
                         self.state, max_idle_ms=max_idle_ms)
        self.state.kv._cleanup()


def initialize(ip_config: Optional[str] = None, num_servers: int = 1,
               num_workers: int = 0, client_id: Optional[int] = None,
               num_clients: Optional[int] = None, mesh=None, **kwargs):
    """Client-side bootstrap.

    Two modes:
    * ``ip_config`` given (or ``DGL_TPU_IP_CONFIG`` set): connect to the
      RPC server fleet — full DistDGL semantics.
    * neither: single-process SPMD mode — returns the device mesh used by
      DistTensor sharding (the pjit path).
    """
    global _ROLE, _KV_CLIENT
    ip_config = ip_config or os.environ.get("DGL_TPU_IP_CONFIG")
    if ip_config:
        _ROLE = "client"
        cid = client_id if client_id is not None else int(
            os.environ.get("DGL_TPU_CLIENT_ID", "0"))
        ncl = num_clients if num_clients is not None else int(
            os.environ.get("DGL_TPU_NUM_CLIENTS", "1"))
        rpc.connect_to_servers(ip_config, cid, ncl)
        return None
    # SPMD fallback (single-controller mesh mode)
    from .dist_graph import initialize as _spmd_init
    _ROLE = "spmd"
    return _spmd_init(mesh=mesh, **kwargs)


def exit_client(shutdown: bool = True):
    """Tear down the client; optionally stop the servers (reference
    ``dist_context.py:330 exit_client``)."""
    global _ROLE, _KV_CLIENT
    if _ROLE == "client":
        if shutdown:
            rpc.shutdown_servers()
        rpc.finalize_client()
    _ROLE = None
    _KV_CLIENT = None


def set_kvstore(client: KVClient):
    global _KV_CLIENT
    _KV_CLIENT = client
