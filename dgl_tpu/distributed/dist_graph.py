"""DistGraph / DistTensor / DistEmbedding — the distributed training API.

Reference: ``python/dgl/distributed/dist_graph.py:519``,
``dist_tensor.py:21``, ``nn/pytorch/sparse_emb.py:9``.

TPU-native architecture: one *process per host*, all chips driven by XLA.
What DistDGL does with a KVStore + socket RPC (remote feature pull,
``kvstore.py:962``), this build does with **mesh-sharded jax.Arrays**: a
DistTensor is a row-sharded array over the mesh's ``data`` axis; indexing
remote rows is an XLA gather that rides ICI; gradients flow through the
same collectives.  Sampling runs against the *local partition* on each
host (DistDGL semantics, ``graph_services.py:96-219``).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.graph import Graph, NID, EID
from .graph_partition_book import RangePartitionBook, NodePartitionPolicy
from .partition import load_partition

_DEFAULT_MESH: Optional[Mesh] = None


def initialize(ip_config: Optional[str] = None, num_servers: int = 1,
               num_workers: int = 0, mesh: Optional[Mesh] = None,
               **kwargs):
    """Bootstrap the distributed runtime (reference
    ``dist_context.py:208``).  On TPU: create / adopt the global device
    mesh; multi-host process groups come from ``jax.distributed.initialize``
    which the launcher calls before this."""
    global _DEFAULT_MESH
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("data",))
    _DEFAULT_MESH = mesh
    return mesh


def get_mesh() -> Mesh:
    if _DEFAULT_MESH is None:
        initialize()
    return _DEFAULT_MESH


class DistTensor:
    """Row-sharded dense tensor over the mesh (reference
    ``dist_tensor.py:21``).  ``__getitem__`` with global row ids performs a
    sharded gather (XLA emits the cross-chip collective)."""

    def __init__(self, shape, dtype=jnp.float32, name=None,
                 init_func=None, part_policy=None, mesh=None,
                 persistent=False, data=None):
        self.mesh = mesh or get_mesh()
        axis = self.mesh.axis_names[0]
        ndev = int(np.prod(self.mesh.devices.shape))
        n = shape[0]
        pad = (-n) % ndev
        if data is None:
            if init_func is None:
                arr = jnp.zeros((n + pad,) + tuple(shape[1:]), dtype)
            else:
                arr = init_func((n + pad,) + tuple(shape[1:]), dtype)
        else:
            arr = jnp.asarray(data)
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
        self._shape = tuple(shape)
        spec = NamedSharding(self.mesh, P(axis))
        self._data = jax.device_put(arr, spec)
        self.name = name

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._data.dtype

    def __getitem__(self, idx):
        idx = jnp.asarray(idx, jnp.int32)
        return jnp.take(self._data, idx, axis=0)

    def __setitem__(self, idx, val):
        idx = jnp.asarray(idx, jnp.int32)
        self._data = self._data.at[idx].set(jnp.asarray(val))

    def __len__(self):
        return self._shape[0]

    @property
    def data(self):
        return self._data


class DistEmbedding(DistTensor):
    """Trainable sharded embedding (reference ``distributed/nn/pytorch/
    sparse_emb.py:9``); optimize with ``dgl_tpu.optim.SparseAdam``."""

    def __init__(self, num_embeddings, embedding_dim, name=None,
                 init_func=None, part_policy=None, mesh=None):
        if init_func is None:
            def init_func(shape, dtype):
                key = jax.random.PRNGKey(abs(hash(name or "emb")) % 2 ** 31)
                scale = 1.0 / np.sqrt(shape[-1])
                return jax.random.uniform(key, shape, dtype, -scale, scale)
        super().__init__((num_embeddings, embedding_dim), jnp.float32,
                         name=name, init_func=init_func, mesh=mesh)

    def __call__(self, ids):
        return self[ids]


class KVDistTensor:
    """KVStore-backed distributed tensor (reference ``dist_tensor.py:21``
    in its true client/server form): ``__getitem__`` pulls rows by global
    id over RPC (shm fast path for the co-located partition),
    ``__setitem__`` pushes with overwrite semantics."""

    def __init__(self, kv, name: str, shape=None, dtype=None,
                 part_policy: str = None, init_func=None,
                 persistent: bool = False):
        self.kv = kv
        self.name = name
        if shape is not None and name not in kv._meta:
            # fresh tensor: allocate shards on every server
            kv.init_data(name, shape, dtype or np.float32,
                         part_policy)
            if init_func is not None:
                ids = np.arange(shape[0])
                kv.push(name, ids, np.asarray(
                    init_func(tuple(shape), dtype)), mode="set")
        dt, shp, _ = kv.get_data_meta(name)
        self._shape = tuple(shp)
        self._dtype = dt

    @property
    def shape(self):
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    def __len__(self):
        return self._shape[0]

    def __getitem__(self, idx):
        return jnp.asarray(self.kv.pull(self.name, np.asarray(idx)))

    def __setitem__(self, idx, val):
        self.kv.push(self.name, np.asarray(idx), np.asarray(val),
                     mode="set")


class _KVNDataView:
    """dict-like ndata/edata over kvstore tensors."""

    def __init__(self, kv, names, kind: str):
        self._kv = kv
        self._names = list(names)
        self._kind = kind

    def keys(self):
        return list(self._names)

    def __contains__(self, k):
        return k in self._names

    def __getitem__(self, k) -> KVDistTensor:
        return KVDistTensor(self._kv, k)

    def __setitem__(self, k, tensor: KVDistTensor):
        if k not in self._names:
            self._names.append(k)


class DistGraphRPC:
    """True client/server DistGraph (reference ``dist_graph.py:519``):
    structure queries + sampling go to the partition servers over RPC;
    features are KVStore tensors.  Requires ``dgl_tpu.distributed
    .initialize(ip_config)`` to have connected this process as a client."""

    def __init__(self, graph_name: str, part_config: str,
                 ndata_names=(), edata_names=(), part_id: Optional[int] = None):
        from .partition import load_partition_book
        from .kvstore import KVClient
        from . import dist_context
        self.graph_name = graph_name
        (self._book, name, self._ntypes,
         self._etypes) = load_partition_book(part_config, 0)
        self._kv = KVClient(self._book, graph_name=name,
                            local_server_id=part_id)
        dist_context.set_kvstore(self._kv)
        self.part_id = part_id
        self.local_partition = None
        if part_id is not None:
            from .partition import load_partition
            self.local_partition = load_partition(part_config, part_id)[0]
        self._ndata_names = list(ndata_names)
        self._edata_names = list(edata_names)

    @property
    def ndata(self):
        return _KVNDataView(self._kv, self._ndata_names, "node")

    @property
    def edata(self):
        return _KVNDataView(self._kv, self._edata_names, "edge")

    def get_partition_book(self) -> RangePartitionBook:
        return self._book

    def num_nodes(self, ntype=None):
        return int(self._book._node_map[self._ntypes[0]][-1, 1])

    def num_edges(self, etype=None):
        return int(self._book._edge_map[self._etypes[0]][-1, 1])

    @property
    def ntypes(self):
        return list(self._ntypes)

    @property
    def etypes(self):
        return [e.split(":")[1] if ":" in e else e for e in self._etypes]

    def sample_neighbors(self, seeds, fanout, replace=False, prob=None):
        from .graph_services import sample_neighbors as _dsn
        return _dsn(self, seeds, fanout, replace=replace, prob=prob)

    def barrier(self):
        self._kv.barrier()


class DistGraph:
    """Client view of a partitioned graph (reference
    ``dist_graph.py:519``).  Holds the *local* partition structure for
    sampling plus sharded global feature tensors."""

    def __new__(cls, graph_name: str, part_config: str = None,
                part_id=0, mesh: Optional[Mesh] = None, **kwargs):
        from . import dist_context
        if dist_context.role() == "client":
            return DistGraphRPC(graph_name, part_config,
                                part_id=kwargs.get("rpc_part_id"))
        return super().__new__(cls)

    def __init__(self, graph_name: str, part_config: str = None,
                 part_id: int = 0, mesh: Optional[Mesh] = None, **kwargs):
        self.graph_name = graph_name
        self.mesh = mesh or get_mesh()
        (self._local_g, node_feats, edge_feats, self._book, _,
         self._ntypes, self._etypes) = load_partition(part_config, part_id)
        # global feature tensors: assembled as sharded DistTensors.  Each
        # host contributes its partition; single-host tests just load all.
        self._ndata = {}
        n_total = self._book._node_map[self._ntypes[0]][-1, 1]
        for k, v in node_feats.items():
            dt = DistTensor((int(n_total),) + v.shape[1:],
                            dtype=jnp.asarray(v).dtype, name=k,
                            mesh=self.mesh)
            inner = np.asarray(self._local_g.ndata["inner_node"])
            gnid = np.asarray(self._local_g.ndata[NID])[inner]
            dt[gnid] = v[: inner.sum()]
            self._ndata[k] = dt

    @property
    def ndata(self):
        return self._ndata

    @property
    def local_partition(self) -> Graph:
        return self._local_g

    def get_partition_book(self) -> RangePartitionBook:
        return self._book

    def num_nodes(self, ntype=None):
        return int(self._book._node_map[self._ntypes[0]][-1, 1])

    def num_edges(self, etype=None):
        return int(self._book._edge_map[self._etypes[0]][-1, 1])

    @property
    def ntypes(self):
        return list(self._ntypes)

    @property
    def etypes(self):
        return [e.split(":")[1] if ":" in e else e for e in self._etypes]

    def sample_neighbors(self, seeds, fanout, replace=False, prob=None):
        """Sample from the local partition (halo included) — the DistDGL
        local fast path (``graph_services.py:185-219``).  Seeds are global
        ids; returns a subgraph in global ids."""
        from ..sampling.neighbor import sample_neighbors as _sn
        gnid = np.asarray(self._local_g.ndata[NID])
        g2l = {int(g): i for i, g in enumerate(gnid)}
        local_seeds = np.array([g2l[int(s)] for s in np.asarray(seeds)],
                               np.int64)
        sub = _sn(self._local_g, local_seeds, fanout, replace=replace,
                  prob=prob)
        # translate back to global ids
        row, col = (np.asarray(x) for x in sub.unit().coo())
        from ..graph.convert import graph as make_graph
        out = make_graph((gnid[row], gnid[col]),
                         num_nodes=self.num_nodes())
        out.edata[EID] = np.asarray(sub.edata[EID])
        return out


def node_split(nodes, partition_book=None, ntype="_N", rank=None,
               force_even=True, node_trainer_ids=None):
    """Split a boolean node mask and return this rank's share (reference
    ``distributed/dist_graph.py:1673``).  ``force_even=True`` splits the
    selected ids into near-equal contiguous chunks per trainer (locality
    is preserved under the reshuffled contiguous-range partitioning);
    otherwise each rank takes exactly its partition's nodes."""
    mask = np.asarray(nodes)
    ids = np.nonzero(mask)[0] if mask.dtype == bool else mask
    if rank is None:
        from .rpc import get_ctx
        ctx = get_ctx()
        rank = max(int(getattr(ctx, "rank", 0) or 0), 0)
    world = (partition_book.num_partitions
             if partition_book is not None else 1)
    if force_even or partition_book is None:
        per = -(-len(ids) // max(world, 1))
        return jnp.asarray(ids[rank * per:(rank + 1) * per])
    part = partition_book.nid2partid(ids, ntype)
    return jnp.asarray(ids[part == rank])


def edge_split(edges, partition_book=None, etype="_N:_E:_N", rank=None,
               force_even=True, edge_trainer_ids=None):
    """Edge analogue of :func:`node_split` (reference
    ``dist_graph.py:1772``)."""
    mask = np.asarray(edges)
    ids = np.nonzero(mask)[0] if mask.dtype == bool else mask
    if rank is None:
        from .rpc import get_ctx
        ctx = get_ctx()
        rank = max(int(getattr(ctx, "rank", 0) or 0), 0)
    world = (partition_book.num_partitions
             if partition_book is not None else 1)
    if force_even or partition_book is None:
        per = -(-len(ids) // max(world, 1))
        return jnp.asarray(ids[rank * per:(rank + 1) * per])
    part = partition_book.eid2partid(ids, etype)
    return jnp.asarray(ids[part == rank])
