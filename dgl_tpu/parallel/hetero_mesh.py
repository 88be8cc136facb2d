"""Heterogeneous mesh-sharded graphs: the multi-etype ``MeshGraph``.

Round 3's ``MeshGraph`` was explicitly single-etype — DistDGL's actual
client is fully heterogeneous (reference
``python/dgl/distributed/dist_graph.py:519`` serves every ntype/etype
through one partition book).  This module closes that gap TPU-natively:

* each node type gets its OWN equal-range partition over the mesh axis
  (per-ntype partition books, reference
  ``distributed/graph_partition_book.py:541``), derived from one METIS
  run over the homogenized graph so co-referenced nodes co-locate;
* each canonical edge type gets its own halo plane
  (``spmd.build_halo_bipartite``): edges partitioned by dst owner, src
  boundary rows of the *src ntype's* space riding the all_to_all;
* ``HeteroMeshGraph`` exposes the ``Graph`` hetero surface
  (``nodes[nt].data`` / ``edges[et].data`` / ``update_all(etype=...)``
  / ``multi_update_all``) so R-GCN-style models — per-relation modules
  under ``HeteroGraphConv``, or direct ``multi_update_all`` — train
  multi-chip unchanged (reference ``heterograph.py:5161``).

Only builtin message/reduce pairs run on the mesh (the halo plane's
kernel contract); UDF paths raise — same posture as the reference's
distributed client, which serves builtins via remote kernels.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spmd import HaloShardedGraph, build_halo_bipartite, shard_halo_graph
from .halo_ops import HaloUnit, _as_slots


# ---------------------------------------------------------------------------
# data views (conversion-aware)
# ---------------------------------------------------------------------------


class _FrameView:
    """Dict-like view over one frame with an optional write converter."""

    __slots__ = ("_frame", "_convert")

    def __init__(self, frame, convert=None):
        self._frame = frame
        self._convert = convert

    def __getitem__(self, k):
        return self._frame[k]

    def __setitem__(self, k, v):
        self._frame[k] = self._convert(v) if self._convert else v

    def __delitem__(self, k):
        del self._frame[k]

    def __contains__(self, k):
        return k in self._frame

    def __iter__(self):
        return iter(self._frame)

    def __len__(self):
        return len(self._frame)

    def update(self, d):
        for k, v in d.items():
            self[k] = v

    def pop(self, k, *a):
        return self._frame.pop(k, *a)

    def keys(self):
        return self._frame.keys()

    def items(self):
        return self._frame.items()


class _Space:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data


class _TypedNodeView:
    """``g.nodes[ntype].data`` accessor."""

    __slots__ = ("_g",)

    def __init__(self, g):
        self._g = g

    def __getitem__(self, ntype):
        i = self._g.get_ntype_id(ntype)
        return _Space(_FrameView(self._g._node_frames[i],
                                 self._g._node_convert(i)))


class _TypedEdgeView:
    """``g.edges[etype].data`` accessor."""

    __slots__ = ("_g",)

    def __init__(self, g):
        self._g = g

    def __getitem__(self, etype):
        i = self._g.get_etype_id(etype)
        return _Space(_FrameView(self._g._edge_frames[i],
                                 self._g._edge_convert(i)))


# ---------------------------------------------------------------------------
# single-relation view (what HeteroGraphConv feeds each module)
# ---------------------------------------------------------------------------


class RelMeshView:
    """One relation of a :class:`HeteroMeshGraph` with the single-etype
    ``Graph`` surface nn modules consume (the sharded counterpart of
    ``nn.hetero._rel_view``; bipartite relations present block-style so
    convs use ``(feat_src, feat_dst)`` pairs)."""

    is_sharded = True

    def __init__(self, parent: "HeteroMeshGraph", cet: Tuple[str, str, str]):
        st, et, dt = cet
        self._parent = parent
        etid = parent.get_etype_id(cet)
        self._unit = parent._units[etid]
        self._units = [self._unit]
        self.mesh, self.axis = parent.mesh, parent.axis
        homo = st == dt
        self.is_block = not homo
        self._block_split = None if homo else 1
        self.ntypes = [st] if homo else [st, dt]
        self.srctypes, self.dsttypes = [st], [dt]
        self.canonical_etypes = [cet]
        self.etypes = [et]
        sid, did = parent.get_ntype_id(st), parent.get_ntype_id(dt)
        self._sid, self._did = sid, did
        self._node_frames = ([parent._node_frames[sid]] if homo else
                             [parent._node_frames[sid],
                              parent._node_frames[did]])
        self._edge_frames = [parent._edge_frames[etid]]
        self._num_nodes = ([parent._num_nodes[sid]] if homo else
                           [parent._num_nodes[sid],
                            parent._num_nodes[did]])

    # -- id plumbing -----------------------------------------------------
    def get_etype_id(self, etype=None):
        return 0

    def get_ntype_id(self, ntype=None):
        if ntype is None or len(self.ntypes) == 1:
            return 0
        return self.ntypes.index(ntype)

    def get_src_ntype_id(self, ntype=None):
        return 0

    def get_dst_ntype_id(self, ntype=None):
        return 0 if self._block_split is None else 1

    def unit(self, etype=None):
        return self._unit

    # -- sizes / degrees ---------------------------------------------------
    def num_nodes(self, ntype=None):
        if ntype is None and len(self.ntypes) > 1:
            return sum(self._num_nodes)
        return self._num_nodes[self.get_ntype_id(ntype)]

    def num_src_nodes(self, ntype=None):
        return self._unit.num_src

    def num_dst_nodes(self, ntype=None):
        return self._unit.num_dst

    def num_edges(self, etype=None):
        return self._unit.num_edges

    def in_degrees(self, v=None, etype=None):
        return self._unit.in_degrees(v)

    def out_degrees(self, u=None, etype=None):
        return self._unit.out_degrees(u)

    # -- data views --------------------------------------------------------
    def _node_put(self, frame_idx):
        ntid = self._sid if frame_idx == 0 else self._did
        return self._parent._node_convert(ntid)

    @property
    def srcdata(self):
        return _FrameView(self._node_frames[0], self._node_put(0))

    @property
    def dstdata(self):
        i = 0 if self._block_split is None else 1
        return _FrameView(self._node_frames[i], self._node_put(i))

    @property
    def ndata(self):
        if self._block_split is not None:
            raise ValueError("bipartite relation: use srcdata/dstdata")
        return self.srcdata

    @property
    def edata(self):
        hg = self._unit.hg
        return _FrameView(self._edge_frames[0],
                          lambda v: _as_slots(hg, jnp.asarray(v)))

    # -- message passing -----------------------------------------------------
    def update_all(self, mfunc, rfunc, afunc=None, etype=None):
        from ..core import update_all_inplace
        return update_all_inplace(self, mfunc, rfunc, afunc, etype)

    def apply_edges(self, func, edges=None, etype=None):
        from ..core import apply_edges_inplace
        return apply_edges_inplace(self, func, edges, etype)

    def local_var(self):
        g = RelMeshView.__new__(RelMeshView)
        g.__dict__.update(self.__dict__)
        g._node_frames = [dict(f) for f in self._node_frames]
        g._edge_frames = [dict(f) for f in self._edge_frames]
        return g


# ---------------------------------------------------------------------------
# the heterogeneous mesh graph
# ---------------------------------------------------------------------------


class HeteroMeshGraph:
    """Mesh-sharded heterogeneous graph: per-ntype row-sharded feature
    spaces, per-etype halo planes, the hetero ``Graph`` API on top.

    Build with :func:`shard_hetero_graph`.  The TPU counterpart of the
    reference's heterogeneous ``DistGraph``
    (``distributed/dist_graph.py:519``): the partition book is the
    per-ntype equal-range reshuffle, the KVStore pull is the per-etype
    boundary-row all_to_all."""

    is_block = False
    is_sharded = True

    def __init__(self, ntypes: List[str],
                 canonical_etypes: List[Tuple[str, str, str]],
                 units: List[HaloUnit], mesh: Mesh, axis: str,
                 num_orig_nodes: Dict[str, int],
                 perms: Dict[str, np.ndarray]):
        self.ntypes = list(ntypes)
        self.srctypes = self.ntypes
        self.dsttypes = self.ntypes
        self._canonical_etypes = [tuple(c) for c in canonical_etypes]
        self._ntype_id = {nt: i for i, nt in enumerate(self.ntypes)}
        self._etype_id = {c: i for i, c in enumerate(
            self._canonical_etypes)}
        self._units = list(units)
        self.mesh, self.axis = mesh, axis
        self._num_orig = dict(num_orig_nodes)
        self.perms = dict(perms)
        # padded per-ntype row counts (P * npp_nt); ntypes touched by no
        # relation fall back to the same equal-range padding rule
        num_parts = int(mesh.shape[axis])
        self._num_nodes = [
            num_parts * ((self._num_orig[nt] + num_parts - 1)
                         // num_parts) for nt in self.ntypes]
        for cet, u in zip(self._canonical_etypes, self._units):
            st, _, dt = cet
            self._num_nodes[self._ntype_id[st]] = u.num_src
            self._num_nodes[self._ntype_id[dt]] = u.num_dst
        self._node_frames = [{} for _ in self.ntypes]
        self._edge_frames = [{} for _ in self._canonical_etypes]

    # -- id plumbing (Graph semantics) --------------------------------------
    @property
    def canonical_etypes(self):
        return self._canonical_etypes

    @property
    def etypes(self):
        return [c[1] for c in self._canonical_etypes]

    def get_ntype_id(self, ntype=None) -> int:
        if ntype is None:
            if len(self.ntypes) != 1:
                raise ValueError(
                    f"specify a node type; have {self.ntypes}")
            return 0
        return self._ntype_id[ntype]

    get_src_ntype_id = get_ntype_id
    get_dst_ntype_id = get_ntype_id

    def to_canonical_etype(self, etype):
        if etype is None:
            if len(self._canonical_etypes) != 1:
                raise ValueError(
                    f"specify an edge type; have {self.etypes}")
            return self._canonical_etypes[0]
        if isinstance(etype, tuple):
            return tuple(etype)
        matches = [c for c in self._canonical_etypes if c[1] == etype]
        if len(matches) != 1:
            raise KeyError(f"edge type {etype!r}: {matches}")
        return matches[0]

    def get_etype_id(self, etype=None) -> int:
        return self._etype_id[self.to_canonical_etype(etype)]

    def unit(self, etype=None) -> HaloUnit:
        return self._units[self.get_etype_id(etype)]

    # -- sizes / degrees -----------------------------------------------------
    def num_nodes(self, ntype=None) -> int:
        if ntype is None and len(self.ntypes) > 1:
            return sum(self._num_nodes)
        return self._num_nodes[self.get_ntype_id(ntype)]

    num_src_nodes = num_nodes
    num_dst_nodes = num_nodes

    def num_edges(self, etype=None) -> int:
        if etype is None and len(self._canonical_etypes) > 1:
            return sum(u.num_edges for u in self._units)
        return self._units[self.get_etype_id(etype)].num_edges

    def in_degrees(self, v=None, etype=None):
        return self._units[self.get_etype_id(etype)].in_degrees(v)

    def out_degrees(self, u=None, etype=None):
        return self._units[self.get_etype_id(etype)].out_degrees(u)

    # -- data views ------------------------------------------------------------
    def _node_convert(self, ntid: int):
        def put(v):
            v = jnp.asarray(v)
            total = self._num_nodes[ntid]
            if v.shape[0] == total:
                return v
            nt = self.ntypes[ntid]
            if v.shape[0] == self._num_orig[nt]:
                return self.shard_node_array(v, nt)
            raise ValueError(
                f"node data rows {v.shape[0]} != padded {total} or "
                f"original {self._num_orig[nt]} for ntype {nt!r}")
        return put

    def _edge_convert(self, etid: int):
        hg = self._units[etid].hg
        return lambda v: _as_slots(hg, jnp.asarray(v))

    @property
    def nodes(self):
        return _TypedNodeView(self)

    srcnodes = nodes
    dstnodes = nodes

    @property
    def edges(self):
        return _TypedEdgeView(self)

    @property
    def ndata(self):
        if len(self.ntypes) != 1:
            raise ValueError("multi-ntype graph: use g.nodes[nt].data")
        return _FrameView(self._node_frames[0], self._node_convert(0))

    srcdata = ndata
    dstdata = ndata

    @property
    def edata(self):
        if len(self._canonical_etypes) != 1:
            raise ValueError("multi-etype graph: use g.edges[et].data")
        return _FrameView(self._edge_frames[0], self._edge_convert(0))

    # -- relation views -----------------------------------------------------
    def rel_view(self, cet) -> RelMeshView:
        return RelMeshView(self, self.to_canonical_etype(cet))

    def __getitem__(self, etype) -> RelMeshView:
        return self.rel_view(etype)

    # -- message passing ------------------------------------------------------
    def update_all(self, mfunc, rfunc, afunc=None, etype=None):
        from ..core import update_all_inplace
        return update_all_inplace(self, mfunc, rfunc, afunc, etype)

    def multi_update_all(self, etype_dict, cross_reducer,
                         apply_node_func=None):
        from ..core import multi_update_all_inplace
        return multi_update_all_inplace(self, etype_dict, cross_reducer,
                                        apply_node_func)

    def apply_edges(self, func, edges=None, etype=None):
        from ..core import apply_edges_inplace
        return apply_edges_inplace(self, func, edges, etype)

    def local_var(self):
        g = HeteroMeshGraph.__new__(HeteroMeshGraph)
        g.__dict__.update(self.__dict__)
        g._node_frames = [dict(f) for f in self._node_frames]
        g._edge_frames = [dict(f) for f in self._edge_frames]
        return g

    # -- feature staging --------------------------------------------------------
    def shard_node_array(self, v, ntype=None):
        """Permute + pad + shard an original-order (num_nodes(nt), *F)
        array into the ntype's mesh layout."""
        nt = self.ntypes[self.get_ntype_id(ntype)]
        v = jnp.asarray(v)
        if v.shape[0] != self._num_orig[nt]:
            raise ValueError(
                f"expected original-order rows ({self._num_orig[nt]}) "
                f"for ntype {nt!r}, got {v.shape[0]}")
        v = v[jnp.asarray(self.perms[nt])]
        total = self._num_nodes[self.get_ntype_id(ntype)]
        pad = total - v.shape[0]
        if pad > 0:
            v = jnp.concatenate(
                [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
        return jax.device_put(v, NamedSharding(self.mesh, P(self.axis)))

    def unshard_node_array(self, v, ntype=None):
        """(P*npp_nt, *F) mesh layout -> original order."""
        nt = self.ntypes[self.get_ntype_id(ntype)]
        v = np.asarray(v)[: self._num_orig[nt]]
        out = np.empty_like(v)
        out[self.perms[nt]] = v
        return out

    def edge_slots_to_canonical(self, slots, etype=None):
        from .halo_ops import edge_slots_to_canonical
        return edge_slots_to_canonical(
            self._units[self.get_etype_id(etype)].hg, slots)


def shard_hetero_graph(g, mesh: Mesh, axis: str = "data",
                       part_method: str = "metis",
                       partitions: Optional[Dict[str, np.ndarray]] = None,
                       exchange: str = "auto") -> HeteroMeshGraph:
    """Partition a heterograph over ``mesh``: one METIS run on the
    homogenized graph (reference ``distributed/partition.py:648``
    partitions the homogenized structure too), split per ntype, one
    halo plane per canonical etype.

    ``partitions``: optional explicit {ntype: assignment} overriding the
    method.  Existing node/edge features are staged into the mesh
    layout."""
    num_parts = int(mesh.shape[axis])
    # ---- per-ntype partition assignments --------------------------------
    parts_by_nt: Dict[str, np.ndarray] = {}
    if partitions is not None:
        parts_by_nt = {nt: np.asarray(p) for nt, p in partitions.items()}
    elif part_method == "metis" and num_parts > 1:
        from ..convert_hetero import to_homogeneous
        from ..partition import metis_partition_assignment
        homo = to_homogeneous(g, ndata=[], edata=[])
        assign = np.asarray(metis_partition_assignment(homo, num_parts))
        off = 0
        for nt in g.ntypes:
            n = g.num_nodes(nt)
            parts_by_nt[nt] = assign[off: off + n]
            off += n
    for nt in g.ntypes:
        if nt not in parts_by_nt:
            n = g.num_nodes(nt)
            parts_by_nt[nt] = np.minimum(
                np.arange(n) * num_parts // max(n, 1), num_parts - 1)

    # ---- per-etype halo planes (shared per-ntype perms) -------------------
    units, perms, num_orig = [], {}, {}
    for nt in g.ntypes:
        num_orig[nt] = g.num_nodes(nt)
    for etid, cet in enumerate(g.canonical_etypes):
        st, _, dt = cet
        row, col = (np.asarray(a) for a in g._units[etid].coo())
        hg, perm_src, perm_dst = build_halo_bipartite(
            row, col, num_orig[st], num_orig[dt], num_parts,
            src_partition=parts_by_nt[st],
            dst_partition=parts_by_nt[dt], exchange=exchange)
        perms[st] = perm_src
        perms[dt] = perm_dst
        hg = shard_halo_graph(hg, mesh, axis)
        units.append(HaloUnit(hg, mesh, axis))

    mg = HeteroMeshGraph(g.ntypes, g.canonical_etypes, units, mesh,
                         axis, num_orig, perms)
    for i, nt in enumerate(g.ntypes):
        for k, v in g._node_frames[i].items():
            mg.nodes[nt].data[k] = jnp.asarray(v)
    for etid, cet in enumerate(g.canonical_etypes):
        for k, v in g._edge_frames[etid].items():
            mg.edges[cet].data[k] = jnp.asarray(v)
    return mg
