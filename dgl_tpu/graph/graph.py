"""The user-facing ``Graph`` object (hetero-capable), a JAX pytree.

TPU-native counterpart of the reference's ``DGLGraph``
(``python/dgl/heterograph.py:40``): a metagraph of :class:`UnitGraph` relations
plus per-type node/edge feature frames.  Unlike the reference there is no
C++ handle — the whole structure is a pytree of ``jnp`` arrays and can flow
through ``jit`` / ``pjit`` / ``shard_map`` directly.

Feature frames are plain dicts (name -> array).  Imperative mutation
(``g.ndata['h'] = x``) is supported and traceable *within* one jit trace, the
same way the reference's layers use it internally; across jit boundaries use
functional style (pass features as explicit arguments).
"""
from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .unitgraph import UnitGraph, _as_idarray
from .view import (
    HeteroNodeView,
    HeteroEdgeView,
    HeteroNodeDataView,
    HeteroEdgeDataView,
)

# Reserved field names, mirror reference ``python/dgl/base.py`` NID/EID.
NID = "_ID"
EID = "_ID"
NTYPE = "_TYPE"
ETYPE = "_TYPE"

DEFAULT_NTYPE = "_N"
DEFAULT_ETYPE = "_E"

CanonicalEtype = Tuple[str, str, str]


@jax.tree_util.register_pytree_node_class
class Graph:
    """Heterogeneous graph: list of ntypes, list of canonical etypes, one
    :class:`UnitGraph` per relation, per-type feature frames."""

    def __init__(
        self,
        ntypes: Sequence[str],
        canonical_etypes: Sequence[CanonicalEtype],
        num_nodes_per_type: Sequence[int],
        units: Sequence[UnitGraph],
        node_frames: Optional[List[Dict[str, jnp.ndarray]]] = None,
        edge_frames: Optional[List[Dict[str, jnp.ndarray]]] = None,
        is_block: bool = False,
        batch_info: Optional[dict] = None,
        block_split: Optional[int] = None,
        fused_cache: Optional[dict] = None,
    ):
        # For blocks (MFGs), ``ntypes`` is ``srctypes + dsttypes`` and
        # ``block_split`` = len(srctypes): src/dst node spaces are disjoint
        # (reference ``DGLBlock`` SRC/DST node-type spaces,
        # ``python/dgl/heterograph.py`` block machinery).
        self._block_split = block_split
        self.ntypes = list(ntypes)
        self._canonical_etypes = [tuple(c) for c in canonical_etypes]
        self._num_nodes = [int(n) for n in num_nodes_per_type]
        self._units = list(units)
        self._node_frames = (
            [dict() for _ in self.ntypes] if node_frames is None
            else [dict(f) for f in node_frames]
        )
        self._edge_frames = (
            [dict() for _ in self._canonical_etypes] if edge_frames is None
            else [dict(f) for f in edge_frames]
        )
        self._is_block = bool(is_block)
        # batch_info: {'num_nodes': {ntype: array}, 'num_edges': {etype: array}}
        self._batch_info = batch_info
        # {fusion key: stacked UnitGraph} built by core.multi_update_all's
        # fused dispatch; part of the pytree so formats survive jit tracing
        self._fused_cache = dict(fused_cache) if fused_cache else {}
        if block_split is None:
            self._ntype_id = {nt: i for i, nt in enumerate(self.ntypes)}
        else:
            # src entries map to [0, split), dst entries to [split, end).
            # On name collision, dst wins for the unqualified lookup (a
            # block's "nodes of type t" defaults to its output side).
            self._ntype_id = {}
            for i, nt in enumerate(self.ntypes):
                self._ntype_id[nt] = i
        self._etype_id = {ct: i for i, ct in enumerate(self._canonical_etypes)}

    # ------------------------------------------------------------------
    # pytree
    # ------------------------------------------------------------------
    def tree_flatten(self):
        children = (self._units, self._node_frames, self._edge_frames,
                    self._batch_info, self._fused_cache)
        aux = (tuple(self.ntypes), tuple(self._canonical_etypes),
               tuple(self._num_nodes), self._is_block, self._block_split)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        units, node_frames, edge_frames, batch_info, fused_cache = children
        ntypes, cetypes, num_nodes, is_block, block_split = aux
        return cls(ntypes, cetypes, num_nodes, units,
                   node_frames=node_frames, edge_frames=edge_frames,
                   is_block=is_block, batch_info=batch_info,
                   block_split=block_split, fused_cache=fused_cache)

    # ------------------------------------------------------------------
    # schema queries
    # ------------------------------------------------------------------
    @property
    def canonical_etypes(self) -> List[CanonicalEtype]:
        return list(self._canonical_etypes)

    @property
    def etypes(self) -> List[str]:
        return [c[1] for c in self._canonical_etypes]

    @property
    def srctypes(self) -> List[str]:
        if self._block_split is not None:
            return self.ntypes[: self._block_split]
        return sorted(set(c[0] for c in self._canonical_etypes)) or self.ntypes

    @property
    def dsttypes(self) -> List[str]:
        if self._block_split is not None:
            return self.ntypes[self._block_split:]
        return sorted(set(c[2] for c in self._canonical_etypes)) or self.ntypes

    @property
    def is_block(self) -> bool:
        return self._is_block

    @property
    def is_homogeneous(self) -> bool:
        return len(self.ntypes) == 1 and len(self._canonical_etypes) == 1

    def get_ntype_id(self, ntype: Optional[str]) -> int:
        if ntype is None:
            if len(self.ntypes) != 1:
                raise ValueError(
                    "Node type name must be specified on a graph with "
                    f"multiple node types {self.ntypes}")
            return 0
        if ntype not in self._ntype_id:
            raise KeyError(f"unknown node type {ntype!r}; have {self.ntypes}")
        return self._ntype_id[ntype]

    def to_canonical_etype(self, etype) -> CanonicalEtype:
        if etype is None:
            if len(self._canonical_etypes) != 1:
                raise ValueError(
                    "Edge type name must be specified on a graph with "
                    f"multiple edge types {self.etypes}")
            return self._canonical_etypes[0]
        if isinstance(etype, tuple):
            if tuple(etype) not in self._etype_id:
                raise KeyError(f"unknown edge type {etype!r}")
            return tuple(etype)
        matches = [c for c in self._canonical_etypes if c[1] == etype]
        if len(matches) == 0:
            raise KeyError(f"unknown edge type {etype!r}; have {self.etypes}")
        if len(matches) > 1:
            raise ValueError(
                f"edge type {etype!r} is ambiguous; use a canonical triple "
                f"from {matches}")
        return matches[0]

    def get_etype_id(self, etype) -> int:
        return self._etype_id[self.to_canonical_etype(etype)]

    def unit(self, etype=None) -> UnitGraph:
        """The UnitGraph of a relation."""
        return self._units[self.get_etype_id(etype)]

    # ------------------------------------------------------------------
    # size queries
    # ------------------------------------------------------------------
    def num_nodes(self, ntype: Optional[str] = None) -> int:
        if ntype is None and len(self.ntypes) > 1:
            return sum(self._num_nodes)
        return self._num_nodes[self.get_ntype_id(ntype)]

    def number_of_nodes(self, ntype=None):
        return self.num_nodes(ntype)

    def num_edges(self, etype=None) -> int:
        if etype is None and len(self._canonical_etypes) > 1:
            return sum(u.num_edges for u in self._units)
        return self._units[self.get_etype_id(etype)].num_edges

    def number_of_edges(self, etype=None):
        return self.num_edges(etype)

    def get_src_ntype_id(self, ntype=None) -> int:
        """Frame index of a src-side node type."""
        if self._block_split is None:
            return self.get_ntype_id(ntype)
        src_names = self.ntypes[: self._block_split]
        if ntype is None:
            if len(src_names) != 1:
                raise ValueError("specify src node type")
            return 0
        return src_names.index(ntype)

    def get_dst_ntype_id(self, ntype=None) -> int:
        """Frame index of a dst-side node type."""
        if self._block_split is None:
            return self.get_ntype_id(ntype)
        dst_names = self.ntypes[self._block_split:]
        if ntype is None:
            if len(dst_names) != 1:
                raise ValueError("specify dst node type")
            return self._block_split
        return self._block_split + dst_names.index(ntype)

    def num_src_nodes(self, ntype=None) -> int:
        return self._num_nodes[self.get_src_ntype_id(ntype)]

    def num_dst_nodes(self, ntype=None) -> int:
        return self._num_nodes[self.get_dst_ntype_id(ntype)]

    def number_of_src_nodes(self, ntype=None):
        return self.num_src_nodes(ntype)

    def number_of_dst_nodes(self, ntype=None):
        return self.num_dst_nodes(ntype)

    # For blocks: number of src/dst nodes of a *relation*'s node types come
    # from the unit graph; for plain graphs they equal num_nodes.
    def _unit_num_src(self, etid: int) -> int:
        return self._units[etid].num_src

    def _unit_num_dst(self, etid: int) -> int:
        return self._units[etid].num_dst

    # ------------------------------------------------------------------
    # structure queries
    # ------------------------------------------------------------------
    @property
    def nodes(self):
        return HeteroNodeView(self)

    @property
    def srcnodes(self):
        return HeteroNodeView(self, role="src")

    @property
    def dstnodes(self):
        return HeteroNodeView(self, role="dst")

    @property
    def edges(self):
        return HeteroEdgeView(self)

    def all_edges(self, form: str = "uv", order: str = "eid", etype=None):
        u = self._units[self.get_etype_id(etype)]
        row, col = u.coo()
        eid = jnp.arange(u.num_edges, dtype=jnp.int32)
        if order == "srcdst":
            perm = jnp.lexsort((col, row))
            row, col, eid = row[perm], col[perm], eid[perm]
        if form == "uv":
            return row, col
        if form == "all":
            return row, col, eid
        if form == "eid":
            return eid
        raise ValueError(form)

    def in_degrees(self, v=None, etype=None):
        return self._units[self.get_etype_id(etype)].in_degrees(v)

    def out_degrees(self, u=None, etype=None):
        return self._units[self.get_etype_id(etype)].out_degrees(u)

    def has_nodes(self, vid, ntype=None):
        vid = jnp.asarray(vid)
        return (vid >= 0) & (vid < self.num_nodes(ntype))

    def has_edges_between(self, u, v, etype=None):
        from .query import has_edges_between
        return has_edges_between(self, u, v, etype=etype)

    def edge_ids(self, u, v, etype=None):
        from .query import edge_ids
        return edge_ids(self, u, v, etype=etype)

    def find_edges(self, eid, etype=None):
        unit = self._units[self.get_etype_id(etype)]
        row, col = unit.coo()
        eid = _as_idarray(eid)
        return row[eid], col[eid]

    def in_edges(self, v, form="uv", etype=None):
        from .query import in_edges
        return in_edges(self, v, form=form, etype=etype)

    def out_edges(self, u, form="uv", etype=None):
        from .query import out_edges
        return out_edges(self, u, form=form, etype=etype)

    def successors(self, u, etype=None):
        return self.out_edges(u, form="uv", etype=etype)[1]

    def predecessors(self, v, etype=None):
        return self.in_edges(v, form="uv", etype=etype)[0]

    def adjacency_matrix(self, transpose=False, etype=None):
        """Dense (num_dst, num_src) adjacency (or transpose).  For tests and
        small graphs; sparse compute should go through ops.gspmm."""
        u = self._units[self.get_etype_id(etype)]
        row, col = u.coo()
        a = jnp.zeros((u.num_dst, u.num_src), jnp.float32).at[col, row].add(1.0)
        return a.T if transpose else a

    adj = adjacency_matrix

    # ------------------------------------------------------------------
    # feature access
    # ------------------------------------------------------------------
    @property
    def ndata(self):
        if self._is_block:
            raise RuntimeError("use srcdata/dstdata on a block")
        if len(self.ntypes) == 1:
            return HeteroNodeDataView(self, 0)
        return {nt: HeteroNodeDataView(self, i)
                for i, nt in enumerate(self.ntypes)}

    @property
    def edata(self):
        if len(self._canonical_etypes) == 1:
            return HeteroEdgeDataView(self, 0)
        return {ct: HeteroEdgeDataView(self, i)
                for i, ct in enumerate(self._canonical_etypes)}

    @property
    def srcdata(self):
        i = self._src_frame_index()
        return HeteroNodeDataView(self, i, role="src")

    @property
    def dstdata(self):
        i = self._dst_frame_index()
        return HeteroNodeDataView(self, i, role="dst")

    def _src_frame_index(self):
        sts = self.srctypes
        if len(sts) != 1:
            raise ValueError("srcdata requires a single src type")
        return self.get_src_ntype_id(sts[0])

    def _dst_frame_index(self):
        dts = self.dsttypes
        if len(dts) != 1:
            raise ValueError("dstdata requires a single dst type")
        return self.get_dst_ntype_id(dts[0])

    def node_frame(self, ntype=None) -> Dict[str, jnp.ndarray]:
        return self._node_frames[self.get_ntype_id(ntype)]

    def edge_frame(self, etype=None) -> Dict[str, jnp.ndarray]:
        return self._edge_frames[self.get_etype_id(etype)]

    # For blocks, src/dst frames are distinct per-side frames keyed by ntype
    # position; a block's srcdata lives in node_frames of the src ntype and
    # dstdata in a *separate* frame list (see ``to_block``).  We keep the
    # simple scheme: blocks carry ntypes ``[srctype, dsttype]`` when types
    # collide (handled by convert.to_block).

    @contextlib.contextmanager
    def local_scope(self):
        """Reference ``DGLGraph.local_scope`` — frame mutations inside the
        block are discarded on exit (``python/dgl/heterograph.py``)."""
        saved_n = [dict(f) for f in self._node_frames]
        saved_e = [dict(f) for f in self._edge_frames]
        try:
            yield self
        finally:
            self._node_frames = saved_n
            self._edge_frames = saved_e

    def local_var(self):
        g = self.clone()
        return g

    def clone(self) -> "Graph":
        out = Graph(self.ntypes, self._canonical_etypes, self._num_nodes,
                    list(self._units),
                    node_frames=[dict(f) for f in self._node_frames],
                    edge_frames=[dict(f) for f in self._edge_frames],
                    is_block=self._is_block, batch_info=self._batch_info,
                    block_split=self._block_split)
        # structure-derived cache: SHARE the dict so fused units built on
        # a clone (e.g. inside a training step) persist on the original
        out._fused_cache = self._fused_cache
        return out

    # ------------------------------------------------------------------
    # formats
    # ------------------------------------------------------------------
    def formats(self, formats=None):
        """Query or restrict allowed sparse formats (reference
        ``heterograph_index.py:1101``)."""
        if formats is None:
            created = set()
            for u in self._units:
                created.update(u.materialized_formats())
            allowed = set()
            for u in self._units:
                allowed.update(u.formats)
            return {"created": sorted(created),
                    "not created": sorted(allowed - created)}
        new_units = [u.with_formats(formats) for u in self._units]
        return Graph(self.ntypes, self._canonical_etypes, self._num_nodes,
                     new_units, node_frames=self._node_frames,
                     edge_frames=self._edge_frames, is_block=self._is_block,
                     batch_info=self._batch_info,
                     block_split=self._block_split)

    def create_tiled_format(self, tile=None, cap=None):
        """Build the Pallas tile-dense SpMM format for every relation
        (host-side preprocessing; enables the TPU fast path)."""
        for u in self._units:
            u.tiled_format(tile, cap)
        return self

    def create_hybrid_format(self, k_dense: int = 8192,
                             min_degree: int = 256, etype=None):
        """Degree-stratified hybrid SpMM format: hub dst rows dense,
        remainder tiled (``ops/pallas/hybrid.py``) — the copy_u/sum fast
        path for heavy-tailed graphs."""
        etid = self.get_etype_id(etype)
        self._units[etid].create_hybrid_format(k_dense=k_dense,
                                               min_degree=min_degree)
        return self

    def cache_edge_weights(self, field: str, etype=None):
        """Pre-permute the static per-edge weights ``edata[field]`` into
        the tiled format's slot layout so weighted SpMM skips its
        per-call canonical→slot gather (see
        ``UnitGraph.cache_edge_weights``).  Call again after mutating
        the field; gradients do not flow to cached weights."""
        etid = self.get_etype_id(etype)
        self._units[etid].cache_edge_weights(
            field, self._edge_frames[etid][field])
        return self

    def create_formats_(self):
        for u in self._units:
            if "coo" in u.formats:
                u.coo()
            if "csr" in u.formats:
                u.csr()
            if "csc" in u.formats:
                u.csc()
        return self

    def auto_format(self, hbm_budget_bytes: int = 12 << 30,
                    symmetric: bool = None, cache_path: str = None):
        """Pick + build the best Pallas SpMM family per relation (see
        ``UnitGraph.auto_format``).  Returns {etype: family}."""
        import os
        out = {}
        for i, (et, u) in enumerate(zip(self.canonical_etypes,
                                        self._units)):
            cp = cache_path
            if cp is not None and len(self._units) > 1:
                # one file per relation: the format builders return any
                # existing cache file verbatim, so sharing a path would
                # hand relation 1 relation 0's adjacency
                root, ext = os.path.splitext(cp)
                cp = f"{root}.rel{i}{ext}"
            out[et] = u.auto_format(hbm_budget_bytes=hbm_budget_bytes,
                                    symmetric=symmetric, cache_path=cp)
        return out

    # ------------------------------------------------------------------
    # batching info
    # ------------------------------------------------------------------
    def batch_num_nodes(self, ntype=None):
        if self._batch_info is None:
            return jnp.array([self.num_nodes(ntype)], jnp.int32)
        key = self.ntypes[self.get_ntype_id(ntype)]
        return self._batch_info["num_nodes"][key]

    def batch_num_edges(self, etype=None):
        if self._batch_info is None:
            return jnp.array([self.num_edges(etype)], jnp.int32)
        key = self._canonical_etypes[self.get_etype_id(etype)]
        return self._batch_info["num_edges"][key]

    @property
    def batch_size(self) -> int:
        if self._batch_info is None:
            return 1
        first = next(iter(self._batch_info["num_nodes"].values()))
        return int(first.shape[0])

    def set_batch_info(self, num_nodes, num_edges):
        self._batch_info = {"num_nodes": num_nodes, "num_edges": num_edges}

    # ------------------------------------------------------------------
    # message passing API (delegates to core)
    # ------------------------------------------------------------------
    def apply_nodes(self, func, v=None, ntype=None):
        from .. import core
        return core.apply_nodes(self, func, v=v, ntype=ntype)

    def apply_edges(self, func, edges=None, etype=None):
        from .. import core
        return core.apply_edges_inplace(self, func, edges=edges, etype=etype)

    def update_all(self, message_func, reduce_func, apply_node_func=None,
                   etype=None):
        from .. import core
        return core.update_all_inplace(self, message_func, reduce_func,
                                       apply_node_func, etype=etype)

    def multi_update_all(self, etype_dict, cross_reducer,
                         apply_node_func=None):
        from .. import core
        return core.multi_update_all_inplace(self, etype_dict, cross_reducer,
                                             apply_node_func)

    def send_and_recv(self, edges, message_func, reduce_func,
                      apply_node_func=None, etype=None):
        from .. import core
        return core.send_and_recv_inplace(self, edges, message_func,
                                          reduce_func, apply_node_func,
                                          etype=etype)

    def prop_nodes(self, nodes_generator, message_func, reduce_func,
                   apply_node_func=None, etype=None):
        from .. import core
        for frontier in nodes_generator:
            core.pull_inplace(self, frontier, message_func, reduce_func,
                              apply_node_func, etype=etype)
        return self

    def pull(self, v, message_func, reduce_func, apply_node_func=None,
             etype=None):
        from .. import core
        return core.pull_inplace(self, v, message_func, reduce_func,
                                 apply_node_func, etype=etype)

    def push(self, u, message_func, reduce_func, apply_node_func=None,
             etype=None):
        from .. import core
        return core.push_inplace(self, u, message_func, reduce_func,
                                 apply_node_func, etype=etype)

    # ------------------------------------------------------------------
    # structural edits (functional; see also transforms)
    # ------------------------------------------------------------------
    def reverse(self, copy_ndata=True, copy_edata=True):
        from ..transforms.functional import reverse
        return reverse(self, copy_ndata=copy_ndata, copy_edata=copy_edata)

    def add_self_loop(self, etype=None):
        from ..transforms.functional import add_self_loop
        return add_self_loop(self, etype=etype)

    def remove_self_loop(self, etype=None):
        from ..transforms.functional import remove_self_loop
        return remove_self_loop(self, etype=etype)

    def subgraph(self, nodes, relabel_nodes=True, store_ids=True):
        from .subgraph import node_subgraph
        return node_subgraph(self, nodes, store_ids=store_ids)

    def edge_subgraph(self, edges, relabel_nodes=True, store_ids=True):
        from .subgraph import edge_subgraph
        return edge_subgraph(self, edges, relabel_nodes=relabel_nodes,
                             store_ids=store_ids)

    def sample_neighbors(self, nodes, fanout, edge_dir="in", prob=None,
                         replace=False, exclude_edges=None):
        from ..sampling.neighbor import sample_neighbors
        return sample_neighbors(self, nodes, fanout, edge_dir=edge_dir,
                                prob=prob, replace=replace,
                                exclude_edges=exclude_edges)

    # ------------------------------------------------------------------
    # device / dtype
    # ------------------------------------------------------------------
    @property
    def device(self):
        for u in self._units:
            for arr in jax.tree_util.tree_leaves(u):
                return arr.devices() if hasattr(arr, "devices") else None
        return None

    def to(self, device):
        return jax.device_put(self.to_device(), device)

    def to_device(self, device=None) -> "Graph":
        """Move all arrays to an accelerator (host numpy -> jax)."""
        def put(x):
            import numpy as _np
            arr = jnp.asarray(x)
            return jax.device_put(arr, device) if device is not None else arr
        return jax.tree_util.tree_map(put, self)

    def to_host(self) -> "Graph":
        """Materialize all arrays as host numpy (for the sampling path)."""
        return jax.tree_util.tree_map(lambda x: np.asarray(x), self)

    @property
    def idtype(self):
        return jnp.int32

    def long(self):
        return self  # int32 everywhere on TPU

    def int(self):
        return self

    # ------------------------------------------------------------------
    # method-style access to the functional transforms / subgraph ops
    # (reference DGLGraph exposes these as methods; ours delegate to the
    # module-level functions for drop-in familiarity)
    # ------------------------------------------------------------------
    def add_edges(self, u, v, data=None, etype=None):
        from ..transforms.functional import add_edges
        return add_edges(self, u, v, data=data, etype=etype)

    def add_nodes(self, num, data=None, ntype=None):
        from ..transforms.functional import add_nodes
        return add_nodes(self, num, data=data, ntype=ntype)

    def remove_edges(self, eids, etype=None):
        from ..transforms.functional import remove_edges
        return remove_edges(self, eids, etype=etype)

    def remove_nodes(self, nids, ntype=None):
        from ..transforms.functional import remove_nodes
        return remove_nodes(self, nids, ntype=ntype)

    def to_simple(self, **kw):
        from ..transforms.functional import to_simple
        return to_simple(self, **kw)

    def line_graph(self, **kw):
        from ..transforms.functional import line_graph
        return line_graph(self, **kw)

    def reorder_graph(self, *a, **kw):
        from ..transforms.functional import reorder_graph
        return reorder_graph(self, *a, **kw)

    def in_subgraph(self, nodes, **kw):
        from .subgraph import in_subgraph
        return in_subgraph(self, nodes, **kw)

    def out_subgraph(self, nodes, **kw):
        from .subgraph import out_subgraph
        return out_subgraph(self, nodes, **kw)

    def khop_in_subgraph(self, nodes, k, **kw):
        from .subgraph import khop_in_subgraph
        return khop_in_subgraph(self, nodes, k, **kw)

    def node_type_subgraph(self, ntypes):
        """Relations whose endpoints are all in ``ntypes`` (reference
        ``heterograph.py node_type_subgraph``)."""
        keep = [c for c in self._canonical_etypes
                if c[0] in ntypes and c[2] in ntypes]
        return self.edge_type_subgraph(keep)

    def edge_type_subgraph(self, etypes):
        """Subset of relations, all nodes kept (reference
        ``edge_type_subgraph``)."""
        cets = [self.to_canonical_etype(e) for e in etypes]
        keep_nt = sorted({c[0] for c in cets} | {c[2] for c in cets},
                         key=self.ntypes.index)
        units, eframes, canon = [], [], []
        for c in cets:
            i = self._canonical_etypes.index(c)
            units.append(self._units[i])
            eframes.append(self._edge_frames[i])
            canon.append(c)
        nts = keep_nt
        nframes = [self._node_frames[self.ntypes.index(nt)] for nt in nts]
        nnodes = [self._num_nodes[self.ntypes.index(nt)] for nt in nts]
        return Graph(nts, canon, nnodes, units, node_frames=nframes,
                     edge_frames=eframes)

    def adj(self, etype=None, transpose=False):
        """Dense adjacency (src, dst) or its transpose; alias
        ``adjacency_matrix`` already returns (dst, src)."""
        a = self.adjacency_matrix(etype=etype) if etype is not None else \
            self.adjacency_matrix()
        return a if transpose else a.T

    def inc(self, typestr: str = "both"):
        """Incidence matrix (reference ``heterograph.py inc``):
        'in' -> B[v, e]=1 if e enters v; 'out' -> e leaves v;
        'both' -> in − out (0 for self-loops)."""
        row, col = self.unit().coo()
        E = self.num_edges()
        n = self.num_nodes()
        B = jnp.zeros((n, E), jnp.float32)
        eids = jnp.arange(E)
        if typestr == "in":
            return B.at[col, eids].add(1.0)
        if typestr == "out":
            return B.at[row, eids].add(1.0)
        return B.at[col, eids].add(1.0).at[row, eids].add(-1.0)

    @property
    def is_multigraph(self) -> bool:
        row, col = (np.asarray(a) for a in self.unit().coo())
        key = row.astype(np.int64) * (self.num_nodes() + 1) + col
        return len(np.unique(key)) < len(key)

    def metagraph(self):
        """networkx MultiDiGraph over node types (reference
        ``metagraph``)."""
        import networkx as nx
        mg = nx.MultiDiGraph()
        mg.add_nodes_from(self.ntypes)
        for st, et, dt in self._canonical_etypes:
            mg.add_edge(st, dt, key=et)
        return mg

    def filter_nodes(self, predicate, ntype=None):
        """Node ids where ``predicate(nodes) -> bool mask`` holds
        (reference ``filter_nodes``; predicate sees a NodeBatch-like view
        with ``.data``)."""
        frame = self._node_frames[self.get_ntype_id(ntype)]

        class _View:
            data = frame
        mask = np.asarray(predicate(_View()))
        return jnp.asarray(np.nonzero(mask)[0].astype(np.int64))

    def filter_edges(self, predicate, etype=None):
        frame = self._edge_frames[self.get_etype_id(etype)]

        class _View:
            data = frame
        mask = np.asarray(predicate(_View()))
        return jnp.asarray(np.nonzero(mask)[0].astype(np.int64))

    def cpu(self):
        return self.to(jax.devices("cpu")[0])

    # ------------------------------------------------------------------
    # reference-parity surface (heterograph.py methods)
    # ------------------------------------------------------------------
    def adj_tensors(self, fmt: str, etype=None):
        """Adjacency as raw tensors (reference ``adj_tensors``):
        'coo' -> (row, col); 'csr'/'csc' -> (indptr, indices, eids)."""
        unit = self.unit(etype)
        if fmt == "coo":
            return unit.coo()
        if fmt == "csr":
            c = unit.csr()
            return c.indptr, c.indices, c.eids
        if fmt == "csc":
            c = unit.csc()
            return c.indptr, c.indices, c.eids
        raise ValueError(fmt)

    def adj_external(self, transpose=False, ctx=None, scipy_fmt="coo",
                     etype=None):
        """Adjacency in an external library's format (reference
        ``adj_external``): scipy sparse here."""
        import scipy.sparse as sp
        row, col = (np.asarray(a) for a in self.unit(etype).coo())
        if transpose:
            row, col = col, row
        unit = self.unit(etype)
        m = sp.coo_matrix((np.ones(len(row)), (row, col)),
                          shape=(unit.num_src, unit.num_dst))
        return getattr(m, "to" + scipy_fmt)() if scipy_fmt != "coo" else m

    @property
    def idtype(self):
        row, _ = self.unit(None if len(self._canonical_etypes) == 1
                           else self._canonical_etypes[0]).coo()
        return jnp.asarray(row).dtype if not isinstance(row, np.ndarray) \
            else row.dtype

    def astype(self, idtype):
        """Reference ``astype``.  This framework is int32-first (SURVEY
        §7: int32 ids throughout; XLA truncates int64 without x64 mode),
        so id dtype is fixed — ``astype``/``long``/``int`` return a
        clone for API compatibility and graphs above 2^31 edges shard
        across hosts before ids overflow."""
        return self.clone()

    def long(self):
        return self.astype(jnp.int32)

    def int(self):
        return self.astype(jnp.int32)

    def node_attr_schemes(self, ntype=None):
        """{name: (shape, dtype)} of node features (reference
        ``node_attr_schemes``)."""
        frame = self._node_frames[self.get_ntype_id(ntype)]
        return {k: (tuple(v.shape[1:]), jnp.asarray(v).dtype)
                for k, v in frame.items()}

    def edge_attr_schemes(self, etype=None):
        frame = self._edge_frames[self.get_etype_id(etype)]
        return {k: (tuple(v.shape[1:]), jnp.asarray(v).dtype)
                for k, v in frame.items()}

    def get_node_storage(self, key, ntype=None):
        """FeatureStorage wrapper for a node column (reference
        ``get_node_storage``; used by dataloader prefetch)."""
        from ..storages import TensorStorage
        return TensorStorage(
            self._node_frames[self.get_ntype_id(ntype)][key])

    def get_edge_storage(self, key, etype=None):
        from ..storages import TensorStorage
        return TensorStorage(
            self._edge_frames[self.get_etype_id(etype)][key])

    def get_ntype_id_from_src(self, ntype):
        return self.get_src_ntype_id(ntype)

    def get_ntype_id_from_dst(self, ntype):
        return self.get_dst_ntype_id(ntype)

    @property
    def is_unibipartite(self) -> bool:
        """True for blocks / bipartite graphs with disjoint SRC and DST
        node spaces (reference ``is_unibipartite``)."""
        return self._block_split is not None

    def set_batch_num_nodes(self, val):
        """Manually set per-component node counts (reference
        ``set_batch_num_nodes``)."""
        if not isinstance(val, dict):
            val = {self.ntypes[0]: val}
        info = dict(self._batch_info or {})
        info["num_nodes"] = {nt: jnp.asarray(v) for nt, v in val.items()}
        info.setdefault("num_edges", {
            c: jnp.asarray([u.num_edges])
            for c, u in zip(self._canonical_etypes, self._units)})
        self._batch_info = info
        return self

    def set_batch_num_edges(self, val):
        if not isinstance(val, dict):
            val = {self._canonical_etypes[0]: val}
        info = dict(self._batch_info or {})
        info["num_edges"] = {c: jnp.asarray(v) for c, v in val.items()}
        info.setdefault("num_nodes", {
            nt: jnp.asarray([self._num_nodes[i]])
            for i, nt in enumerate(self.ntypes)})
        self._batch_info = info
        return self

    def set_n_initializer(self, initializer, field=None, ntype=None):
        """Register a default initializer used when structural edits
        extend node frames (reference ``set_n_initializer`` /
        ``frame.py:167`` per-column schemes).  ``initializer(shape,
        dtype, ctx, id_range)`` (reference signature) or ``(shape,
        dtype)``; ``field=None`` = all columns."""
        if not isinstance(getattr(self, "_n_init", None), dict):
            self._n_init = {}
        self._n_init[field] = initializer
        return self

    def set_e_initializer(self, initializer, field=None, etype=None):
        if not isinstance(getattr(self, "_e_init", None), dict):
            self._e_init = {}
        self._e_init[field] = initializer
        return self

    def _frame_initializer(self, field, kind="n"):
        """The registered initializer for a column (field-specific wins
        over the catch-all), or None for the zero default."""
        d = getattr(self, f"_{kind}_init", None)
        if not isinstance(d, dict):
            return None
        return d.get(field, d.get(None))

    def pin_memory_(self):
        """Stage host copies of all frames for fast device transfer
        (reference ``pin_memory_``; no host-mapped device memory on TPU —
        this keeps a contiguous host staging copy)."""
        from ..utils import pin_memory_inplace
        for frame in list(self._node_frames) + list(self._edge_frames):
            for k, v in frame.items():
                try:
                    pin_memory_inplace(v)
                except Exception:
                    pass
        self._pinned = True
        return self

    def unpin_memory_(self):
        self._pinned = False
        return self

    @property
    def is_pinned(self) -> bool:
        return bool(getattr(self, "_pinned", False))

    def record_stream(self, stream=None):
        """No-op on TPU (reference ``record_stream`` manages CUDA stream
        lifetimes; XLA owns ordering here)."""
        return self

    def materialize_data(self):
        """Force lazy feature columns resident (reference
        ``materialize_data``); frames are eager here."""
        return self

    def shared_memory(self, name: str, formats=None):
        """Publish the structure into named shm and return the attached
        view (reference ``DGLGraph.shared_memory``)."""
        from ..multiprocessing import (graph_to_shared_memory,
                                       hetero_from_shared_memory)
        graph_to_shared_memory(self, name)
        return hetero_from_shared_memory(name)

    def prop_edges(self, edges_generator, message_func, reduce_func,
                   apply_node_func=None, etype=None):
        """Propagate along edge frontiers (reference ``prop_edges``)."""
        from .. import core
        for frontier in edges_generator:
            core.send_and_recv_inplace(self, frontier, message_func,
                                       reduce_func, apply_node_func,
                                       etype=etype)
        return self

    # ------------------------------------------------------------------
    def __repr__(self):
        if self.is_homogeneous:
            return (f"Graph(num_nodes={self.num_nodes()}, "
                    f"num_edges={self.num_edges()})")
        nn = {nt: self._num_nodes[i] for i, nt in enumerate(self.ntypes)}
        ne = {c: u.num_edges
              for c, u in zip(self._canonical_etypes, self._units)}
        return f"Graph(num_nodes={nn}, num_edges={ne})"


DGLGraph = Graph  # alias for drop-in familiarity
