"""ndata/edata dict-like views (reference ``python/dgl/view.py``)."""
from __future__ import annotations

from collections.abc import MutableMapping

import jax.numpy as jnp


class HeteroNodeDataView(MutableMapping):
    """``g.ndata`` / ``g.srcdata`` / ``g.dstdata`` for one node type."""

    __slots__ = ("_graph", "_index", "_role")

    def __init__(self, graph, index: int, role: str = "node"):
        self._graph = graph
        self._index = index
        self._role = role

    @property
    def _frame(self):
        return self._graph._node_frames[self._index]

    def __getitem__(self, key):
        return self._frame[key]

    def __setitem__(self, key, value):
        self._frame[key] = value

    def __delitem__(self, key):
        del self._frame[key]

    def __iter__(self):
        return iter(self._frame)

    def __len__(self):
        return len(self._frame)

    def __contains__(self, key):
        return key in self._frame

    def keys(self):
        return self._frame.keys()

    def pop(self, key, *default):
        return self._frame.pop(key, *default)

    def update(self, other=(), **kw):
        self._frame.update(other, **kw)

    def __repr__(self):
        return repr({k: getattr(v, "shape", v) for k, v in self._frame.items()})


class HeteroEdgeDataView(MutableMapping):
    """``g.edata`` for one canonical edge type."""

    __slots__ = ("_graph", "_index")

    def __init__(self, graph, index: int):
        self._graph = graph
        self._index = index

    @property
    def _frame(self):
        return self._graph._edge_frames[self._index]

    def __getitem__(self, key):
        return self._frame[key]

    def __setitem__(self, key, value):
        self._frame[key] = value

    def __delitem__(self, key):
        del self._frame[key]

    def __iter__(self):
        return iter(self._frame)

    def __len__(self):
        return len(self._frame)

    def __contains__(self, key):
        return key in self._frame

    def keys(self):
        return self._frame.keys()

    def pop(self, key, *default):
        return self._frame.pop(key, *default)

    def update(self, other=(), **kw):
        self._frame.update(other, **kw)

    def __repr__(self):
        return repr({k: getattr(v, "shape", v) for k, v in self._frame.items()})


class _NodeSpace:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data


class HeteroNodeView:
    """``g.nodes['user']`` -> space with ``.data``; ``g.srcnodes``/``g.dstnodes``."""

    __slots__ = ("_graph", "_role")

    def __init__(self, graph, role: str = "node"):
        self._graph = graph
        self._role = role

    def __getitem__(self, ntype):
        if self._role == "src":
            idx = self._graph.get_src_ntype_id(ntype)
        elif self._role == "dst":
            idx = self._graph.get_dst_ntype_id(ntype)
        else:
            idx = self._graph.get_ntype_id(ntype)
        return _NodeSpace(HeteroNodeDataView(self._graph, idx, self._role))

    def __call__(self, ntype=None):
        return jnp.arange(self._graph.num_nodes(ntype), dtype=jnp.int32)


class HeteroEdgeView:
    """``g.edges['follows']`` -> space with ``.data``."""

    __slots__ = ("_graph",)

    def __init__(self, graph):
        self._graph = graph

    def __getitem__(self, etype):
        idx = self._graph.get_etype_id(etype)
        return _NodeSpace(HeteroEdgeDataView(self._graph, idx))

    def __call__(self, *args, **kwargs):
        return self._graph.all_edges(*args, **kwargs)
