"""The message-passing engine: fuse-or-fallback dispatch.

Reference: ``python/dgl/core.py`` — ``message_passing`` (``core.py:372-425``)
fuses builtin message+reduce pairs into one g-SpMM call
(``invoke_gspmm``, ``core.py:311``), materializes edge messages for
builtin-message + UDF-reduce via g-SDDMM (``invoke_gsddmm``, ``core.py:273``),
and falls back to degree-bucketed UDF reduction (``core.py:99-204``).

TPU notes: the fused path is a single XLA/Pallas kernel; the UDF path
degree-buckets on host (shape-dynamic) or — inside jit — pads each bucket to
a power of two so each (bucket_size, degree) pair compiles once.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .function import BuiltinMessage, BuiltinReduce
from .ops import gspmm, gsddmm
from .udf import EdgeBatch, NodeBatch

# ---------------------------------------------------------------------------
# field data resolution
# ---------------------------------------------------------------------------


def _src_frame(g, etid):
    st = g.canonical_etypes[etid][0]
    return g._node_frames[g.get_src_ntype_id(st)]


def _dst_frame(g, etid):
    dt = g.canonical_etypes[etid][2]
    return g._node_frames[g.get_dst_ntype_id(dt)]


def _edge_frame(g, etid):
    return g._edge_frames[etid]


def _fetch(g, etid, target: str, field: str):
    if target == "u":
        return _src_frame(g, etid)[field]
    if target == "v":
        return _dst_frame(g, etid)[field]
    if target == "e":
        return _edge_frame(g, etid)[field]
    raise ValueError(target)


# ---------------------------------------------------------------------------
# builtin invocation
# ---------------------------------------------------------------------------


def invoke_gsddmm(g, etid, mfunc: BuiltinMessage):
    """Materialize builtin messages as an edge tensor (reference
    ``core.py:273``)."""
    unit = g._units[etid]
    if mfunc.rhs is None:
        x = _fetch(g, etid, mfunc.lhs, mfunc.lhs_field)
        if mfunc.name == "copy_u":
            return gsddmm(unit, "copy_lhs", x, None, "u", "v")
        return gsddmm(unit, "copy_rhs", None, x, "u", "e")
    x = _fetch(g, etid, mfunc.lhs, mfunc.lhs_field)
    y = _fetch(g, etid, mfunc.rhs, mfunc.rhs_field)
    return gsddmm(unit, mfunc.binary_op, x, y, lhs_target=mfunc.lhs,
                  rhs_target=mfunc.rhs)


def invoke_gsddmm_subset(g, etid, mfunc: BuiltinMessage, eid):
    """Builtin messages for an EDGE SUBSET (reference ``core.py:273``
    with an ``edges=`` selection): gathers only the selected endpoints,
    so cost is O(|eid|) not O(E)."""
    unit = g._units[etid]
    row, col = (jnp.asarray(a) for a in unit.coo())
    r = jnp.take(row, eid)
    c = jnp.take(col, eid)

    def fetch(target, field):
        x = _fetch(g, etid, target, field)
        idx = {"u": r, "v": c, "e": eid}[target]
        return jnp.take(x, idx, axis=0)

    if mfunc.rhs is None:
        return fetch(mfunc.lhs, mfunc.lhs_field)
    x = fetch(mfunc.lhs, mfunc.lhs_field)
    y = fetch(mfunc.rhs, mfunc.rhs_field)
    op = mfunc.binary_op
    if op == "dot":
        return (x * y).sum(-1, keepdims=True)
    # standard -1-dim broadcast (infer_broadcast_shape semantics)
    nd = max(x.ndim, y.ndim)
    while x.ndim < nd:
        x = x[:, None]
    while y.ndim < nd:
        y = y[:, None]
    return {"add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
            "div": jnp.divide}[op](x, y)


def invoke_gspmm(g, etid, mfunc: BuiltinMessage, rfunc: BuiltinReduce):
    """Fused message+reduce (reference ``core.py:311``)."""
    unit = g._units[etid]
    reduce_op = rfunc.name
    if mfunc.rhs is None:
        if mfunc.name == "copy_u":
            x = _fetch(g, etid, "u", mfunc.lhs_field)
            return gspmm(unit, "copy_lhs", reduce_op, x, None)
        x = _fetch(g, etid, "e", mfunc.lhs_field)
        return gspmm(unit, "copy_rhs", reduce_op, None, x)
    lhs, rhs = mfunc.lhs, mfunc.rhs
    x = _fetch(g, etid, lhs, mfunc.lhs_field)
    y = _fetch(g, etid, rhs, mfunc.rhs_field)
    op = mfunc.binary_op
    if (lhs, rhs) == ("u", "e"):
        if (op in ("mul", "div") and reduce_op in ("sum", "mean")
                and hasattr(unit, "_slot_weights")):
            # static-weight fast path: pre-permuted slot weights cached
            # under the edata field name (UnitGraph.cache_edge_weights)
            from .ops.pallas import dispatch as pallas_dispatch
            out = pallas_dispatch.try_spmm_static(
                unit, op, x, mfunc.rhs_field, current_w=y)
            if out is not None:
                if reduce_op == "mean":
                    deg = jnp.maximum(unit.in_degrees(), 1).astype(
                        out.dtype)
                    out = out / deg.reshape(
                        (-1,) + (1,) * (out.ndim - 1))
                return out
        return gspmm(unit, op, reduce_op, x, y)
    if (lhs, rhs) == ("e", "u"):
        swapped = {"add": "add", "mul": "mul", "sub": None, "div": None}
        if swapped.get(op):
            return gspmm(unit, swapped[op], reduce_op, y, x)
    # General case (v-targets, dot, non-commutative e-u): materialize the
    # message then reduce with copy_rhs — matches reference fallback.
    msg = gsddmm(unit, op, x, y, lhs_target=lhs, rhs_target=rhs)
    return gspmm(unit, "copy_rhs", reduce_op, None, msg)


_FUSABLE_MSG = {"copy_u", "copy_e"}


def _is_builtin_pair(mfunc, rfunc) -> bool:
    return isinstance(mfunc, BuiltinMessage) and isinstance(
        rfunc, BuiltinReduce)


# ---------------------------------------------------------------------------
# UDF paths
# ---------------------------------------------------------------------------


def invoke_edge_udf(g, eid, etid, func: Callable):
    """Materialize per-edge tensors and call the UDF (reference
    ``core.py:52``)."""
    unit = g._units[etid]
    if eid is None:
        row, col = unit.coo()
        eid = jnp.arange(unit.num_edges, dtype=jnp.int32)
    else:
        row, col = (x[eid] for x in unit.coo())
    sframe = _src_frame(g, etid)
    dframe = _dst_frame(g, etid)
    eframe = _edge_frame(g, etid)
    src_data = {k: jnp.take(v, row, axis=0) for k, v in sframe.items()}
    dst_data = {k: jnp.take(v, col, axis=0) for k, v in dframe.items()}
    edge_data = {k: (jnp.take(v, eid, axis=0) if eid is not None else v)
                 for k, v in eframe.items()}
    etype = g.canonical_etypes[etid]
    batch = EdgeBatch(g, eid, etype, src_data, edge_data, dst_data)
    return func(batch)


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def invoke_udf_reduce(g, etid, func: Callable, msgdata: Dict):
    """Degree-bucketed UDF reduction (reference ``core.py:99-174``).

    Host-level: buckets are data-dependent.  With ``udf_pow2_bucketing``
    (default), dst nodes are grouped by power-of-two-PADDED degree and the
    bucket's node count is padded to a power of two as well, so a
    power-law graph with thousands of distinct degrees compiles only
    O(log(max_deg) * log(N)) mailbox shapes instead of one per degree.
    Padded mailbox rows are zero; the UDF sees the padding through
    ``NodeBatch.mailbox_mask`` / ``NodeBatch.degrees()`` (sum-style
    reducers are unaffected; mean/max/sequence reducers must consult the
    mask — see ``udf.NodeBatch``).  Set the flag to False for exact
    per-degree buckets (reference semantics, unbounded shape count).
    """
    from .utils import config as _config
    unit = g._units[etid]
    csc = unit.csc()
    indptr = np.asarray(csc.indptr)
    eids_sorted = np.asarray(csc.eids)
    deg = indptr[1:] - indptr[:-1]
    dt = g.canonical_etypes[etid][2]
    dframe = g._node_frames[g.get_dst_ntype_id(dt)]

    num_dst = unit.num_dst
    pow2 = _config.get("udf_pow2_bucketing")
    if pow2:
        bucket_of = np.where(deg > 0,
                             2 ** np.ceil(np.log2(np.maximum(deg, 1))
                                          ).astype(np.int64), 0)
    else:
        bucket_of = deg
    order = [(int(d), np.nonzero(bucket_of == d)[0])
             for d in np.unique(bucket_of).tolist()]
    results = {}
    for dpad, nodes in order:
        if dpad == 0:
            continue
        n_real = len(nodes)
        n_pad = _next_pow2(n_real) if pow2 else n_real
        node_deg = deg[nodes]
        starts = indptr[nodes]
        # positions per node: indptr[i] + t for t < deg_i, clamped into the
        # node's own range for the padded tail (masked to zero after gather)
        t = np.arange(dpad)[None, :]
        pos = starts[:, None] + np.minimum(t, (node_deg - 1)[:, None])
        mask = t < node_deg[:, None]                      # (n_real, dpad)
        if n_pad > n_real:   # pad the node axis by repeating node 0
            pad_rows = np.zeros((n_pad - n_real, dpad), np.int64)
            pos = np.concatenate([pos, pad_rows + pos[0:1]], 0)
            mask = np.concatenate(
                [mask, np.zeros((n_pad - n_real, dpad), bool)], 0)
            nodes_pad = np.concatenate(
                [nodes, np.full(n_pad - n_real, nodes[0])])
        else:
            nodes_pad = nodes
        msg_eids = eids_sorted[pos.reshape(-1)]
        nodes_j = jnp.asarray(nodes_pad, jnp.int32)
        mask_j = jnp.asarray(mask)
        mailbox = {}
        for k, v in msgdata.items():
            m = jnp.take(v, jnp.asarray(msg_eids, jnp.int32),
                         axis=0).reshape((n_pad, dpad) + v.shape[1:])
            if pow2:
                m = jnp.where(
                    mask_j.reshape(mask_j.shape + (1,) * (m.ndim - 2)),
                    m, 0)
            mailbox[k] = m
        ndata = {k: jnp.take(v, nodes_j, axis=0) for k, v in dframe.items()}
        batch = NodeBatch(g, nodes_j, dt, ndata, mailbox,
                          mailbox_mask=(mask_j if pow2 else None))
        out = func(batch)
        for k, v in out.items():
            results.setdefault(k, []).append((nodes, v[:n_real]))

    merged = {}
    for k, chunks in results.items():
        feat_shape = chunks[0][1].shape[1:]
        dtype = chunks[0][1].dtype
        buf = jnp.zeros((num_dst,) + feat_shape, dtype)
        for nodes, v in chunks:
            buf = buf.at[jnp.asarray(nodes, jnp.int32)].set(v)
        merged[k] = buf
    return merged


def invoke_node_udf(g, nodes, ntype, func: Callable):
    ntid = g.get_ntype_id(ntype) if not g.is_block else g.get_dst_ntype_id(
        ntype)
    frame = g._node_frames[ntid]
    if nodes is None:
        nodes = jnp.arange(g._num_nodes[ntid], dtype=jnp.int32)
        data = dict(frame)
    else:
        nodes = jnp.asarray(nodes, jnp.int32)
        data = {k: jnp.take(v, nodes, axis=0) for k, v in frame.items()}
    batch = NodeBatch(g, nodes, ntype, data)
    return func(batch)


# ---------------------------------------------------------------------------
# the dispatcher
# ---------------------------------------------------------------------------


def message_passing(g, mfunc, rfunc, afunc, etid: int = 0):
    """Compute reduced node data for one relation (reference
    ``core.py:372-425``); returns a dict {field: (num_dst, ...) array}."""
    if _is_builtin_pair(mfunc, rfunc):
        out = invoke_gspmm(g, etid, mfunc, rfunc)
        ndata = {rfunc.out_field: out}
    elif isinstance(mfunc, BuiltinMessage):
        msg = invoke_gsddmm(g, etid, mfunc)
        ndata = invoke_udf_reduce(g, etid, rfunc, {mfunc.out_field: msg})
    else:
        msgdata = invoke_edge_udf(g, None, etid, mfunc)
        if isinstance(rfunc, BuiltinReduce):
            unit = g._units[etid]
            out = gspmm(unit, "copy_rhs", rfunc.name, None,
                        msgdata[rfunc.msg_field])
            ndata = {rfunc.out_field: out}
        else:
            ndata = invoke_udf_reduce(g, etid, rfunc, msgdata)
    if afunc is not None:
        dt = g.canonical_etypes[etid][2]
        didx = g.get_dst_ntype_id(dt)
        saved = g._node_frames[didx]
        g._node_frames[didx] = {**saved, **ndata}
        try:
            nodes = jnp.arange(g._num_nodes[didx], dtype=jnp.int32)
            batch = NodeBatch(g, nodes, dt, g._node_frames[didx])
            ndata = {**ndata, **afunc(batch)}
        finally:
            g._node_frames[didx] = saved
    return ndata


# ---------------------------------------------------------------------------
# graph-level in-place wrappers (DGLGraph API surface)
# ---------------------------------------------------------------------------


def update_all_inplace(g, mfunc, rfunc, afunc=None, etype=None):
    """``g.update_all`` (reference ``heterograph.py:5018``)."""
    etid = g.get_etype_id(etype)
    ndata = message_passing(g, mfunc, rfunc, afunc, etid)
    dt = g.canonical_etypes[etid][2]
    g._node_frames[g.get_dst_ntype_id(dt)].update(ndata)
    return g


def update_all(g, mfunc, rfunc, afunc=None, etype=None):
    """Functional variant: returns the reduced field array(s) without
    mutating the graph."""
    etid = g.get_etype_id(etype)
    return message_passing(g, mfunc, rfunc, afunc, etid)


def apply_edges_inplace(g, func, edges=None, etype=None):
    """``g.apply_edges`` (reference ``heterograph.py:4597``)."""
    etid = g.get_etype_id(etype)
    if isinstance(func, BuiltinMessage):
        if edges is not None:
            eid = jnp.asarray(edges, jnp.int32)
            out = invoke_gsddmm_subset(g, etid, func, eid)
            fr = g._edge_frames[etid]
            if func.out_field in fr:
                fr[func.out_field] = fr[func.out_field].at[eid].set(out)
            else:
                buf = jnp.zeros((g._units[etid].num_edges,)
                                + out.shape[1:], out.dtype)
                fr[func.out_field] = buf.at[eid].set(out)
            return g
        out = invoke_gsddmm(g, etid, func)
        g._edge_frames[etid][func.out_field] = out
        return g
    eid = None if edges is None else jnp.asarray(edges, jnp.int32)
    out = invoke_edge_udf(g, eid, etid, func)
    if eid is None:
        g._edge_frames[etid].update(out)
    else:
        for k, v in out.items():
            if k in g._edge_frames[etid]:
                g._edge_frames[etid][k] = (
                    g._edge_frames[etid][k].at[eid].set(v))
            else:
                buf = jnp.zeros((g._units[etid].num_edges,) + v.shape[1:],
                                v.dtype)
                g._edge_frames[etid][k] = buf.at[eid].set(v)
    return g


def apply_edges(g, func, edges=None, etype=None):
    """Functional apply_edges: returns the edge tensor(s)."""
    etid = g.get_etype_id(etype)
    if isinstance(func, BuiltinMessage):
        if edges is not None:
            return invoke_gsddmm_subset(g, etid, func,
                                        jnp.asarray(edges, jnp.int32))
        return invoke_gsddmm(g, etid, func)
    eid = None if edges is None else jnp.asarray(edges, jnp.int32)
    return invoke_edge_udf(g, eid, etid, func)


def apply_nodes(g, func, v=None, ntype=None):
    out = invoke_node_udf(g, v, ntype, func)
    ntid = (g.get_dst_ntype_id(ntype) if g.is_block
            else g.get_ntype_id(ntype))
    frame = g._node_frames[ntid]
    if v is None:
        frame.update(out)
    else:
        v = jnp.asarray(v, jnp.int32)
        for k, val in out.items():
            if k in frame:
                frame[k] = frame[k].at[v].set(val)
            else:
                buf = jnp.zeros((g._num_nodes[ntid],) + val.shape[1:],
                                val.dtype)
                frame[k] = buf.at[v].set(val)
    return g


def _fused_src_blocks(g, items):
    """Ordered distinct (src_ntype_idx, field) blocks for a fused group and
    their row offsets in the stacked src space."""
    blocks, off, total = [], {}, 0
    for etid, mfunc in items:
        st = g.canonical_etypes[etid][0]
        sidx = g.get_src_ntype_id(st)
        key = (sidx, mfunc.lhs_field)
        if key not in off:
            off[key] = total
            total += g._num_nodes[sidx]
            blocks.append(key)
    return blocks, off, total


def _fused_unit(g, didx, items):
    """Build (or fetch cached) the stacked UnitGraph for a fused group:
    all relations' edges concatenated, src spaces offset per distinct
    (src ntype, field) block, one shared dst space.  One SpMM over this
    unit replaces one SpMM per relation (the TPU answer to the
    per-relation program explosion, cf. reference ``spmm_hetero.cu``)."""
    from .graph.unitgraph import UnitGraph
    key = (didx,) + tuple(
        (etid, m.name, m.lhs_field, m.rhs_field) for etid, m in items)
    unit = g._fused_cache.get(key)
    if unit is None:
        blocks, off, total = _fused_src_blocks(g, items)
        rows, cols = [], []
        all_host = all(isinstance(g._units[etid].coo()[0], np.ndarray)
                       for etid, _ in items)
        # host graphs stay host-side: keeps the stacked unit eligible
        # for the host tiled-format build and avoids eager device
        # round-trips when assembling the stack
        cat = np.concatenate if all_host else jnp.concatenate
        for etid, mfunc in items:
            u = g._units[etid]
            row, col = u.coo()
            st = g.canonical_etypes[etid][0]
            sidx = g.get_src_ntype_id(st)
            o = off[(sidx, mfunc.lhs_field)]
            rows.append((np.asarray(row) + o) if all_host
                        else jnp.asarray(row) + o)
            cols.append(np.asarray(col) if all_host
                        else jnp.asarray(col))
        num_dst = g._units[items[0][0]].num_dst
        unit = UnitGraph.from_coo(total, num_dst, cat(rows), cat(cols))
        g._fused_cache[key] = unit
    return unit


def _run_fused_group(g, didx, kind, items):
    """One gspmm over the stacked unit graph == sum over the group's
    per-relation sum-reduced outputs."""
    items = sorted(items, key=lambda it: it[0])
    unit = _fused_unit(g, didx, items)
    if kind == "copy_e":
        e = jnp.concatenate(
            [_edge_frame(g, etid)[m.lhs_field] for etid, m in items])
        return gspmm(unit, "copy_rhs", "sum", None, e)
    blocks, _, _ = _fused_src_blocks(g, items)
    x = jnp.concatenate(
        [g._node_frames[sidx][field] for sidx, field in blocks])
    if kind == "copy_u":
        return gspmm(unit, "copy_lhs", "sum", x, None)
    # u_mul_e
    e = jnp.concatenate(
        [_edge_frame(g, etid)[m.rhs_field] for etid, m in items])
    return gspmm(unit, "mul", "sum", x, e)


def _fusable_kind(g, funcs):
    """The fusion class of one etype entry, or None."""
    mfunc, rfunc = funcs[0], funcs[1]
    afunc = funcs[2] if len(funcs) > 2 else None
    if afunc is not None or not _is_builtin_pair(mfunc, rfunc):
        return None
    if rfunc.name != "sum":
        return None
    if mfunc.name in ("copy_u", "copy_e", "u_mul_e"):
        return mfunc.name
    return None


def _group_shapes_ok(g, kind, items):
    """All feature operands in a fused group must share trailing shape."""
    def shapes(getter):
        return {tuple(getter(etid, m).shape[1:]) for etid, m in items}
    try:
        if kind in ("copy_u", "u_mul_e"):
            if len(shapes(lambda etid, m: _src_frame(g, etid)[
                    m.lhs_field])) != 1:
                return False
        if kind == "copy_e":
            if len(shapes(lambda etid, m: _edge_frame(g, etid)[
                    m.lhs_field])) != 1:
                return False
        if kind == "u_mul_e":
            if len(shapes(lambda etid, m: _edge_frame(g, etid)[
                    m.rhs_field])) != 1:
                return False
    except KeyError:
        return False
    return True


def multi_update_all_inplace(g, etype_dict, cross_reducer,
                             apply_node_func=None):
    """``g.multi_update_all`` (reference ``heterograph.py:5161``): per-etype
    message passing, then cross-type merge with ``cross_reducer`` in
    {sum, max, min, mean, stack}.

    Fused dispatch: when several relations target the same dst type with
    the same builtin message kind, sum reduce, and sum/mean cross-reduce,
    their edges are stacked into one cached unit graph and reduced by a
    single SpMM (sum of per-relation sums == sum over stacked edges)."""
    from .utils import config as _config
    # ---- partition entries into fusable groups and singles -------------
    entries = []   # (etid, didx, out_field, kind, funcs)
    for etype, funcs in etype_dict.items():
        etid = g.get_etype_id(etype)
        dt = g.canonical_etypes[etid][2]
        didx = g.get_dst_ntype_id(dt)
        # mesh-sharded units (parallel/halo_ops.HaloUnit) have no COO to
        # stack — each relation runs its own halo-plane kernel (all R
        # still trace into ONE program under jit; PERF_NOTES round 3)
        kind = (_fusable_kind(g, funcs)
                if cross_reducer in ("sum", "mean")
                and _config.get("fuse_multi_update_all")
                and hasattr(g._units[etid], "coo") else None)
        entries.append((etid, didx, funcs[1].out_field if kind else None,
                        kind, funcs))

    groups: Dict[tuple, list] = {}
    for etid, didx, out_field, kind, funcs in entries:
        if kind is not None:
            groups.setdefault((didx, out_field, kind), []).append(
                (etid, funcs[0]))

    # per_dst[didx][field] = list of (tensor, n_relations_it_represents)
    per_dst: Dict[int, Dict[str, list]] = {}
    fused_done = set()
    for etid, didx, out_field, kind, funcs in entries:
        gkey = (didx, out_field, kind)
        if (kind is not None and len(groups[gkey]) > 1
                and _group_shapes_ok(g, kind, groups[gkey])):
            if gkey in fused_done:
                continue
            fused_done.add(gkey)
            out = _run_fused_group(g, didx, kind, groups[gkey])
            per_dst.setdefault(didx, {}).setdefault(out_field, []).append(
                (out, len(groups[gkey])))
            continue
        mfunc, rfunc = funcs[0], funcs[1]
        afunc = funcs[2] if len(funcs) > 2 else None
        ndata = message_passing(g, mfunc, rfunc, afunc, etid)
        for k, v in ndata.items():
            per_dst.setdefault(didx, {}).setdefault(k, []).append((v, 1))

    for didx, fields in per_dst.items():
        for k, weighted in fields.items():
            vals = [v for v, _ in weighted]
            n_rel = sum(w for _, w in weighted)
            if len(vals) == 1 and cross_reducer != "stack":
                merged = vals[0]
                if cross_reducer == "mean" and n_rel > 1:
                    merged = merged / n_rel
            elif cross_reducer == "sum":
                merged = sum(vals[1:], vals[0])
            elif cross_reducer == "max":
                merged = jnp.stack(vals).max(axis=0)
            elif cross_reducer == "min":
                merged = jnp.stack(vals).min(axis=0)
            elif cross_reducer == "mean":
                merged = sum(vals[1:], vals[0]) / n_rel
            elif cross_reducer == "stack":
                merged = jnp.stack(vals, axis=1)
            else:
                raise ValueError(cross_reducer)
            g._node_frames[didx][k] = merged
    if apply_node_func is not None:
        for didx in per_dst:
            nt = g.ntypes[didx]
            apply_nodes(g, apply_node_func, ntype=nt)
    return g


def send_and_recv_inplace(g, edges, mfunc, rfunc, afunc=None, etype=None):
    """``g.send_and_recv`` (reference ``heterograph.py:4714``): message
    passing restricted to an edge subset."""
    from .graph.subgraph import edge_subgraph
    etid = g.get_etype_id(etype)
    eid = jnp.asarray(edges, jnp.int32)
    sub = edge_subgraph(g, {g.canonical_etypes[etid]: eid},
                        relabel_nodes=False, store_ids=False)
    ndata = message_passing(sub, mfunc, rfunc, afunc,
                            sub.get_etype_id(g.canonical_etypes[etid]))
    dt = g.canonical_etypes[etid][2]
    g._node_frames[g.get_dst_ntype_id(dt)].update(ndata)
    return g


def pull_inplace(g, v, mfunc, rfunc, afunc=None, etype=None):
    """``g.pull``: recompute only nodes ``v`` (reference semantics: other
    nodes keep their old value)."""
    etid = g.get_etype_id(etype)
    ndata = message_passing(g, mfunc, rfunc, afunc, etid)
    # nodes without in-edges are not updated (reference recv semantics:
    # only nodes receiving messages get new values)
    v_np = np.asarray(v).reshape(-1)
    deg = np.asarray(g._units[etid].in_degrees())
    v_np = v_np[deg[v_np] > 0]
    if len(v_np) == 0:
        return g
    v = jnp.asarray(v_np, jnp.int32)
    dt = g.canonical_etypes[etid][2]
    frame = g._node_frames[g.get_dst_ntype_id(dt)]
    for k, new in ndata.items():
        if k in frame:
            frame[k] = frame[k].at[v].set(jnp.take(new, v, axis=0))
        else:
            buf = jnp.zeros_like(new)
            frame[k] = buf.at[v].set(jnp.take(new, v, axis=0))
    return g


def push_inplace(g, u, mfunc, rfunc, afunc=None, etype=None):
    """``g.push``: send from nodes ``u`` and update their out-neighbors."""
    from .graph.subgraph import out_subgraph
    etid = g.get_etype_id(etype)
    u_np = np.asarray(u)
    sub = out_subgraph(g, {g.canonical_etypes[etid][0]: u_np},
                       relabel_nodes=False, store_ids=False)
    sub_etid = sub.get_etype_id(g.canonical_etypes[etid])
    ndata = message_passing(sub, mfunc, rfunc, afunc, sub_etid)
    # only dst nodes with at least one pushed edge get updated
    unitsub = sub._units[sub_etid]
    touched = np.unique(np.asarray(unitsub.coo()[1]))
    v = jnp.asarray(touched, jnp.int32)
    dt = g.canonical_etypes[etid][2]
    frame = g._node_frames[g.get_dst_ntype_id(dt)]
    for k, new in ndata.items():
        if k in frame:
            frame[k] = frame[k].at[v].set(jnp.take(new, v, axis=0))
        else:
            frame[k] = jnp.zeros_like(new).at[v].set(jnp.take(new, v, axis=0))
    return g
