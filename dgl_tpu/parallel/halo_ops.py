"""General sharded message passing over the halo SPMD plane.

Round-2 shipped exactly one mesh operation (copy_u/sum,
``spmd.halo_spmm_sum``).  This module generalizes the halo plane to the
full single-chip kernel contract so unchanged ``nn`` modules train
multi-chip:

* ``halo_gspmm``  — op ∈ {add, sub, mul, div, copy_lhs, copy_rhs} ×
  reduce ∈ {sum, max, min, mean} (reference dispatch
  ``src/array/kernel.cc:20-44``, per-partition execution
  ``python/dgl/distributed/graph_services.py:35-255``);
* ``halo_gsddmm`` — op ∈ {add, sub, mul, div, dot, copy_lhs, copy_rhs}
  over targets {u, v, e} (reference ``src/array/kernel.cc`` SDDMM);
* ``halo_edge_softmax`` — dst-normalized softmax (reference composition
  ``src/array/kernel.cc:309-340``); dst-partitioned edges make it a
  purely partition-local reduction (no collective);
* ``HaloUnit`` + ``MeshGraph`` — a ``Graph``-API adapter (frames,
  ndata/edata views, ``update_all``/``apply_edges``) so
  ``dgl_tpu.nn`` layers run on a device mesh unchanged; built via
  ``shard_graph(g, mesh)`` (the TPU answer to ``DistGraph``,
  reference ``distributed/dist_graph.py:519``).

Data layouts:
* node features: row-sharded ``(P*npp, *F)`` jax.Arrays;
* edge features: the **slot layout** — a plain ``(P, ES, *F)`` array
  sharded on the partition axis, where the first ``EL`` slots of each
  partition are its local edges and the remaining ``EH`` its halo
  edges (``ES = EL + EH``; pad slots hold zeros).  Being a plain array
  keeps every elementwise op (activations, dropout, arithmetic) working
  untouched on sharded edge data; ``edge_slots_from_canonical`` /
  ``edge_slots_to_canonical`` convert to/from the canonical ``(E, *F)``
  order via the ``hg.l_eid``/``hg.h_eid`` maps.

All collective traffic is the boundary-row ``all_to_all`` of
``spmd.halo_spmm_sum``; every op here is built from differentiable
primitives (take / segment_* / all_to_all), so JAX AD yields the
Appendix-A VJPs — the transpose of the halo exchange is the same
all_to_all carrying gradient rows back.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spmd import HaloShardedGraph, build_halo_sharded_graph, \
    shard_halo_graph, pad_node_features, exchange_operands, make_exchange
from ..ops.gspmm import _apply_binary, _ensure_float, align_feat_ranks

_NEG_BIG = -1e30


# ---------------------------------------------------------------------------
# slot layout for edge data
# ---------------------------------------------------------------------------


def _n_local(hg: HaloShardedGraph) -> int:
    return int(hg.lsrc.shape[1])


def _slot_eids(hg: HaloShardedGraph):
    return jnp.concatenate([hg.l_eid, hg.h_eid], axis=1)   # (P, ES)


def edge_slots_from_canonical(hg: HaloShardedGraph, arr):
    """Canonical (E, *F) edge array -> slot layout (P, ES, *F);
    pad slots get 0."""
    arr = jnp.asarray(arr)
    eid = _slot_eids(hg)
    v = jnp.take(arr, jnp.maximum(eid, 0), axis=0)
    mask = (eid >= 0).reshape(eid.shape + (1,) * (arr.ndim - 1))
    return jnp.where(mask, v, 0)


def edge_slots_to_canonical(hg: HaloShardedGraph, slots):
    """Slot layout (P, ES, *F) -> canonical (E, *F); pads dropped."""
    feat = slots.shape[2:]
    eid = _slot_eids(hg)
    # -1 pads become num_edges (a true out-of-bounds index) so
    # mode="drop" discards them — negative indices would wrap
    idx = jnp.where(eid < 0, hg.num_edges, eid).reshape(-1)
    out = jnp.zeros((hg.num_edges,) + feat, slots.dtype)
    return out.at[idx].set(slots.reshape((-1,) + feat), mode="drop")


def _is_slot_layout(hg: HaloShardedGraph, arr) -> bool:
    es = _n_local(hg) + int(hg.hsrc.shape[1])
    return (hasattr(arr, "ndim") and arr.ndim >= 2
            and arr.shape[0] == hg.num_parts and arr.shape[1] == es)


def _as_slots(hg, arr):
    if arr is None or _is_slot_layout(hg, arr):
        return arr
    return edge_slots_from_canonical(hg, arr)


# ---------------------------------------------------------------------------
# the generalized kernels
# ---------------------------------------------------------------------------


def _exchange(x_local, sidx, axis):
    """Boundary-row halo exchange: (npp, *F) local rows -> (P*H, *F)
    received block (the v2 collective of ``spmd.halo_spmm_sum``)."""
    send = jnp.take(x_local, sidx, axis=0)            # (P, H, *F)
    recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
    return recv.reshape((-1,) + x_local.shape[1:])


def halo_gspmm(hg: HaloShardedGraph, op: str, reduce_op: str, u, e,
               mesh: Mesh, axis: str = "data"):
    """g-SpMM over the halo plane.  ``u``: (P*npp, *F) row-sharded or
    None; ``e``: slot-layout (P, ES, *F) or canonical (E, *F) or None.
    Returns (P*npp, *F) row-sharded."""
    npp = hg.nodes_per_part
    nl = _n_local(hg)
    if op == "copy_lhs":
        e = None
    elif op == "copy_rhs":
        u = None
    u = _ensure_float(u)
    e = _ensure_float(_as_slots(hg, e))

    operands, specs = [], []
    if u is not None:
        operands.append(u)
        specs.append(P(axis))
    if e is not None:
        operands.append(e)
        specs.append(P(axis))
    ex_ops = exchange_operands(hg)
    operands += [hg.lsrc, hg.ldst, hg.hsrc, hg.hdst, hg.in_deg] + ex_ops
    specs += [P(axis)] * (5 + len(ex_ops))

    def local_fn(*args):
        it = iter(args)
        x_local = next(it) if u is not None else None
        eb = next(it)[0] if e is not None else None
        lsrc, ldst, hsrc, hdst, deg = (next(it)[0] for _ in range(5))
        ex_blocks = list(it)
        el = eb[:nl] if eb is not None else None
        eh = eb[nl:] if eb is not None else None

        if x_local is not None:
            halo = make_exchange(hg, ex_blocks, axis)(x_local)
            lu = jnp.take(x_local, lsrc, axis=0)
            hu = jnp.take(halo, hsrc, axis=0)
        else:
            lu = hu = None
        lu2, el2 = align_feat_ranks(lu, el)
        hu2, eh2 = align_feat_ranks(hu, eh)
        if op == "div":
            # pad slots hold 0 edge values; x/0 = inf forward is sliced
            # away at the dummy dst, but its VJP would emit 0*inf = NaN
            # into pad-slot gradients — substitute a harmless 1
            lpad = (ldst == npp).reshape(
                ldst.shape + (1,) * (el2.ndim - 1))
            hpad = (hdst == npp).reshape(
                hdst.shape + (1,) * (eh2.ndim - 1))
            el2 = jnp.where(lpad, jnp.ones_like(el2), el2)
            eh2 = jnp.where(hpad, jnp.ones_like(eh2), eh2)
        lmsg = _apply_binary(op, lu2, el2)
        hmsg = _apply_binary(op, hu2, eh2)

        if reduce_op in ("sum", "mean"):
            out = jax.ops.segment_sum(lmsg, ldst, num_segments=npp + 1)
            out = out + jax.ops.segment_sum(hmsg, hdst,
                                            num_segments=npp + 1)
            out = out[:npp]
            if reduce_op == "mean":
                d = jnp.maximum(deg, 1).astype(out.dtype)
                out = out / d.reshape((-1,) + (1,) * (out.ndim - 1))
            return out
        seg = (jax.ops.segment_max if reduce_op == "max"
               else jax.ops.segment_min)
        # pad edges aim at the dummy slot npp; empty segments come back
        # ±inf and are zeroed like the reference's zero-initialized
        # outputs (mirrors single-chip ``gspmm_unit``)
        o1 = seg(lmsg, ldst, num_segments=npp + 1)[:npp]
        o2 = seg(hmsg, hdst, num_segments=npp + 1)[:npp]
        out = jnp.maximum(o1, o2) if reduce_op == "max" \
            else jnp.minimum(o1, o2)
        empty = (deg == 0).reshape((-1,) + (1,) * (out.ndim - 1))
        return jnp.where(empty | ~jnp.isfinite(out),
                         jnp.zeros_like(out), out)

    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(axis))
    return fn(*operands)


def halo_gsddmm(hg: HaloShardedGraph, op: str, lhs, rhs,
                lhs_target: str = "u", rhs_target: str = "v",
                mesh: Mesh = None, axis: str = "data"):
    """g-SDDMM over the halo plane; returns a slot-layout (P, ES, *F)
    edge array (pad slots 0).

    u-targets ride the same boundary-row all_to_all as halo_gspmm;
    v-targets are partition-local (edges are dst-partitioned)."""
    npp = hg.nodes_per_part
    nl = _n_local(hg)
    if op == "copy_lhs":
        rhs = None
    if op == "copy_rhs":
        lhs = None
    if lhs_target == "e":
        lhs = _as_slots(hg, lhs)
    if rhs_target == "e":
        rhs = _as_slots(hg, rhs)
    lhs = _ensure_float(lhs)
    rhs = _ensure_float(rhs)

    operands, specs = [], []
    for x in (lhs, rhs):
        if x is not None:
            operands.append(x)
            specs.append(P(axis))
    ex_ops = exchange_operands(hg)
    operands += [hg.lsrc, hg.ldst, hg.hsrc, hg.hdst] + ex_ops
    specs += [P(axis)] * (4 + len(ex_ops))

    def local_fn(*args):
        it = iter(args)
        lhs_b = next(it) if lhs is not None else None
        rhs_b = next(it) if rhs is not None else None
        lsrc, ldst, hsrc, hdst = (next(it)[0] for _ in range(4))
        ex_blocks = list(it)
        lmask = ldst != npp
        hmask = hdst != npp

        def gather(data, target):
            if data is None:
                return None, None
            if target == "e":
                d = data[0]                  # (ES, *F) block
                return d[:nl], d[nl:]
            if target == "v":
                # dst side is partition-local; clip the pad index npp
                return (jnp.take(data, jnp.minimum(ldst, npp - 1), axis=0),
                        jnp.take(data, jnp.minimum(hdst, npp - 1), axis=0))
            # u: local rows + exchanged halo rows (an identical double
            # exchange when both operands target u is CSE'd by XLA)
            halo = make_exchange(hg, ex_blocks, axis)(data)
            return (jnp.take(data, lsrc, axis=0),
                    jnp.take(halo, hsrc, axis=0))

        xl, xh = gather(lhs_b, lhs_target)
        yl, yh = gather(rhs_b, rhs_target)

        def combine(x, y, mask):
            if op not in ("copy_lhs", "copy_rhs", "dot"):
                x, y = align_feat_ranks(x, y)
            if op == "div":
                # pad-slot denominators may be 0: x/0 = inf is masked in
                # the forward but poisons the VJP (0 * inf = NaN)
                my = mask.reshape(mask.shape + (1,) * (y.ndim - 1))
                y = jnp.where(my, y, jnp.ones_like(y))
            if op == "dot":
                out = jnp.sum(x * y, axis=-1, keepdims=True)
            else:
                out = _apply_binary(op, x, y)
            m = mask.reshape(mask.shape + (1,) * (out.ndim - 1))
            return jnp.where(m, out, 0)

        return jnp.concatenate(
            [combine(xl, yl, lmask), combine(xh, yh, hmask)])[None]

    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(axis))
    return fn(*operands)


def _lse_transpose(hg: HaloShardedGraph, blocks, axis, m_halo, s_halo,
                   m_init, s_init):
    """Reverse halo plane with log-sum-exp merge: per-halo-row partial
    softmax stats (max, sumexp-rel-to-max) ride the TRANSPOSE exchange
    back to the rows' owners and merge into per-src stats via the LSE
    combine m = max(m1, m2), s = s1*e^(m1-m) + s2*e^(m2-m).  One
    collective round regardless of how many partitions consume a row."""
    if hg.exchange == "ppermute":
        caps = hg.h_caps or ()
        perms = hg.perms or ()
        out_m, out_s = m_init, s_init
        backs = []
        off = 0
        for r, sk in enumerate(blocks):
            bm = jax.lax.dynamic_slice_in_dim(m_halo, off, caps[r], 0)
            bs = jax.lax.dynamic_slice_in_dim(s_halo, off, caps[r], 0)
            off += caps[r]
            inv = [(d, s) for (s, d) in perms[r]]
            bm = jax.lax.ppermute(bm, axis, inv)
            bs = jax.lax.ppermute(bs, axis, inv)
            backs.append((sk[0], bm, bs))
            out_m = out_m.at[sk[0]].max(bm)
        for sidx, bm, bs in backs:
            out_s = out_s.at[sidx].add(
                bs * jnp.exp(bm - jnp.take(out_m, sidx, axis=0)))
        return out_m, out_s
    sidx = blocks[0][0]                       # (P, H) send-row table
    pn, h = hg.num_parts, hg.h_max
    feat = m_halo.shape[1:]
    bm = jax.lax.all_to_all(m_halo.reshape((pn, h) + feat), axis, 0, 0,
                            tiled=True).reshape((pn * h,) + feat)
    bs = jax.lax.all_to_all(s_halo.reshape((pn, h) + feat), axis, 0, 0,
                            tiled=True).reshape((pn * h,) + feat)
    flat = sidx.reshape(-1)
    out_m = m_init.at[flat].max(bm)
    out_s = s_init.at[flat].add(
        bs * jnp.exp(bm - jnp.take(out_m, flat, axis=0)))
    return out_m, out_s


def _halo_edge_softmax_by_src(hg: HaloShardedGraph, score, mesh: Mesh,
                              axis: str, edge_mask=None):
    """src-normalized sharded edge softmax (reference
    ``src/array/kernel.cc:309-340`` with reverse graph): a src's
    out-edges scatter across dst partitions, so each partition reduces
    partial (max, sumexp) stats per src row, the reverse plane
    LSE-merges them at the owner, and the regular forward exchange
    ships the merged normalizers back to every consumer."""
    npp_src = hg.npp_src
    nl = _n_local(hg)
    score = _as_slots(hg, score)
    em = (edge_slots_from_canonical(hg, jnp.asarray(edge_mask, bool))
          if edge_mask is not None else None)
    ex_ops = exchange_operands(hg)
    operands = [score, hg.lsrc, hg.ldst, hg.hsrc, hg.hdst] + ex_ops
    n_fixed = len(operands)
    if em is not None:
        operands.append(em)
    specs = [P(axis)] * len(operands)
    npp_dst = hg.nodes_per_part

    def local_fn(sb, lsrc, ldst, hsrc, hdst, *rest):
        sb, lsrc, ldst, hsrc, hdst = (a[0] for a in
                                      (sb, lsrc, ldst, hsrc, hdst))
        ex_blocks = list(rest[: n_fixed - 5])
        em_b = rest[n_fixed - 5:]
        el, eh = sb[:nl], sb[nl:]
        feat = el.shape[1:]
        lmask = (ldst != npp_dst).reshape((nl,) + (1,) * len(feat))
        hmask = (hdst != npp_dst).reshape((eh.shape[0],)
                                          + (1,) * len(feat))
        if em_b:
            emx = em_b[0][0]
            lmask = lmask & emx[:nl].reshape((nl,) + (1,) * len(feat))
            hmask = hmask & emx[nl:].reshape((eh.shape[0],)
                                             + (1,) * len(feat))
        lneg = jnp.where(lmask, el, _NEG_BIG)
        hneg = jnp.where(hmask, eh, _NEG_BIG)
        # partial stats per LOCAL src row and per HALO-recv position
        m_loc = jnp.maximum(jax.ops.segment_max(
            lneg, lsrc, num_segments=npp_src), _NEG_BIG)
        s_loc = jax.ops.segment_sum(
            jnp.where(lmask,
                      jnp.exp(lneg - jnp.take(m_loc, lsrc, axis=0)), 0),
            lsrc, num_segments=npp_src)
        h_tot = hg.h_total
        m_h = jnp.maximum(jax.ops.segment_max(
            hneg, hsrc, num_segments=h_tot), _NEG_BIG)
        s_h = jax.ops.segment_sum(
            jnp.where(hmask,
                      jnp.exp(hneg - jnp.take(m_h, hsrc, axis=0)), 0),
            hsrc, num_segments=h_tot)
        # reverse plane: merge halo partials into the owners' stats
        # (s accumulates halo terms only; the local partial joins at
        # the merged scale below)
        out_m, out_s = _lse_transpose(hg, ex_blocks, axis, m_h, s_h,
                                      m_loc, jnp.zeros_like(s_loc))
        out_s = out_s + s_loc * jnp.exp(m_loc - out_m)
        out_s = jnp.maximum(out_s, 1e-20)
        # forward plane: ship merged (m, s) to every consumer partition
        ms = jnp.concatenate([out_m[..., None], out_s[..., None]], -1)
        ms_recv = make_exchange(hg, ex_blocks, axis)(ms)
        le = jnp.where(
            lmask,
            jnp.exp(lneg - jnp.take(out_m, lsrc, axis=0))
            / jnp.take(out_s, lsrc, axis=0), 0.0)
        mh_r = jnp.take(ms_recv[..., 0], hsrc, axis=0)
        sh_r = jnp.take(ms_recv[..., 1], hsrc, axis=0)
        he = jnp.where(hmask, jnp.exp(hneg - mh_r) / sh_r, 0.0)
        return jnp.concatenate([le, he])[None]

    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(axis))
    return fn(*operands)


def halo_edge_softmax(hg: HaloShardedGraph, score, mesh: Mesh,
                      axis: str = "data", norm_by: str = "dst",
                      edge_mask=None):
    """Edge softmax over incoming edges of each dst (reference
    composition ``src/array/kernel.cc:309-340``).  Because edges are
    partitioned BY dst, the max/sum reductions are partition-local —
    the dst-normalized softmax needs no collective at all.
    ``norm_by="src"`` runs the reverse halo plane
    (:func:`_halo_edge_softmax_by_src`).

    ``edge_mask``: optional canonical (E,) bool — normalize over the
    True subset only (the reference's edge-subset ``edge_softmax(g,
    score, eids)``); masked edges output 0."""
    if norm_by == "src":
        return _halo_edge_softmax_by_src(hg, score, mesh, axis,
                                         edge_mask=edge_mask)
    if norm_by != "dst":
        raise ValueError(norm_by)
    npp = hg.nodes_per_part
    nl = _n_local(hg)
    score = _as_slots(hg, score)
    em = (edge_slots_from_canonical(hg, jnp.asarray(edge_mask, bool))
          if edge_mask is not None else None)

    def local_fn(sb, ldst, hdst, *em_b):
        sb, ldst, hdst = sb[0], ldst[0], hdst[0]
        el, eh = sb[:nl], sb[nl:]
        lmask = (ldst != npp).reshape(
            ldst.shape + (1,) * (el.ndim - 1))
        hmask = (hdst != npp).reshape(
            hdst.shape + (1,) * (eh.ndim - 1))
        if em_b:
            emx = em_b[0][0]
            lmask = lmask & emx[:nl].reshape(lmask.shape[:1] + (1,) *
                                             (el.ndim - 1))
            hmask = hmask & emx[nl:].reshape(hmask.shape[:1] + (1,) *
                                             (eh.ndim - 1))
        lneg = jnp.where(lmask, el, _NEG_BIG)
        hneg = jnp.where(hmask, eh, _NEG_BIG)
        m = jnp.maximum(
            jax.ops.segment_max(lneg, ldst, num_segments=npp + 1),
            jax.ops.segment_max(hneg, hdst, num_segments=npp + 1))
        m = jnp.where(m > _NEG_BIG / 2, m, 0.0)   # empty dst: max := 0
        # subtraction is masked BEFORE exp so masked lanes stay finite —
        # exp(huge) = inf would NaN the VJP through 0 * inf
        larg = jnp.where(lmask, el - jnp.take(m, ldst, axis=0), 0.0)
        harg = jnp.where(hmask, eh - jnp.take(m, hdst, axis=0), 0.0)
        le = jnp.where(lmask, jnp.exp(larg), 0.0)
        he = jnp.where(hmask, jnp.exp(harg), 0.0)
        s = (jax.ops.segment_sum(le, ldst, num_segments=npp + 1)
             + jax.ops.segment_sum(he, hdst, num_segments=npp + 1))
        # floor must be a NORMAL float: 1e-38 is subnormal and flushes
        # to zero under FTZ, making the dummy slot 0/0 = NaN
        s = jnp.maximum(s, 1e-20)
        return jnp.concatenate(
            [le / jnp.take(s, ldst, axis=0),
             he / jnp.take(s, hdst, axis=0)])[None]

    operands = [score, hg.ldst, hg.hdst]
    if em is not None:
        operands.append(em)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * len(operands),
        out_specs=P(axis))
    return fn(*operands)


# ---------------------------------------------------------------------------
# Graph-API adapter: HaloUnit + MeshGraph
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloUnit:
    """UnitGraph stand-in whose kernels run on the halo plane.  Consumed
    by ``ops.gspmm``/``ops.gsddmm``/``ops.edge_softmax`` via duck-typed
    dispatch (the ``halo_*`` methods below)."""

    hg: HaloShardedGraph
    mesh: Mesh
    axis: str = "data"
    is_sharded: bool = True   # nn fast paths check this and stand down
    fast_fmt: object = None   # halo_pallas.HaloFastFormat or None

    def tree_flatten(self):
        return ((self.hg, self.fast_fmt),
                (self.mesh, self.axis, self.is_sharded))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2], children[1])

    # -- UnitGraph surface -------------------------------------------------
    @property
    def num_src(self):
        return self.hg.num_parts * self.hg.npp_src

    @property
    def num_dst(self):
        return self.hg.num_parts * self.hg.nodes_per_part

    @property
    def num_edges(self):
        return self.hg.num_edges

    def in_degrees(self, v=None):
        deg = self.hg.in_deg.reshape(-1)
        return deg if v is None else deg[v]

    def out_degrees(self, u=None):
        deg = self.hg.out_deg.reshape(-1)
        return deg if u is None else deg[u]

    # -- kernel dispatch hooks ----------------------------------------------
    def halo_gspmm(self, op, reduce_op, u, e):
        if (self.fast_fmt is not None and op == "copy_lhs"
                and reduce_op in ("sum", "mean") and u is not None):
            from .halo_pallas import halo_fast_spmm
            out = halo_fast_spmm((self.fast_fmt, self.hg),
                                 u, self.mesh, self.axis)
            if reduce_op == "mean":
                deg = jnp.maximum(self.hg.in_deg.reshape(-1),
                                  1).astype(out.dtype)
                out = out / deg.reshape((-1,) + (1,) * (out.ndim - 1))
            return out
        return halo_gspmm(self.hg, op, reduce_op, u, e, self.mesh,
                          self.axis)

    def halo_gsddmm(self, op, lhs, rhs, lhs_target, rhs_target):
        return halo_gsddmm(self.hg, op, lhs, rhs, lhs_target, rhs_target,
                           self.mesh, self.axis)

    def halo_edge_softmax(self, score, norm_by="dst", edge_mask=None):
        return halo_edge_softmax(self.hg, score, self.mesh, self.axis,
                                 norm_by=norm_by, edge_mask=edge_mask)

    def edge_slots_from_canonical(self, arr):
        return edge_slots_from_canonical(self.hg, arr)

    def edge_slots_to_canonical(self, slots):
        return edge_slots_to_canonical(self.hg, slots)


class _DictView:
    """Minimal ndata/edata view (homogeneous MeshGraph)."""

    def __init__(self, frame, convert=None):
        self._frame = frame
        self._convert = convert

    def __getitem__(self, k):
        return self._frame[k]

    def __setitem__(self, k, v):
        self._frame[k] = self._convert(v) if self._convert else v

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


class MeshGraph:
    """Mesh-sharded homogeneous graph exposing the ``Graph`` surface the
    nn layers use (``update_all``/``apply_edges``/``srcdata``/``edata``/
    degrees), with kernels dispatched to the halo plane.  Build with
    ``shard_graph`` — the TPU counterpart of the reference's
    ``DistGraph`` client view (``distributed/dist_graph.py:519``)."""

    is_block = False
    is_sharded = True
    ntypes = ["_N"]
    srctypes = ["_N"]
    dsttypes = ["_N"]
    canonical_etypes = [("_N", "_E", "_N")]
    etypes = ["_E"]

    def __init__(self, hg: HaloShardedGraph, mesh: Mesh,
                 axis: str = "data", perm: Optional[np.ndarray] = None):
        self.hg = hg
        self.mesh = mesh
        self.axis = axis
        self.perm = perm                 # new node id -> original id
        self._unit = HaloUnit(hg, mesh, axis)
        self._units = [self._unit]
        self._node_frames = [{}]
        self._edge_frames = [{}]
        self._num_nodes = [self._unit.num_src]

    # -- id plumbing (single-type graph) -------------------------------
    def get_etype_id(self, etype):
        return 0

    def get_ntype_id(self, ntype):
        return 0

    get_src_ntype_id = get_ntype_id
    get_dst_ntype_id = get_ntype_id

    def unit(self, etype=None):
        return self._unit

    def num_nodes(self, ntype=None):
        return self._unit.num_src

    num_src_nodes = num_nodes
    num_dst_nodes = num_nodes

    def num_edges(self, etype=None):
        return self._unit.num_edges

    def in_degrees(self, v=None, etype=None):
        return self._unit.in_degrees(v)

    def out_degrees(self, u=None, etype=None):
        return self._unit.out_degrees(u)

    # -- data views ------------------------------------------------------
    @property
    def ndata(self):
        return _DictView(self._node_frames[0], self._put_node)

    srcdata = ndata
    dstdata = ndata

    @property
    def edata(self):
        return _DictView(self._edge_frames[0],
                         lambda v: _as_slots(self.hg, jnp.asarray(v)))

    def _put_node(self, v):
        """Node arrays must be (P*npp, *F) row-sharded; accept unpadded
        (num_nodes, *F) host arrays and pad+permute+shard them."""
        v = jnp.asarray(v)
        total = self.hg.num_parts * self.hg.nodes_per_part
        if v.shape[0] == total:
            return v
        if v.shape[0] == self.hg.num_nodes and self.perm is not None:
            v = pad_node_features(v[jnp.asarray(self.perm)], self.hg)
            return jax.device_put(
                v, NamedSharding(self.mesh, P(self.axis)))
        raise ValueError(
            f"node data rows {v.shape[0]} != padded {total}")

    def create_pallas_format(self, kind: str = "auto",
                             hbm_budget_bytes: int = 12 << 30,
                             symmetric: Optional[bool] = None,
                             on_device: bool = False,
                             assume_simple: bool = False) -> str:
        """Build per-partition Pallas kernel formats for the fast
        copy_u/sum(mean) path (``halo_pallas``; the mesh analogue of
        ``UnitGraph.auto_format``).  Returns the chosen kind.

        ``on_device=True`` (bit kind, simple graphs) packs the blocks
        with jitted scatter-adds straight from the device-resident edge
        arrays — skips the host bit-pack AND the multi-GB upload."""
        from .halo_pallas import (build_halo_fast_format,
                                  build_halo_fast_format_device)
        if on_device:
            fmt = build_halo_fast_format_device(
                self.hg, symmetric_local=bool(symmetric),
                assume_simple=assume_simple)
            self._unit.fast_fmt = fmt
            return fmt.kind
        fmt = build_halo_fast_format(self.hg, kind=kind,
                                     hbm_budget_bytes=hbm_budget_bytes,
                                     symmetric=symmetric)
        fmt = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(self.mesh, P(self.axis)))
            if hasattr(a, "ndim") else a, fmt)
        self._unit.fast_fmt = fmt
        return fmt.kind

    # -- message passing ---------------------------------------------------
    def update_all(self, mfunc, rfunc, afunc=None, etype=None):
        from ..core import update_all_inplace
        return update_all_inplace(self, mfunc, rfunc, afunc, etype)

    def apply_edges(self, func, edges=None, etype=None):
        from ..core import apply_edges_inplace
        return apply_edges_inplace(self, func, edges, etype)

    def local_var(self):
        g = MeshGraph.__new__(MeshGraph)
        g.__dict__.update(self.__dict__)
        g._node_frames = [dict(self._node_frames[0])]
        g._edge_frames = [dict(self._edge_frames[0])]
        return g

    # -- feature staging ---------------------------------------------------
    def shard_node_array(self, v):
        """Permute + pad + device_put an original-order (num_nodes, *F)
        array into the mesh layout.  ALWAYS treats the input as
        original node order — unlike the ndata setter, which must
        accept mesh-layout writes from inside models and therefore
        interprets an exactly-(P*npp)-row array as already staged (the
        two sizes coincide when num_nodes divides evenly; a contiguous
        partition hides the difference because its perm is identity,
        METIS does not)."""
        v = jnp.asarray(v)
        if v.shape[0] != self.hg.num_nodes:
            raise ValueError(
                f"shard_node_array expects original-order rows "
                f"({self.hg.num_nodes}), got {v.shape[0]}")
        v = pad_node_features(v[jnp.asarray(self.perm)], self.hg)
        return jax.device_put(v, NamedSharding(self.mesh, P(self.axis)))

    def unshard_node_array(self, v):
        """(P*npp, *F) mesh layout -> original (num_nodes, *F) order."""
        v = np.asarray(v)[:self.hg.num_nodes]
        out = np.empty_like(v)
        out[self.perm] = v
        return out


def shard_graph(g, mesh: Mesh, axis: str = "data",
                partition: Optional[np.ndarray] = None,
                part_method: str = "metis") -> MeshGraph:
    """Partition ``g`` over ``mesh`` and return a MeshGraph whose
    ``update_all``/``apply_edges`` run on the halo SPMD plane, so
    unchanged ``dgl_tpu.nn`` modules train multi-chip.

    Reference counterpart: ``partition_graph`` + ``DistGraph``
    (``distributed/partition.py:648``, ``dist_graph.py:519``) — here the
    partition book is the equal-range reshuffle and the KVStore pull is
    the boundary-row all_to_all."""
    num_parts = int(mesh.shape[axis])
    hg, perm = build_halo_sharded_graph(
        g, num_parts, partition=partition, part_method=part_method)
    hg = shard_halo_graph(hg, mesh, axis)
    mg = MeshGraph(hg, mesh, axis, perm=perm)
    # stage any existing node/edge features into the mesh layout
    try:
        ndata = g.ndata
        for k in list(ndata.keys()):
            mg.ndata[k] = jnp.asarray(ndata[k])
    except Exception:
        pass
    try:
        edata = g.edata
        for k in list(edata.keys()):
            mg.edata[k] = jnp.asarray(edata[k])
    except Exception:
        pass
    return mg
