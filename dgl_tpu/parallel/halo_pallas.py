"""Pallas local kernels inside the halo SPMD plane.

``halo_ops.halo_gspmm`` aggregates with ``jnp.take`` +
``jax.ops.segment_sum`` — the XLA path measured ~14x slower than the
Pallas kernels at Reddit density (PERF_NOTES).  This module puts the
fast kernel families INSIDE the shard_map: each partition applies its
local and halo adjacency blocks through a Pallas kernel while the
boundary-row all_to_all is in flight.

Reference counterpart: DistDGL runs cuSPARSE / custom SpMM on each
partition's local graph (``src/array/cuda/spmm.cu:23-55``) after the
KVStore pull; here the pull is the all_to_all and the local kernel is
one of two families (mirroring ``UnitGraph.auto_format``):

* ``bit``   — per-partition 1-bit adjacency blocks
  (npp x npp local + npp x P*H halo = N^2/(8P^2)-ish per chip); the
  single-chip headline kernel (``ops/pallas/bitmm.py``), sharded.
  mesh=1 degenerates to exactly the headline bitmask path.
* ``tiled`` — per-partition tile-dense bucket formats
  (``ops/pallas/tiled_spmm.py``), stacked over partitions with bucket
  counts padded to the max; O(E/P) memory, the only family that scales
  to papers100M-class graphs.

Forward (per partition p):
    out_p = A_loc^(p) @ x_p  +  A_halo^(p) @ recv_p  (+ dup remainder)
Backward (custom_vjp; the transpose of all_to_all is all_to_all):
    dx_p  = A_loc^(p)T @ dZ_p
          + scatter_add(send_idx, all_to_all(A_halo^(p)T @ dZ_p))
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spmd import HaloShardedGraph, exchange_operands, make_exchange, \
    make_exchange_transpose
from ..ops.pallas import bitmm as _bitmm
from ..ops.pallas import tiled_spmm as _ts


# ---------------------------------------------------------------------------
# formats
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StackedTiled:
    """Per-partition tiled formats, stacked over P with equal (padded)
    bucket counts so every device runs the same program."""

    src_local: jnp.ndarray    # (P, B, C//128, 128) int32
    dst_local: jnp.ndarray
    valid: jnp.ndarray        # (P, B, C//128, 128) f32 0/1
    src_tile: jnp.ndarray     # (P, B) int32
    dst_tile: jnp.ndarray     # (P, B) int32
    covered: jnp.ndarray      # (P, n_dt*T) f32 0/1 — tiles any bucket hits
    num_src: int
    num_dst: int
    tile: int
    cap: int

    def tree_flatten(self):
        return ((self.src_local, self.dst_local, self.valid,
                 self.src_tile, self.dst_tile, self.covered),
                (self.num_src, self.num_dst, self.tile, self.cap))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def block_format(self, p_slice) -> _ts.TiledFormat:
        """Assemble one partition's TiledFormat from shard_map block
        leaves (leading dim 1 = this partition).  chunk_ranges span the
        full output range — per-partition tile extents differ, so the
        static plan must be conservative."""
        sl, dl, vl = p_slice[0][0], p_slice[1][0], p_slice[2][0]
        st, dt, cov = p_slice[3][0], p_slice[4][0], p_slice[5][0]
        B = sl.shape[0]
        chunks = []
        n_dt = -(-self.num_dst // self.tile)
        for c0 in range(0, B, _ts.MAX_BUCKETS_PER_CALL):
            chunks.append((c0, min(c0 + _ts.MAX_BUCKETS_PER_CALL, B),
                           0, n_dt - 1))
        return _ts.TiledFormat(
            src_local=sl, dst_local=dl,
            eid=jnp.zeros((1,), jnp.int32), valid=vl,
            src_tile=st, dst_tile=dt,
            num_src=self.num_src, num_dst=self.num_dst,
            tile=self.tile, cap=self.cap,
            src_order=None, covered_mask=cov,
            chunk_ranges=tuple(chunks))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HaloFastFormat:
    """Per-partition Pallas formats for the halo plane (one of the two
    kernel families; see module docstring).

    bit kind leaves (int32 packings, see ``bitmm.pack_bits`` layout):
      fl: (P, KL, WL) forward local  — rows = local src, planes = dst
      bl: forward-transposed local   — rows = dst, planes = src
          (aliases fl when every local block is symmetric)
      fh: (P, KH, WL) forward halo   — rows = halo slots, planes = dst
      bh: (P, KL, WH) backward halo  — rows = dst, planes = halo slots
      rem_*: duplicate-edge excess (bit-packing drops multi-edges);
      l/h prefixes = local/halo, padded to per-kind maxima over P.
    tiled kind: fl/bl/fh/bh are StackedTiled (duplicates kept: no rem).
    """

    kind: str
    fl: object
    bl: object
    fh: object
    bh: object
    lrem_s: jnp.ndarray
    lrem_d: jnp.ndarray
    lrem_w: jnp.ndarray
    hrem_s: jnp.ndarray
    hrem_d: jnp.ndarray
    hrem_w: jnp.ndarray
    npp: int
    h_total: int          # P * h_max (flat halo receive slots)
    num_parts: int

    def tree_flatten(self):
        return ((self.fl, self.bl, self.fh, self.bh, self.lrem_s,
                 self.lrem_d, self.lrem_w, self.hrem_s, self.hrem_d,
                 self.hrem_w),
                (self.kind, self.npp, self.h_total, self.num_parts))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children, *aux[1:])

    @property
    def hbm_bytes_per_device(self):
        def nb(x):
            if x is None:
                return 0
            leaves = jax.tree_util.tree_leaves(x)
            return sum(v.size * v.dtype.itemsize for v in leaves)
        total = nb(self.fl) + nb(self.fh) + nb(self.bh)
        if self.bl is not self.fl:
            total += nb(self.bl)
        return total // max(self.num_parts, 1)


def _host(hg_arr):
    return np.asarray(hg_arr)


def _pack_block(rows, cols, n_planes, n_rows):
    """Bit-pack one partition block; returns (packed, rem_d, rem_s,
    rem_w) with the ``bitmm.pack_bits`` layout (planes domain padded to
    BN, rows domain padded to 1024)."""
    return _bitmm.pack_bits(np.asarray(rows, np.int64),
                            np.asarray(cols, np.int64),
                            int(n_planes), int(n_rows))


def _stack_rem(rems, cap_min=1):
    """Pad per-partition remainder lists to a common length."""
    r_max = max([len(r[0]) for r in rems] + [cap_min])
    P_ = len(rems)
    s = np.zeros((P_, r_max), np.int32)
    d = np.full((P_, r_max), -1, np.int32)   # -1 -> dummy slot (masked)
    w = np.zeros((P_, r_max), np.float32)
    for p, (rs, rd, rw) in enumerate(rems):
        s[p, :len(rs)] = rs
        d[p, :len(rd)] = rd
        w[p, :len(rw)] = rw
    return s, d, w


def build_halo_fast_format(hg: HaloShardedGraph,
                           kind: str = "auto",
                           hbm_budget_bytes: int = 12 << 30,
                           symmetric: Optional[bool] = None
                           ) -> HaloFastFormat:
    """Build per-partition Pallas formats from a (host-resident) halo
    graph.  ``kind='auto'`` picks bit when the per-device bit planes fit
    ``hbm_budget_bytes / num_parts`` (the ``auto_format`` rule applied
    per partition), else tiled.

    ``symmetric``: assert each partition's LOCAL block equals its own
    transpose (true for symmetric graphs under range partitions) —
    skips an O(E log E) host check and halves the bit-plane memory;
    None = check exactly."""
    Pn = hg.num_parts
    npp = hg.nodes_per_part
    h_total = hg.h_total
    lsrc, ldst = _host(hg.lsrc), _host(hg.ldst)
    hsrc, hdst = _host(hg.hsrc), _host(hg.hdst)
    l_eid, h_eid = _host(hg.l_eid), _host(hg.h_eid)

    if kind == "auto":
        wl = -(-npp // _bitmm.BN) * _bitmm.BN // 8      # bytes per row
        kl = -(-npp // 1024) * 1024
        kh = -(-h_total // 1024) * 1024
        wh = -(-h_total // _bitmm.BN) * _bitmm.BN // 8
        per_dev = 2 * kl * wl + kh * wl + kl * wh
        kind = "bit" if per_dev <= hbm_budget_bytes // max(Pn, 1) \
            else "tiled"

    if kind == "bit":
        fls, bls, fhs, bhs, lrems, hrems = [], [], [], [], [], []
        sym_all = True
        for p in range(Pn):
            lm = l_eid[p] >= 0
            ls, ld = lsrc[p][lm], ldst[p][lm]
            hm = h_eid[p] >= 0
            hs, hd = hsrc[p][hm], hdst[p][hm]
            # forward local: rows = src, planes = dst.  With the swapped
            # call (row=dst, col=src), pack_bits returns the remainder as
            # (col-values, row-values, w) = (src, dst, w).
            fl, rem_s, rem_d, rw = _pack_block(ld, ls, npp, npp)
            lrems.append((rem_s, rem_d, rw))
            # symmetric local block? (global symmetric graphs with range
            # partitions have A_loc == A_loc^T): exact check unless the
            # caller asserts it
            if symmetric is None:
                f_key = np.sort(ld.astype(np.int64) * npp + ls)
                r_key = np.sort(ls.astype(np.int64) * npp + ld)
                sym = np.array_equal(f_key, r_key)
            else:
                sym = bool(symmetric)
            sym_all &= sym
            bl = fl if sym else _pack_block(ls, ld, npp, npp)[0]
            # forward halo: rows = halo slots, planes = dst; remainder
            # comes back as (slot, dst, w)
            fh, hrem_s, hrem_d, hrw = _pack_block(hd, hs, npp, h_total)
            hrems.append((hrem_s, hrem_d, hrw))
            # backward halo: rows = dst, planes = halo slots
            bh = _pack_block(hs, hd, h_total, npp)[0]
            fls.append(fl)
            bls.append(bl)
            fhs.append(fh)
            bhs.append(bh)
        lrs, lrd, lrw = _stack_rem(lrems)
        hrs, hrd, hrw = _stack_rem(hrems)
        fl = jnp.asarray(np.stack(fls))
        bl = fl if sym_all else jnp.asarray(np.stack(bls))
        return HaloFastFormat(
            kind="bit", fl=fl, bl=bl,
            fh=jnp.asarray(np.stack(fhs)), bh=jnp.asarray(np.stack(bhs)),
            lrem_s=jnp.asarray(lrs), lrem_d=jnp.asarray(lrd),
            lrem_w=jnp.asarray(lrw), hrem_s=jnp.asarray(hrs),
            hrem_d=jnp.asarray(hrd), hrem_w=jnp.asarray(hrw),
            npp=npp, h_total=h_total, num_parts=Pn)

    if kind != "tiled":
        raise ValueError(f"unknown kind {kind!r}")

    zero_rem = jnp.zeros((Pn, 1), jnp.int32)
    return HaloFastFormat(
        kind="tiled",
        fl=_stack_tiled([(ldst[p][l_eid[p] >= 0], lsrc[p][l_eid[p] >= 0])
                         for p in range(Pn)], npp, npp),
        bl=_stack_tiled([(lsrc[p][l_eid[p] >= 0], ldst[p][l_eid[p] >= 0])
                         for p in range(Pn)], npp, npp),
        fh=_stack_tiled([(hdst[p][h_eid[p] >= 0], hsrc[p][h_eid[p] >= 0])
                         for p in range(Pn)], h_total, npp),
        bh=_stack_tiled([(hsrc[p][h_eid[p] >= 0], hdst[p][h_eid[p] >= 0])
                         for p in range(Pn)], npp, h_total),
        lrem_s=zero_rem, lrem_d=jnp.full((Pn, 1), -1, jnp.int32),
        lrem_w=jnp.zeros((Pn, 1), jnp.float32),
        hrem_s=zero_rem, hrem_d=jnp.full((Pn, 1), -1, jnp.int32),
        hrem_w=jnp.zeros((Pn, 1), jnp.float32),
        npp=npp, h_total=h_total, num_parts=Pn)


def build_halo_fast_format_device(hg: HaloShardedGraph,
                                  symmetric_local: bool = False,
                                  assume_simple: bool = True
                                  ) -> HaloFastFormat:
    """Device-side builder for the BIT kind: jitted scatter-adds pack the
    per-partition blocks directly from the (device-resident, sharded)
    halo edge arrays — no host bit-pack and no multi-GB host->device
    upload (the same trade as ``bitmm.build_bit_format_device``; at
    mesh=1 Reddit scale this replaces ~8 min of tunnel traffic with a
    few seconds of scatter).

    Requires ``assume_simple=True`` (scatter-add == bitwise OR only when
    each (src, dst) pair appears once per plane); multi-graphs must use
    the host builder, which routes duplicates to the COO remainder.
    ``symmetric_local=True`` asserts every partition's local block
    equals its transpose (symmetric graph + range partition) and aliases
    the backward packing."""
    if not assume_simple:
        raise ValueError("device fast-format build needs a simple graph; "
                         "use build_halo_fast_format for multigraphs")
    Pn = hg.num_parts
    npp = hg.nodes_per_part
    h_total = hg.h_total

    def dims(n_planes, n_rows):
        n_pad = -(-max(n_planes, 1) // _bitmm.BN) * _bitmm.BN
        k_pad = -(-max(n_rows, 1) // 1024) * 1024
        return k_pad, n_pad // 32

    KL, WL = dims(npp, npp)        # local blocks (either orientation)
    KH, _ = dims(npp, h_total)     # fwd halo: rows = halo slots
    _, WH = dims(h_total, npp)     # bwd halo: planes = halo slots

    def pack(rows, planes, valid, k_pad, n32):
        """Per-partition bit-pack via one scatter-add (bitmm layout:
        word = rows*n32 + planes % n32, bit = planes // n32).  Pad
        slots scatter value 0."""
        idx = (rows.astype(jnp.int32) * np.int32(n32)
               + (planes % np.int32(n32)).astype(jnp.int32))
        bit = (planes // np.int32(n32)).astype(jnp.uint32)
        val = jnp.where(valid,
                        (jnp.uint32(1) << bit).astype(jnp.int32), 0)
        p_off = (jnp.arange(Pn, dtype=jnp.int32)[:, None]
                 * np.int32(k_pad * n32))
        flat = (p_off + idx).reshape(-1)
        out = jnp.zeros((Pn * k_pad * n32,), jnp.int32)
        return out.at[flat].add(val.reshape(-1)).reshape(Pn, k_pad, n32)

    lval = hg.l_eid >= 0
    hval = hg.h_eid >= 0
    fl = jax.jit(pack, static_argnums=(3, 4))(
        hg.lsrc, hg.ldst, lval, KL, WL)
    bl = fl if symmetric_local else jax.jit(pack, static_argnums=(3, 4))(
        hg.ldst, hg.lsrc, lval, KL, WL)
    fh = jax.jit(pack, static_argnums=(3, 4))(
        hg.hsrc, hg.hdst, hval, KH, WL)
    bh = jax.jit(pack, static_argnums=(3, 4))(
        hg.hdst, hg.hsrc, hval, KL, WH)
    zero_s = jnp.zeros((Pn, 1), jnp.int32)
    neg_d = jnp.full((Pn, 1), -1, jnp.int32)
    zero_w = jnp.zeros((Pn, 1), jnp.float32)
    return HaloFastFormat(
        kind="bit", fl=fl, bl=bl, fh=fh, bh=bh,
        lrem_s=zero_s, lrem_d=neg_d, lrem_w=zero_w,
        hrem_s=zero_s, hrem_d=neg_d, hrem_w=zero_w,
        npp=npp, h_total=h_total, num_parts=Pn)


def _pick_cap(dst_src_pairs, num_src, num_dst, tile):
    """Fill-aware bucket capacity: total padded slots for capacity c is
    sum over touched (src_tile, dst_tile) pairs of ceil(e/c)*c — dense
    diagonal bands want big caps (fewer buckets), skew tails (hub rows
    touched by every partition, papers100M-shaped graphs) want small
    ones.  Evaluated exactly from the pair-size histogram; the round-4
    scale gate measured the hardcoded 512 at 24% fill (4x padding)
    under citation-graph skew."""
    n_st = max(-(-num_src // tile), 1)
    sizes = []
    for dst_ids, src_ids in dst_src_pairs:
        if len(dst_ids) == 0:
            continue
        key = ((np.asarray(src_ids, np.int64) // tile)
               + (np.asarray(dst_ids, np.int64) // tile) * n_st)
        sizes.append(np.unique(key, return_counts=True)[1])
    if not sizes:
        return _ts.DEFAULT_CAP
    e = np.concatenate(sizes).astype(np.int64)
    best_cap, best_slots = _ts.DEFAULT_CAP, None
    for c in (128, 256, 512, 1024, 2048):
        slots = int((-(-e // c) * c).sum())
        if best_slots is None or slots < best_slots * 0.92:
            # prefer larger caps on near-ties: fewer buckets = less
            # per-bucket overhead (grid steps, scalar prefetch)
            best_cap, best_slots = c, slots
    return best_cap


def _stack_tiled(dst_src_pairs, num_src, num_dst, cap=None):
    """Build per-partition tiled formats and stack with B padded to the
    max.  ``dst_src_pairs``: list of (dst_ids, src_ids) per partition
    (already pad-filtered).  ``cap=None`` picks the fill-optimal bucket
    capacity from the pair-size histogram (:func:`_pick_cap`)."""
    tile = _ts.DEFAULT_TILE
    if cap is None:
        cap = _pick_cap(dst_src_pairs, num_src, num_dst, tile)
    hosts = []
    n_dt = -(-num_dst // tile)
    for dst_ids, src_ids in dst_src_pairs:
        h = {}
        _ts.build_tiled_format(np.asarray(src_ids, np.int64),
                               np.asarray(dst_ids, np.int64),
                               num_src, num_dst, tile=tile, cap=cap,
                               host_out=h)
        hosts.append(h)
    B_max = max(max(h["src_local"].shape[0] for h in hosts), 1)
    Pn = len(hosts)
    c128 = cap // 128
    sl = np.zeros((Pn, B_max, c128, 128), np.int32)
    dl = np.zeros((Pn, B_max, c128, 128), np.int32)
    vl = np.zeros((Pn, B_max, c128, 128), np.float32)
    st = np.zeros((Pn, B_max), np.int32)
    dt = np.full((Pn, B_max), n_dt - 1, np.int32)   # pads: last tile
    cov = np.zeros((Pn, n_dt * tile), np.float32)
    for p, h in enumerate(hosts):
        B = h["src_local"].shape[0]
        if h["valid"].sum() == 0:
            continue
        sl[p, :B] = h["src_local"].reshape(B, c128, 128)
        dl[p, :B] = h["dst_local"].reshape(B, c128, 128)
        vl[p, :B] = h["valid"].reshape(B, c128, 128)
        st[p, :B] = h["src_tile"]
        dt[p, :B] = h["dst_tile"]
        dt[p, B:] = h["dst_tile"][-1] if B else 0   # keep non-decreasing
        covered = np.zeros(n_dt, bool)
        covered[np.unique(h["dst_tile"][:B])] = True
        cov[p] = np.repeat(covered, tile).astype(np.float32)
    return StackedTiled(
        src_local=jnp.asarray(sl), dst_local=jnp.asarray(dl),
        valid=jnp.asarray(vl), src_tile=jnp.asarray(st),
        dst_tile=jnp.asarray(dt), covered=jnp.asarray(cov),
        num_src=num_src, num_dst=num_dst, tile=tile, cap=cap)


# ---------------------------------------------------------------------------
# the sharded fast SpMM (copy_u / sum|mean)
# ---------------------------------------------------------------------------


def _bit_apply(packed_t_block, num_dst, x):
    """A @ x via the transposed bitmask kernel on one partition block."""
    return _bitmm._apply_t(packed_t_block, num_dst, x)


def _rem_add(out, x_src, rem_s, rem_d, rem_w, num_out):
    """Duplicate-edge excess: out[rem_d] += w * x_src[rem_s] (rem_d == -1
    rows are dropped via the dummy slot)."""
    d = jnp.where(rem_d < 0, num_out, rem_d)
    v = jnp.take(x_src, rem_s, axis=0).astype(jnp.float32) \
        * rem_w[:, None]
    return out + jax.ops.segment_sum(v, d, num_segments=num_out + 1)[:num_out]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def halo_fast_spmm(bundle, x, mesh: Mesh, axis: str = "data"):
    """copy_u/sum SpMM through per-partition Pallas kernels.

    ``bundle`` = (fmt: HaloFastFormat, hg: HaloShardedGraph).  ``x``:
    (P*npp, F) row-sharded; output in the same layout.  Differentiable
    in ``x`` (custom VJP; formats are static data)."""
    fmt, hg = bundle
    return _fast_run(fmt, hg, x, mesh, axis, forward=True)


def _fast_run(fmt, hg, x, mesh, axis, forward):
    npp, Pn = fmt.npp, fmt.num_parts
    n_ex = len(exchange_operands(hg))

    loc = fmt.fl if forward else fmt.bl
    halo_k = fmt.fh if forward else fmt.bh

    def local_fn(loc_b, halo_b, ex_blocks, lrs, lrd, lrw, hrs, hrd, hrw,
                 x_local):
        if forward:
            recv = make_exchange(hg, ex_blocks, axis)(x_local)
            if fmt.kind == "bit":
                out = _bit_apply(loc_b[0], npp, x_local)
                out = out + _bit_apply(halo_b[0], npp, recv)
            else:
                tf_l = fmt.fl.block_format(loc_b)
                tf_h = fmt.fh.block_format(halo_b)
                out = _ts.tiled_spmm(tf_l, x_local)
                out = out + _ts.tiled_spmm(tf_h, recv)
            out = _rem_add(out, x_local, lrs[0], lrd[0], lrw[0], npp)
            out = _rem_add(out, recv, hrs[0], hrd[0], hrw[0], npp)
            return out
        # backward: x_local here is dZ_local
        dZ = x_local
        if fmt.kind == "bit":
            dx = _bit_apply(loc_b[0], npp, dZ)
            drecv = _bit_apply(halo_b[0], fmt.h_total, dZ)
        else:
            tf_l = fmt.bl.block_format(loc_b)
            tf_h = fmt.bh.block_format(halo_b)
            dx = _ts.tiled_spmm(tf_l, dZ)
            drecv = _ts.tiled_spmm(tf_h, dZ)
        # local duplicate excess transposes by swapping s/d
        dx = _rem_add(dx, dZ, lrd[0], lrs[0], lrw[0], npp)
        # halo duplicate excess: contributes to d(recv)[s] += w dZ[d]
        hs, hd, hw = hrs[0], hrd[0], hrw[0]
        dmask = (hd >= 0)
        v = jnp.take(dZ, jnp.maximum(hd, 0), axis=0).astype(jnp.float32) \
            * (hw * dmask)[:, None]
        drecv = drecv + jax.ops.segment_sum(
            v, jnp.where(dmask, hs, fmt.h_total),
            num_segments=fmt.h_total + 1)[:fmt.h_total]
        # transpose of the exchange: reverse collective + scatter-add at
        # the send rows
        dx = dx + make_exchange_transpose(hg, ex_blocks, axis,
                                          npp)(drecv)
        return dx

    operands = (loc if fmt.kind == "bit" else
                (loc.src_local, loc.dst_local, loc.valid, loc.src_tile,
                 loc.dst_tile, loc.covered))
    halo_ops_ = (halo_k if fmt.kind == "bit" else
                 (halo_k.src_local, halo_k.dst_local, halo_k.valid,
                  halo_k.src_tile, halo_k.dst_tile, halo_k.covered))

    ex_ops = tuple(exchange_operands(hg))
    if fmt.kind == "bit":
        def wrapper(lb, hb, *rest):
            return local_fn(lb, hb, list(rest[:n_ex]), *rest[n_ex:])
        args = (operands, halo_ops_) + ex_ops + (
            fmt.lrem_s, fmt.lrem_d, fmt.lrem_w, fmt.hrem_s, fmt.hrem_d,
            fmt.hrem_w, x)
        specs = (P(axis),) * len(args)
    else:
        def wrapper(*args_):
            lb = args_[:6]
            hb = args_[6:12]
            rest = args_[12:]
            return local_fn(lb, hb, list(rest[:n_ex]), *rest[n_ex:])
        args = operands + halo_ops_ + ex_ops + (
            fmt.lrem_s, fmt.lrem_d, fmt.lrem_w, fmt.hrem_s,
            fmt.hrem_d, fmt.hrem_w, x)
        specs = (P(axis),) * len(args)

    fn = jax.shard_map(wrapper, mesh=mesh, in_specs=specs,
                       out_specs=P(axis), check_vma=False)
    return fn(*args)


def _fast_fwd(bundle, x, mesh, axis):
    return halo_fast_spmm(bundle, x, mesh, axis), (bundle,)


def _fast_bwd(mesh, axis, res, dZ):
    (bundle,) = res
    fmt, hg = bundle
    dX = _fast_run(fmt, hg, dZ, mesh, axis, forward=False)
    return (None, dX.astype(dZ.dtype))


halo_fast_spmm.defvjp(_fast_fwd, _fast_bwd)
