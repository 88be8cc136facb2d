"""Mesh-sharded bit-packed dense SpMM (full-graph training at pod scale).

The single-chip bitmask SpMM (``ops/pallas/bitmm.py``) streams the whole
1-bit adjacency (N^2/8 bytes).  Past one chip's HBM, the natural SPMD
extension shards the packed matrix by DESTINATION over the mesh: device
``p`` stores the bit-columns of the ``A^T`` packing that correspond to
its contiguous node range — N^2/(8P) bytes per chip — and computes its
own output rows with one local Pallas kernel after an ``all_gather`` of
the (bf16) feature matrix over ICI.

Wire math at Reddit scale (N=233k, F=16): the gather moves N*F*2 ≈ 7.5 MB
per layer while each chip streams ~0.9 GB of adjacency from HBM — the
collective is >100x cheaper than the local work it overlaps with, so
this scales until N*F rivals N^2/(8P) (very wide features or very small
graphs), where the halo path (``spmd.py``) takes over.

Layout contract: nodes are assigned to partitions in contiguous ranges
of the natural order (``npp = 32*W`` rows per device, ``W`` = packed
words per device); features enter/leave row-sharded ``P(axis)`` with
``pad_nodes`` padding to ``P*npp`` rows.  Device ``p``'s shard packs dst
node ``u = p*npp + t`` at word column ``t % W``, plane ``t // W``, row
``src`` — so the kernel's plane-major output unscrambles to the natural
node order with one local transpose.

Gradients: ``d/dx (A x) = A^T dZ``.  The sharded operator with a
symmetric adjacency is self-adjoint in this layout, so the VJP reuses
the forward shards; asymmetric graphs carry a second shard set (the
``A`` packing sharded by SRC).

Reference semantics replaced: DistDGL's partitioned feature pull
(``distributed/kvstore.py:962``) + cuSPARSE SpMM per partition — here
one XLA collective + one Pallas kernel per layer (SURVEY §5.7/§7.7).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas.bitmm import (_bit_matmul_t, _T_PLANE_SCALE,
                                _pad_to, _op_dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BitShardedFormat:
    """Per-device column shards of the packed adjacency.

    shards:     (P, KP, W) int32 — device p's slice of the A^T packing
                (rows = ALL src nodes, bit-columns = p's dst range)
    shards_rev: same for the A packing (dst rows as contraction) — used
                by the VJP; aliases ``shards`` when symmetric
    rem_src_g / rem_dst_l / rem_w: (P, R) multi-edge excess per owner
                (src GLOBAL into the gathered features, dst LOCAL)
    brem_*:     the transposed remainder lists for the backward
    """

    shards: jnp.ndarray
    shards_rev: jnp.ndarray
    rem_src_g: jnp.ndarray
    rem_dst_l: jnp.ndarray
    rem_w: jnp.ndarray
    brem_src_g: jnp.ndarray
    brem_dst_l: jnp.ndarray
    brem_w: jnp.ndarray
    num_nodes: int
    num_parts: int
    npp: int          # nodes per device = 32 * W
    kp: int           # padded contraction rows (>= P*npp, 1024-multiple)
    symmetric: bool = False
    # static (aux) multigraph flag: remainder arrays always hold >=1
    # dummy slot, so "is there a multi-edge remainder" cannot be decided
    # from shapes — and value checks vanish when fmt rides as a jit
    # argument.  Recorded at build time so guards survive tracing.
    has_remainder: bool = True

    def tree_flatten(self):
        return ((self.shards, self.shards_rev, self.rem_src_g,
                 self.rem_dst_l, self.rem_w, self.brem_src_g,
                 self.brem_dst_l, self.brem_w),
                (self.num_nodes, self.num_parts, self.npp, self.kp,
                 self.symmetric, self.has_remainder))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def bytes_per_device(self):
        b = self.shards[0].size * 4
        if not self.symmetric:
            b *= 2
        return b


def _pack_shards(row, col, n, num_parts, npp, kp):
    """Column-sharded packing: bit for edge (row s -> dst u) lands in
    shard p = u//npp at [s, (u%npp) % W], plane (u%npp) // W.

    Returns (shards (P, kp, W) int32, rem lists bucketed per owner)."""
    w = npp // 32
    key = col.astype(np.int64) * n + row.astype(np.int64)
    uk, cnt = np.unique(key, return_counts=True)
    d = uk // n
    s = uk % n
    p = d // npp
    t = d % npp
    plane = (t // w).astype(np.uint32)
    word = t % w
    flat = (p * kp + s) * w + word          # index into (P*kp, W) words
    order = np.argsort(flat, kind="stable")
    flat_s = flat[order]
    bits_s = np.uint32(1) << plane[order]
    starts = np.flatnonzero(np.r_[True, flat_s[1:] != flat_s[:-1]])
    words_or = np.bitwise_or.reduceat(bits_s, starts)
    shards = np.zeros(num_parts * kp * w, np.uint32)
    shards[flat_s[starts]] = words_or
    shards = shards.reshape(num_parts, kp, w).view(np.int32)

    # multi-edge excess, bucketed by owner and padded to the max count
    multi = cnt > 1
    md, ms, mw = d[multi], s[multi], (cnt[multi] - 1).astype(np.float32)
    mp = md // npp
    counts = np.bincount(mp, minlength=num_parts)
    r_max = max(int(counts.max()) if counts.size else 0, 1)
    rsg = np.zeros((num_parts, r_max), np.int32)
    rdl = np.full((num_parts, r_max), npp, np.int32)   # dummy slot
    rw = np.zeros((num_parts, r_max), np.float32)
    order_m = np.argsort(mp, kind="stable")
    startp = 0
    for q in range(num_parts):
        c = counts[q] if q < len(counts) else 0
        sel = order_m[startp:startp + c]
        startp += c
        rsg[q, :c] = ms[sel]
        rdl[q, :c] = md[sel] - q * npp
        rw[q, :c] = mw[sel]
    return shards, rsg, rdl, rw


def build_bit_sharded_format(row, col, num_nodes: int, num_parts: int,
                             symmetric: bool = False) -> BitShardedFormat:
    """Host-side build of the mesh-sharded bitmask format."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    n = num_nodes
    # npp = 32*W with W a lane-tile multiple so each device's kernel tiles
    npp = _pad_to(-(-n // num_parts), 32 * 128)
    # contraction rows only need to cover the real src nodes (bits past n
    # are never set); P*npp is a 4096-multiple >= n >= this pad
    kp = _pad_to(n, 1024)
    shards, rsg, rdl, rw = _pack_shards(row, col, n, num_parts, npp, kp)
    if symmetric:
        shards_rev = shards
        brsg, brdl, brw = rsg, rdl, rw
    else:
        shards_rev, brsg, brdl, brw = _pack_shards(
            col, row, n, num_parts, npp, kp)
    as_j = jnp.asarray
    return BitShardedFormat(
        as_j(shards), as_j(shards_rev) if not symmetric else as_j(shards),
        as_j(rsg), as_j(rdl), as_j(rw), as_j(brsg), as_j(brdl), as_j(brw),
        num_nodes=n, num_parts=num_parts, npp=npp, kp=kp,
        symmetric=symmetric,
        has_remainder=bool(np.any(rw)) or bool(np.any(brw)))


def shard_format(fmt: BitShardedFormat, mesh: Mesh, axis: str = "data"):
    """Place each (P, ...) array so slice p lives on device p."""
    spec = NamedSharding(mesh, P(axis))
    put = lambda x: jax.device_put(x, spec) if hasattr(x, "ndim") else x
    return jax.tree_util.tree_map(put, fmt)


def pad_nodes(fmt: BitShardedFormat, x):
    """Pad (num_nodes, F) features to the sharded (P*npp, F) layout."""
    total = fmt.num_parts * fmt.npp
    pad = total - x.shape[0]
    if pad > 0:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _local_apply(shard, rem_s, rem_d, rem_w, x_local, *, npp, kp, n,
                 axis):
    """One device's output rows: all_gather features -> local kernel."""
    f = x_local.shape[-1]
    f_pad = _pad_to(max(f, 16), 16)
    xg = jax.lax.all_gather(x_local, axis, tiled=True)   # (P*npp, F)
    dt = _op_dtype()
    xt = jnp.zeros((f_pad, kp), dt)
    xt = xt.at[:f, :].set(xg[:kp].astype(dt).T)
    out_t = _bit_matmul_t(shard, xt)                     # (32, f_pad, W)
    out_t = out_t * _T_PLANE_SCALE
    # node t = plane*W + word  ->  out[t]
    out = out_t.transpose(0, 2, 1).reshape(npp, f_pad)[:, :f]
    # multi-edge excess (src rows from the gathered block)
    rem = jax.ops.segment_sum(
        jnp.take(xg, rem_s, axis=0).astype(jnp.float32) * rem_w[:, None],
        rem_d, num_segments=npp + 1)[:npp]
    return out + rem


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bit_sharded_spmm(fmt: BitShardedFormat, x, mesh: Mesh,
                     axis: str = "data"):
    """copy_u/sum SpMM over the mesh via per-device bitmask shards.

    ``x``: (P*npp, F) row-sharded ``P(axis)`` (see ``pad_nodes``);
    output in the same layout.  Rows past ``num_nodes`` are zero."""
    return _run(fmt.shards, fmt.rem_src_g, fmt.rem_dst_l, fmt.rem_w,
                x, fmt.npp, fmt.kp, fmt.num_nodes, mesh, axis)


def _run(shards, rsg, rdl, rw, x, npp, kp, n, mesh, axis):
    # in_specs split the leading P axis; the local view keeps it as a
    # size-1 dim on the per-partition tables — drop it inside
    def local(sh, a, b, c, xl):
        return _local_apply(sh[0], a[0], b[0], c[0], xl,
                            npp=npp, kp=kp, n=n, axis=axis)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        # pallas_call's out_shape carries no varying-mesh-axes info
        check_vma=False)
    return fn(shards, rsg, rdl, rw, x)


def _fwd(fmt, x, mesh, axis):
    return bit_sharded_spmm(fmt, x, mesh, axis), (fmt,)


def _bwd(mesh, axis, res, dZ):
    (fmt,) = res
    dX = _run(fmt.shards_rev, fmt.brem_src_g, fmt.brem_dst_l, fmt.brem_w,
              dZ, fmt.npp, fmt.kp, fmt.num_nodes, mesh, axis)
    return (None, dX.astype(dZ.dtype))


bit_sharded_spmm.defvjp(_fwd, _bwd)


def sharded_in_degrees(fmt: BitShardedFormat, row, col, mesh: Mesh,
                       axis: str = "data"):
    """(P*npp,) in-degree vector in the sharded layout (host-computed)."""
    deg = np.bincount(np.asarray(col, np.int64),
                      minlength=fmt.num_parts * fmt.npp).astype(np.float32)
    spec = NamedSharding(mesh, P(axis))
    return jax.device_put(jnp.asarray(deg), spec)
