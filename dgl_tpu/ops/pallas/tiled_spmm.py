"""Tile-dense SpMM: the Pallas TPU fast path for g-SpMM sum.

Why this design (measured on v5e): XLA's gather+segment-sum SpMM is limited
by *random 512-byte row gathers* from HBM (~47 GB/s effective vs ~800 GB/s
sequential).  This kernel never gathers randomly: edges are bucketed by
(dst-tile, src-tile) pairs on the host, and each bucket turns into two MXU
contractions against **sequentially streamed** tiles:

    G   = S @ X_tile        S[c, s] = [src_local[c] == s]   (C, T_src)
    out += M @ G            M[d, c] = w[c] * [dst_local[c] == d]

The one-hot operands are built on the VPU with iota-compares (no scatter,
no scalar loops).  Grid iterates buckets sequentially (TPU grids are
sequential), revisiting the same output tile across consecutive buckets of
one dst tile, so accumulation lives in VMEM.

Supports optional per-edge scalar weights (covers ``copy_lhs`` and
``mul``-by-scalar-edge-weight ops — GCN norm, GAT attention aggregation).
Reference semantics being replaced: ``SpMMSumCsr`` (``src/array/cpu/
spmm.h:122``) / cuSPARSE path (``src/array/cuda/spmm.cu:23-55``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024    # dst/src tile size (nodes)
DEFAULT_CAP = 512      # bucket capacity (edges)


def _interpret() -> bool:
    """Run in Pallas interpret mode off-TPU (CPU-mesh tests / dryrun)."""
    return jax.default_backend() != "tpu"


def _op_dtype():
    """Operand dtype for the one-hot matmuls: bf16 on the MXU; f32 under
    interpret (CPU XLA has no bf16 x bf16 -> f32 dot thunk)."""
    return jnp.float32 if _interpret() else jnp.bfloat16


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TiledFormat:
    """Host-precomputed tile-bucketed edge format.

    src_local: (B, C) int32 — src id within its src tile
    dst_local: (B, C) int32 — dst id within its dst tile
    eid:       (B, C) int32 — canonical edge id (-1 padding)
    valid:     (B, C) float32 — 1.0 for real edges
    src_tile:  (B,) int32 — src tile index per bucket
    dst_tile:  (B,) int32 — dst tile index per bucket (non-decreasing)
    Static: num_src, num_dst, tile, cap, num_dst_tiles, num_src_tiles
    """

    src_local: jnp.ndarray
    dst_local: jnp.ndarray
    eid: jnp.ndarray
    valid: jnp.ndarray
    src_tile: jnp.ndarray
    dst_tile: jnp.ndarray
    num_src: int
    num_dst: int
    tile: int
    cap: int
    # (B,) int32 bucket permutation sorting buckets by src tile.  Kernels
    # that accumulate into src-indexed outputs iterate buckets through
    # this permutation (index maps only — no slot data moves), making
    # src-tile output revisits consecutive, which is the only revisit
    # pattern Pallas output accumulation supports.  dst_tile is already
    # monotonic in natural order.
    src_order: Optional[jnp.ndarray] = None
    # (num_dst_tiles*T,) f32 row mask zeroing dst tiles with NO buckets
    # (their output rows are never written by the kernel); None when every
    # tile is covered.
    covered_mask: Optional[jnp.ndarray] = None
    # static ((c0, c1, t0, t1), ...) bucket chunks for the SMEM limit
    # (~1 MiB of scalar prefetch): each pallas_call covers buckets
    # [c0, c1) whose dst tiles span [t0, t1].  Computed host-side at build
    # so the format stays usable as a jit argument.
    chunk_ranges: Optional[tuple] = None

    def with_src_first(self):
        if self.src_order is not None:
            return self
        st = np.asarray(self.src_tile)
        order = np.argsort(st, kind="stable").astype(np.int32)
        return dataclasses.replace(self, src_order=jnp.asarray(order))

    @property
    def num_buckets(self):
        return self.src_local.shape[0]

    @property
    def num_src_tiles(self):
        return -(-self.num_src // self.tile)

    @property
    def num_dst_tiles(self):
        return -(-self.num_dst // self.tile)

    def tree_flatten(self):
        return ((self.src_local, self.dst_local, self.eid, self.valid,
                 self.src_tile, self.dst_tile, self.src_order,
                 self.covered_mask),
                (self.num_src, self.num_dst, self.tile, self.cap,
                 self.chunk_ranges))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:6], *aux[:4], src_order=children[6],
                   covered_mask=children[7], chunk_ranges=aux[4])


def _with_chunk_meta(tf: TiledFormat,
                     dst_tile_host: np.ndarray) -> TiledFormat:
    """Attach the static chunking plan + covered-tile mask (host-side)."""
    B = len(dst_tile_host)
    chunks = []
    for c0 in range(0, B, MAX_BUCKETS_PER_CALL):
        c1 = min(c0 + MAX_BUCKETS_PER_CALL, B)
        chunks.append((c0, c1, int(dst_tile_host[c0]),
                       int(dst_tile_host[c1 - 1])))
    covered = np.zeros(tf.num_dst_tiles, bool)
    covered[np.unique(dst_tile_host)] = True
    mask = None
    if not covered.all():
        mask = jnp.asarray(
            np.repeat(covered, tf.tile).astype(np.float32))
    return dataclasses.replace(tf, chunk_ranges=tuple(chunks),
                               covered_mask=mask)


def tiled_from_host(h: dict) -> TiledFormat:
    """Assemble a TiledFormat from host numpy arrays (the pre-device stage
    of ``build_tiled_format``; also the disk-cache deserialization path).

    ``h`` keys: src_local/dst_local/valid (B, C), eid (flat), src_tile/
    dst_tile (B,), num_src, num_dst, tile, cap."""
    cap = int(h["cap"])
    B = max(h["src_local"].shape[0], 1)
    shape3 = (B, cap // 128, 128)
    dst_tile = np.asarray(h["dst_tile"])
    return _with_chunk_meta(TiledFormat(
        src_local=jnp.asarray(np.asarray(h["src_local"]).reshape(shape3)),
        dst_local=jnp.asarray(np.asarray(h["dst_local"]).reshape(shape3)),
        eid=jnp.asarray(np.asarray(h["eid"]).reshape(-1)),
        valid=jnp.asarray(np.asarray(h["valid"]).reshape(shape3)),
        src_tile=jnp.asarray(np.asarray(h["src_tile"])),
        dst_tile=jnp.asarray(dst_tile),
        num_src=int(h["num_src"]), num_dst=int(h["num_dst"]),
        tile=int(h["tile"]), cap=cap), dst_tile)


def build_tiled_format(row: np.ndarray, col: np.ndarray, num_src: int,
                       num_dst: int, tile: int = DEFAULT_TILE,
                       cap: int = DEFAULT_CAP,
                       host_out: dict = None) -> TiledFormat:
    """Bucket edges by (dst_tile, src_tile); split buckets at ``cap``.

    Uses the native C++ counting-sort builder when available (~9x faster
    than the numpy path at 10M+ edges).  When ``host_out`` is given it is
    populated with the pre-device host arrays (for disk caching)."""
    row = np.asarray(row).astype(np.int64)
    col = np.asarray(col).astype(np.int64)
    E = len(row)
    from ...csrc import tiled_build as _native_tiled
    from ... import csrc as _csrc
    if _csrc.AVAILABLE and E > 0:
        nb = _native_tiled(row, col, num_src, num_dst, tile, cap)
        if nb is not None:
            src_local, dst_local, eid, valid, src_tile, dst_tile = nb
            h = dict(src_local=src_local, dst_local=dst_local, eid=eid,
                     valid=valid, src_tile=src_tile, dst_tile=dst_tile,
                     num_src=int(num_src), num_dst=int(num_dst),
                     tile=int(tile), cap=int(cap))
            if host_out is not None:
                host_out.update(h)
            return tiled_from_host(h)
    dst_t = col // tile
    src_t = row // tile
    num_src_tiles = -(-num_src // tile)
    key = dst_t * num_src_tiles + src_t
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    # bucket boundaries: new (pair) OR cap overflow
    if E:
        new_pair = np.concatenate([[True], key_s[1:] != key_s[:-1]])
        # position within pair run
        run_start = np.maximum.accumulate(
            np.where(new_pair, np.arange(E), 0))
        pos_in_run = np.arange(E) - run_start
        bucket_break = new_pair | (pos_in_run % cap == 0)
        bucket_id = np.cumsum(bucket_break) - 1
        B = int(bucket_id[-1]) + 1
    else:
        B = 0

    src_local = np.zeros((max(B, 1), cap), np.int32)
    dst_local = np.zeros((max(B, 1), cap), np.int32)
    eid = np.full((max(B, 1), cap), -1, np.int32)
    valid = np.zeros((max(B, 1), cap), np.float32)
    src_tile = np.zeros((max(B, 1),), np.int32)
    dst_tile = np.zeros((max(B, 1),), np.int32)
    if E:
        # slot within bucket
        bstart = np.zeros(E, np.int64)
        first_of_bucket = np.concatenate(
            [[True], bucket_id[1:] != bucket_id[:-1]])
        bstart = np.maximum.accumulate(
            np.where(first_of_bucket, np.arange(E), 0))
        slot = np.arange(E) - bstart
        e_sorted = order
        src_local[bucket_id, slot] = (row[e_sorted] % tile).astype(np.int32)
        dst_local[bucket_id, slot] = (col[e_sorted] % tile).astype(np.int32)
        eid[bucket_id, slot] = e_sorted.astype(np.int32)
        valid[bucket_id, slot] = 1.0
        src_tile[:] = 0
        np.maximum.at(src_tile, bucket_id, src_t[e_sorted].astype(np.int32))
        np.maximum.at(dst_tile, bucket_id, dst_t[e_sorted].astype(np.int32))
    # Edge vectors are stored as (B, C//128, 128): dense lane-major tiles
    # (a (N, 1) column layout would pad every row to 128 lanes in HBM).
    h = dict(src_local=src_local, dst_local=dst_local, eid=eid,
             valid=valid, src_tile=src_tile, dst_tile=dst_tile,
             num_src=int(num_src), num_dst=int(num_dst),
             tile=int(tile), cap=int(cap))
    if host_out is not None:
        host_out.update(h)
    return tiled_from_host(h)


def _spmm_kernel(pair_ref,  # scalar prefetch: dst_tile * n_src_tiles + src
                 x_ref, sl_ref, dl_ref, w_ref, out_ref, *,
                 binary_weights: bool = False, n_st: int = 1):
    b = pl.program_id(1)
    T = out_ref.shape[0]
    n_chunks = sl_ref.shape[1]
    C = n_chunks * 128

    cur_dt = pair_ref[b] // n_st
    prev_dt = pair_ref[jnp.maximum(b - 1, 0)] // n_st

    @pl.when((b == 0) | (cur_dt != prev_dt))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Build TRANSPOSED one-hots chunk-by-chunk so every op is lane-native:
    #   S_T[t, c] = [src_local[c] == t]          (T, C)
    #   D_T[t, c] = w[c] * [dst_local[c] == t]   (T, C)
    # Binary weights (copy_lhs: w = validity mask) fold into the compare
    # as an AND — skips a f32 multiply + cast per chunk (~4% measured).
    dt = x_ref.dtype           # bf16 on TPU; f32 under interpret
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    s_parts, d_parts = [], []
    for ci in range(n_chunks):
        s_row = sl_ref[0, ci][None, :]          # (1, 128) lanes
        d_row = dl_ref[0, ci][None, :]
        w_row = w_ref[0, ci][None, :]
        s_parts.append((s_row == iota_t).astype(dt))
        if binary_weights:
            d_parts.append(((d_row == iota_t) & (w_row > 0)
                            ).astype(dt))
        else:
            d_parts.append(((d_row == iota_t).astype(jnp.float32)
                            * w_row).astype(dt))
    S_T = jnp.concatenate(s_parts, axis=1)      # (T, C)
    D_T = jnp.concatenate(d_parts, axis=1)
    # G (C, F) = S_T^T @ X — contract the T (sublane) dims
    G = jax.lax.dot_general(
        S_T, x_ref[:].astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # out (T, F) += D_T @ G
    out_ref[:] += jnp.dot(D_T, G.astype(dt),
                          preferred_element_type=jnp.float32)


def slot_edge_weights(tf: TiledFormat, edge_weights):
    """Permute canonical-order (E,) edge weights into the (B, C) slot
    layout of ``tf``.  This gather costs ~0.7 s at 23M edges on TPU —
    for weights that are static across steps (GCN norms), precompute it
    once via ``UnitGraph.cache_edge_weights`` and pass ``slot_weights=``."""
    ew = edge_weights.reshape(-1).astype(jnp.float32)
    return (jnp.take(ew, jnp.maximum(tf.eid, 0), axis=0).reshape(
        tf.valid.shape) * tf.valid)


# SMEM holds ~1 MiB of scalar-prefetch data; one packed i32 per bucket
# means ~230k buckets/call.  Beyond that the grid is split into bucket
# chunks (each with its own dst-tile output range) and partial outputs
# are accumulated — ~0.3 ms extra per chunk at Reddit scale.
MAX_BUCKETS_PER_CALL = 200_000


def _spmm_one_call(tf, xp, w, binary, f_tile, c0, c1, t0, t1):
    """One pallas_call over buckets [c0, c1); output rows for dst tiles
    [t0, t1]."""
    T, C = tf.tile, tf.cap
    F_pad = xp.shape[1]
    n_st = tf.num_src_tiles
    nb = c1 - c0
    n_f_tiles = F_pad // f_tile
    pair = (tf.dst_tile[c0:c1].astype(jnp.int32) * n_st
            + tf.src_tile[c0:c1].astype(jnp.int32) - t0 * n_st)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_f_tiles, nb),
        in_specs=[
            pl.BlockSpec((T, f_tile),
                         lambda j, b, pk: (pk[b] % n_st, j)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda j, b, pk: (b + c0, 0, 0)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda j, b, pk: (b + c0, 0, 0)),
            pl.BlockSpec((1, C // 128, 128),
                         lambda j, b, pk: (b + c0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, f_tile),
                               lambda j, b, pk: (pk[b] // n_st, j)),
    )
    return pl.pallas_call(
        partial(_spmm_kernel, binary_weights=binary, n_st=n_st),
        out_shape=jax.ShapeDtypeStruct(((t1 - t0 + 1) * T, F_pad),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * C * T * F_pad,
            bytes_accessed=nb * T * f_tile * 2 + (t1 - t0 + 1) * T *
            F_pad * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(pair, xp, tf.src_local, tf.dst_local, w)


def tiled_spmm(tf: TiledFormat, x, edge_weights=None,
               f_tile: int = 512, slot_weights=None):
    """out[d] = sum_{e: dst(e)=d} w_e * x[src(e)].

    x: (num_src, F).  Returns (num_dst, F) float32.
    ``edge_weights``: (num_edges,) per-edge scalar or None.
    ``slot_weights``: (B, C) pre-permuted weights (see
    :func:`slot_edge_weights`); overrides ``edge_weights``.
    """
    T, C, B = tf.tile, tf.cap, tf.num_buckets
    F = x.shape[1]
    F_pad = max(128, -(-F // 128) * 128)
    n_src_pad = tf.num_src_tiles * T
    # bf16 on the wire: halves the X-tile DMA traffic; accumulation stays
    # f32 in the MXU (f32 operands under interpret — no CPU bf16 dot)
    xp = jnp.zeros((n_src_pad, F_pad), _op_dtype())
    xp = xp.at[: x.shape[0], :F].set(x.astype(_op_dtype()))

    if slot_weights is not None:
        w = slot_weights.astype(jnp.float32)
        binary = False
    elif edge_weights is None:
        w = tf.valid
        binary = True          # validity mask is 0/1 by construction
    else:
        w = slot_edge_weights(tf, edge_weights)
        binary = False

    f_tile = min(f_tile, F_pad)
    n_dt = tf.num_dst_tiles
    chunks = tf.chunk_ranges
    if chunks is None:  # legacy format without metadata: single call
        chunks = ((0, B, 0, n_dt - 1),)

    if len(chunks) == 1:
        out = _spmm_one_call(tf, xp, w, binary, f_tile, 0, B, 0, n_dt - 1)
        if tf.covered_mask is not None:
            # tiles with no bucket are never written: where (not multiply)
            # so arbitrary bits incl. NaN are dropped
            out = jnp.where(tf.covered_mask[:, None] > 0, out, 0.0)
        return out[: tf.num_dst, :F]

    out = jnp.zeros((n_dt * T, F_pad), jnp.float32)
    for c0, c1, t0, t1 in chunks:
        part = _spmm_one_call(tf, xp, w, binary, f_tile, c0, c1, t0, t1)
        if tf.covered_mask is not None:
            # mask BEFORE accumulating, with where: unwritten tiles hold
            # arbitrary bits (possibly NaN) that 0-multiply would keep
            part = jnp.where(
                tf.covered_mask[t0 * T:(t1 + 1) * T, None] > 0, part, 0.0)
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(
                out, (t0 * T, 0), part.shape) + part, (t0 * T, 0))
    return out[: tf.num_dst, :F]


# ---------------------------------------------------------------------------
# Multi-head variants: all H heads in ONE bucket pass.
#
# GAT-style aggregation out[d,h,f] = sum_e w[e,h] x[src_e,h,f] costs H
# separate kernel launches in the scalar-weight kernel (H x the FLOPs,
# since each launch contracts the full (T, C) one-hots).  Here the head
# dim rides the lane axis: X is laid out (N, H*Fh), the per-slot weights
# (B, H, C) are broadcast to (C, H*Fh) INSIDE the kernel with a one-hot
# matmul  wfull = w_slot^T-via-dot R  where R[h, l] = [l // Fh == h]
# (lane-native; no transposes), and a single matmul pair serves all
# heads.  The multihead SDDMM-dot (the attention backward) reuses R to
# reduce per-head lane blocks:  e[h, c] = R @ (Gx * Gz)^T.

def _head_onehot(H: int, Fh: int, dtype):
    """R (H, H*Fh): R[h, l] = 1 iff l // Fh == h (built via iota compare)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, H * Fh), 1)
    head = jax.lax.broadcasted_iota(jnp.int32, (H, H * Fh), 0)
    return ((lane // Fh) == head).astype(dtype)


def _spmm_mh_kernel(dst_tile_ref, src_tile_ref,
                    x_ref, sl_ref, dl_ref, w_ref, out_ref, *, H, Fh):
    b = pl.program_id(1)
    T = out_ref.shape[0]
    n_chunks = sl_ref.shape[1]

    @pl.when((b == 0) | (dst_tile_ref[b] != dst_tile_ref[jnp.maximum(b - 1,
                                                                     0)]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    s_parts, d_parts = [], []
    for ci in range(n_chunks):
        s_row = sl_ref[0, ci][None, :]
        d_row = dl_ref[0, ci][None, :]
        s_parts.append((s_row == iota_t).astype(jnp.bfloat16))
        d_parts.append((d_row == iota_t).astype(jnp.bfloat16))
    S_T = jnp.concatenate(s_parts, axis=1)          # (T, C)
    D_T = jnp.concatenate(d_parts, axis=1)          # (T, C) unweighted
    G = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (C, HF)
    R = _head_onehot(H, Fh, jnp.float32)
    # wfull (C, HF) = sum_h w[h, c] * R[h, l]
    wfull = jax.lax.dot_general(w_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    Gw = (G * wfull).astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(D_T, Gw, preferred_element_type=jnp.float32)


def tiled_spmm_multihead(tf: TiledFormat, x3, w_slot, H: int, Fh: int):
    """out[d,h,f] = sum_e w[e,h] x[src_e,h,f].

    x3: (num_src, H, Fh); w_slot: (B, H, C) per-slot weights (0 at padded
    slots).  H*Fh_pad must be lane-aligned: Fh is padded so H*Fh_pad is a
    multiple of 128.  Returns (num_dst, H, Fh) float32."""
    T, C, B = tf.tile, tf.cap, tf.num_buckets
    lane_goal = max(128, -(-(H * Fh) // 128) * 128)
    Fh_pad = lane_goal // H
    if Fh_pad * H != lane_goal:       # H doesn't divide: pad per-head to 128
        Fh_pad = max(128, -(-Fh // 128) * 128)
    HF = H * Fh_pad
    n_src_pad = tf.num_src_tiles * T
    n_dst_pad = tf.num_dst_tiles * T
    xp = jnp.zeros((n_src_pad, H, Fh_pad), jnp.bfloat16)
    xp = xp.at[: x3.shape[0], :, :Fh].set(x3.astype(jnp.bfloat16))
    xp = xp.reshape(n_src_pad, HF)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, B),
        in_specs=[
            pl.BlockSpec((T, HF), lambda j, b, dt, st: (st[b], 0)),
            pl.BlockSpec((1, C // 128, 128), lambda j, b, dt, st: (b, 0, 0)),
            pl.BlockSpec((1, C // 128, 128), lambda j, b, dt, st: (b, 0, 0)),
            pl.BlockSpec((1, H, C), lambda j, b, dt, st: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, dt, st: (dt[b], 0)),
    )
    out = pl.pallas_call(
        partial(_spmm_mh_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(tf.dst_tile, tf.src_tile, xp, tf.src_local, tf.dst_local, w_slot)
    return out.reshape(n_dst_pad, H, Fh_pad)[: tf.num_dst, :, :Fh]


def _sddmm_mh_kernel(dst_tile_ref, src_tile_ref,
                     x_ref, z_ref, sl_ref, dl_ref, out_ref, *, H, Fh):
    T = x_ref.shape[0]
    n_chunks = sl_ref.shape[1]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    s_parts, d_parts = [], []
    for ci in range(n_chunks):
        s_row = sl_ref[0, ci][None, :]
        d_row = dl_ref[0, ci][None, :]
        s_parts.append((s_row == iota_t).astype(jnp.bfloat16))
        d_parts.append((d_row == iota_t).astype(jnp.bfloat16))
    S_T = jnp.concatenate(s_parts, axis=1)
    D_T = jnp.concatenate(d_parts, axis=1)
    Gx = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C,HF)
    Gz = jax.lax.dot_general(D_T, z_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C,HF)
    prod = (Gx * Gz).astype(jnp.bfloat16)
    R = _head_onehot(H, Fh, jnp.bfloat16)
    # e (H, C) = sum_l R[h, l] * prod[c, l]
    out_ref[0] = jax.lax.dot_general(
        R, prod, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def tiled_sddmm_dot_multihead(tf: TiledFormat, x3, z3, H: int, Fh: int):
    """e[slot, h] = <x[src,h,:], z[dst,h,:]> for every bucket slot.

    Returns (B, H, C) float32 in slot order (scatter to edge order with
    ``tf.eid``)."""
    T, C, B = tf.tile, tf.cap, tf.num_buckets
    lane_goal = max(128, -(-(H * Fh) // 128) * 128)
    Fh_pad = lane_goal // H
    if Fh_pad * H != lane_goal:
        Fh_pad = max(128, -(-Fh // 128) * 128)
    HF = H * Fh_pad
    n_src_pad = tf.num_src_tiles * T
    n_dst_pad = tf.num_dst_tiles * T
    xp = jnp.zeros((n_src_pad, H, Fh_pad), jnp.bfloat16)
    xp = xp.at[: x3.shape[0], :, :Fh].set(x3.astype(jnp.bfloat16))
    xp = xp.reshape(n_src_pad, HF)
    zp = jnp.zeros((n_dst_pad, H, Fh_pad), jnp.bfloat16)
    zp = zp.at[: z3.shape[0], :, :Fh].set(z3.astype(jnp.bfloat16))
    zp = zp.reshape(n_dst_pad, HF)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, B),
        in_specs=[
            pl.BlockSpec((T, HF), lambda j, b, dt, st: (st[b], 0)),
            pl.BlockSpec((T, HF), lambda j, b, dt, st: (dt[b], 0)),
            pl.BlockSpec((1, C // 128, 128), lambda j, b, dt, st: (b, 0, 0)),
            pl.BlockSpec((1, C // 128, 128), lambda j, b, dt, st: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, dt, st: (b, 0, 0)),
    )
    return pl.pallas_call(
        partial(_sddmm_mh_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(tf.dst_tile, tf.src_tile, xp, zp, tf.src_local, tf.dst_local)
