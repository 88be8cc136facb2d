"""Bit-packed dense SpMM: the whole adjacency as a 1-bit matrix.

At Reddit scale (N=233k) the FULL boolean adjacency fits in HBM once
packed to 1 bit/entry (N^2/8 = 6.8 GB), so SpMM needs no gather at all:
stream the packed matrix, unpack 32-column planes int32->bf16 in VMEM,
and feed the MXU —

    out[k, f] = sum_n A[k, n] * x[n, f]

one ``pallas_call``, no tiled remainder, no bucket bookkeeping.  The MXU
cost is the dense 2*K*N*F_pad FLOPs (F_pad = 128 lanes): ~72 ms per SpMM
at Reddit scale on v5e — 6x under the tile-dense kernel at d=492 — and
the stream cost is N^2/8 bytes (~8 ms).  This inverts the usual sparse
wisdom because TPUs have no fast gather: below ~0.5% density the
one-hot tile kernel pays per-BUCKET overhead, while the bitmask kernel
pays per-MATRIX; at Reddit density (0.21%) the bitmask wins whenever
N^2/8 fits beside the features in HBM.

Packing layout (plane-major, so unpacked planes are contiguous lane
tiles, no in-kernel shuffles): with ``N32 = N_pad // 32``,

    packed[k, j] bit b   <->   A[k, b * N32 + j]

and the feature operand is pre-arranged once per call so plane ``b`` of
packed block ``n`` lines up with a static slice:

    xp[j, b*F_pad + f] = x[b * N32 + j, f]

Multi-edges: the bitmask holds ``count >= 1``; the excess
``count - 1`` multiplicities ride a tiny COO remainder applied as an
XLA segment-sum (exactness without widening the block).

Gradients: d/dx (A x) = A^T dZ — a second packed matrix, or the SAME one
when the graph is symmetric (undirected graphs stored both ways, e.g.
Reddit), in which case the VJP is literally the forward.

Reference semantics replaced: CSR SpMM sum (``src/array/cpu/spmm.h:122``,
``src/array/cuda/spmm.cu:23-55``).  The bitmask formulation has no
reference counterpart (GPUs gather; TPUs stream).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_pytree_node_class

BK = 512       # out rows per block
BN = 8192      # contraction columns per block = 32 planes x 256 lanes


@register_pytree_node_class
@dataclass
class BitFormat:
    """Bit-packed adjacency (+ transpose for the VJP) + COO remainder."""
    packed: jnp.ndarray        # (K_pad, N_pad//32) int32 — bits of A
    packed_rev: jnp.ndarray    # bits of A^T (is ``packed`` if symmetric)
    rem_src: jnp.ndarray       # (R,) int32 — multi-edge excess, may be R=0
    rem_dst: jnp.ndarray
    rem_w: jnp.ndarray         # (R,) f32 — excess-occurrence weights
                               # (numpy builder: count-1 aggregated;
                               # native builder: one entry per extra
                               # occurrence, weight 1 — same sum)
    num_src: int
    num_dst: int
    symmetric: bool = False

    def tree_flatten(self):
        return ((self.packed, self.packed_rev, self.rem_src,
                 self.rem_dst, self.rem_w),
                (self.num_src, self.num_dst, self.symmetric))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def hbm_bytes(self):
        b = self.packed.size * 4
        if not self.symmetric:
            b *= 2
        return b


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    """Run the Pallas kernels in interpret mode off-TPU (evaluated at
    trace time inside the jitted wrappers, so it is a static constant)."""
    return jax.default_backend() != "tpu"


def _op_dtype():
    """Feature-operand dtype: bf16 on the MXU; f32 under interpret
    (XLA CPU has no bf16xbf16->f32 dot thunk)."""
    return jnp.float32 if _interpret() else jnp.bfloat16


def pack_bits(row: np.ndarray, col: np.ndarray, num_src: int,
              num_dst: int) -> tuple:
    """Host: (packed int32 (K_pad, N_pad//32), rem_dst, rem_src, rem_w).

    ``packed[d, j]`` bit ``b`` set iff edge (src = b*N32 + j) -> (dst = d)
    exists; duplicates beyond the first go to the COO remainder."""
    n_pad = _pad_to(max(num_src, 1), BN)
    k_pad = _pad_to(max(num_dst, 1), 1024)   # BR_BIG (and a BK multiple)
    n32 = n_pad // 32
    if num_src < 2**31 and num_dst < 2**31:
        # native O(E) atomic fetch-OR builder (csrc/kernels.cpp
        # pack_bits32): ~40x over this numpy sort/unique pipeline at
        # Reddit scale (one pass, the old word doubles as the dup test)
        from ... import csrc
        native = csrc.pack_bits32(row, col, k_pad, n32)
        if native is not None:
            packed_u, rd_n, rs_n = native
            return (packed_u.view(np.int32), rd_n, rs_n,
                    np.ones(len(rd_n), np.float32))
    key = col.astype(np.int64) * num_src + row
    uk, cnt = np.unique(key, return_counts=True)
    d = (uk // num_src).astype(np.int64)
    s = (uk % num_src).astype(np.int64)
    b = (s // n32).astype(np.uint32)
    j = (s % n32).astype(np.int64)
    idx = d * n32 + j
    order = np.argsort(idx, kind="stable")
    idx_s = idx[order]
    bits_s = (np.uint32(1) << b[order])
    # segment-OR per unique word (reduceat: C-speed, no ufunc.at)
    starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
    words = np.bitwise_or.reduceat(bits_s, starts)
    packed = np.zeros(k_pad * n32, np.uint32)
    packed[idx_s[starts]] = words
    packed = packed.reshape(k_pad, n32).view(np.int32)
    multi = cnt > 1
    return (packed, d[multi].astype(np.int32), s[multi].astype(np.int32),
            (cnt[multi] - 1).astype(np.float32))


def build_bit_format(row: np.ndarray, col: np.ndarray, num_src: int,
                     num_dst: int, symmetric: bool = False,
                     cache_path: Optional[str] = None) -> BitFormat:
    """Build (or load from ``cache_path``) the bitmask SpMM format."""
    import os
    if cache_path is not None and os.path.exists(cache_path):
        hit = load_bit_format(cache_path)
        if hit is not None:
            return hit
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    packed, rd, rs, rw = pack_bits(row, col, num_src, num_dst)
    if symmetric:
        if num_src != num_dst:
            raise ValueError("symmetric bitmask needs a square adjacency")
        packed_rev = packed
    else:
        packed_rev, _, _, _ = pack_bits(col, row, num_dst, num_src)
    if cache_path is not None:
        # raw .npy sidecars for the multi-GB bit planes (np.savez's zip
        # CRC pass costs minutes at 6.8 GB); the small meta npz is
        # written LAST so its presence marks the cache valid
        np.save(cache_path + ".bits.npy", packed)
        if not symmetric:
            np.save(cache_path + ".bits_rev.npy", packed_rev)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, raw=1, rem_dst=rd, rem_src=rs, rem_w=rw,
                     num_src=num_src, num_dst=num_dst,
                     symmetric=symmetric)
        os.replace(tmp, cache_path)
    pk = jnp.asarray(packed)
    pr = pk if symmetric else jnp.asarray(packed_rev)
    return BitFormat(pk, pr, jnp.asarray(rs), jnp.asarray(rd),
                     jnp.asarray(rw), num_src, num_dst, symmetric)


def build_bit_format_device(row, col, num_src: int, num_dst: int,
                            symmetric: bool = False,
                            assume_simple: bool = False) -> BitFormat:
    """Build the bitmask format ON DEVICE from a COO edge list.

    Ships E*8 bytes over the host->device link instead of
    N_src*N_dst/8: at Reddit scale that is 0.9 GB vs 6.9 GB — through
    a tunneled TPU at ~15 MB/s the difference is ~7.5 minutes of bench
    cold-start.  The pack is a jitted scatter-add: for a SIMPLE graph
    every source landing in the same 32-bit word carries a distinct
    bit, so integer add == bitwise OR.  Duplicate edges would corrupt
    words, hence: with ``assume_simple=False`` duplicates are detected
    host-side (sort on (dst,src)) and routed to the COO remainder like
    the host builder; ``assume_simple=True`` skips that O(E log E)
    pass for graphs that are simple by construction.
    """
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    rd = np.zeros(0, np.int32)
    rs = np.zeros(0, np.int32)
    rw = np.zeros(0, np.float32)
    if not assume_simple:
        key = col.astype(np.int64) * num_src + row
        uk, cnt = np.unique(key, return_counts=True)
        if len(uk) != len(key):
            multi = cnt > 1
            rd = (uk[multi] // num_src).astype(np.int32)
            rs = (uk[multi] % num_src).astype(np.int32)
            rw = (cnt[multi] - 1).astype(np.float32)
            col = (uk // num_src).astype(np.int32)
            row = (uk % num_src).astype(np.int32)
    n_pad = _pad_to(max(num_src, 1), BN)
    k_pad = _pad_to(max(num_dst, 1), 1024)
    n32 = n_pad // 32

    @jax.jit
    def _scatter_pack(r, c):
        # 2-D scatter indices: the flattened form c*n32 + word wraps
        # int32 once k_pad*n32 > 2^31 (N ~ 262k for a square graph) —
        # XLA's own offset math inside a 2-D scatter is wide, so index
        # by (row, word) instead (int32 capacity audit, round 5)
        word = (r % np.int32(n32)).astype(jnp.int32)
        val = (jnp.uint32(1)
               << (r // np.int32(n32)).astype(jnp.uint32)).astype(jnp.int32)
        return jnp.zeros((k_pad, n32), jnp.int32).at[
            c.astype(jnp.int32), word].add(val)

    pk = _scatter_pack(jnp.asarray(row), jnp.asarray(col))
    if symmetric:
        if num_src != num_dst:
            raise ValueError("symmetric bitmask needs a square adjacency")
        pr = pk
    else:
        pr = _scatter_pack(jnp.asarray(col), jnp.asarray(row))
    return BitFormat(pk, pr, jnp.asarray(rs), jnp.asarray(rd),
                     jnp.asarray(rw), num_src, num_dst, symmetric)


def load_bit_format(path: str) -> Optional[BitFormat]:
    import os
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        sym = bool(z["symmetric"])
        if "raw" in z:      # raw-sidecar layout (see build_bit_format)
            packed = np.load(path + ".bits.npy")
            pk = jnp.asarray(packed)
            pr = pk if sym else jnp.asarray(
                np.load(path + ".bits_rev.npy"))
        else:               # legacy all-in-one npz
            pk = jnp.asarray(z["packed"])
            pr = pk if sym else jnp.asarray(z["packed_rev"])
        return BitFormat(pk, pr, jnp.asarray(z["rem_src"]),
                         jnp.asarray(z["rem_dst"]), jnp.asarray(z["rem_w"]),
                         int(z["num_src"]), int(z["num_dst"]), sym)
    except Exception:
        return None


def _bit_kernel_t(x_ref, p_ref, o_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]                                   # (BR, BW32) int32
    xt = x_ref[:]                                  # (F_pad, BR) bf16
    for b in range(32):
        # mask-only unpack (2 VPU ops/entry: and + convert, no shift):
        # plane b carries value 2^b (or -2^31 for b=31, the int32 sign
        # bit) instead of 1; the exact power-of-two rescale happens once
        # on the f32 output planes (``_T_PLANE_SCALE``).  Measured 27%
        # faster than shift+and+convert (tools/perf_bitmm_variants.py).
        a_b = (p & np.int32(np.uint32(1) << b)).astype(xt.dtype)
        o_ref[b, :, :] += jax.lax.dot_general(
            xt, a_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


BR = 512       # contraction rows per block (pack_bits row padding)
BR_BIG = 1024  # preferred contraction block (fewer grid steps; measured
               # another 10% over BR=512 when K_pad allows it)
BW32 = 256     # packed words per block = 8192 bit-columns

# undo the 2^b plane values of the mask-only unpack (plane 31 is the
# int32 sign bit: value -2^31)
_T_PLANE_SCALE = np.array(
    [2.0 ** -b for b in range(31)] + [-(2.0 ** -31)],
    np.float32).reshape(32, 1, 1)


@jax.jit
def _bit_matmul_t(packed_t, xt):
    """Narrow-F transposed form: out^T = x^T @ A.

    ``packed_t`` is the bit-packing of A^T — rows = SRC nodes
    (contraction), bit-planes = DST nodes (output lanes) — i.e. exactly
    ``BitFormat.packed_rev`` for the forward and ``.packed`` for the
    VJP (the same array when symmetric).  The MXU cost is
    2*F_pad*K*N with F_pad = F padded to the 16-sublane tile instead of
    the 128-lane minimum of ``_bit_matmul``: an 8x MXU saving at the
    GCN bench widths (F=16/41).

    packed_t (K_pad, N_pad//32) int32, xt (F_pad, K_pad) bf16
    -> out_t (32, F_pad, N_pad//32) f32, plane-major over dst:
       natural dst d = b * (N_pad//32) + j  <->  out_t[b, :, j].
    """
    kp, n32 = packed_t.shape
    f_pad = xt.shape[0]
    br = BR_BIG if kp % BR_BIG == 0 else BR
    bw = BW32 if n32 % BW32 == 0 else 128   # 128 = one lane tile (small
    # shards of the mesh-sharded path); 256 measured best at full scale
    grid = (n32 // bw, kp // br)
    return pl.pallas_call(
        _bit_kernel_t,
        grid=grid,
        in_specs=[pl.BlockSpec((f_pad, br), lambda d, n: (0, n)),
                  pl.BlockSpec((br, bw), lambda d, n: (n, d))],
        out_specs=pl.BlockSpec((32, f_pad, bw), lambda d, n: (0, 0, d)),
        out_shape=jax.ShapeDtypeStruct((32, f_pad, n32), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * n32 * 32 * f_pad,
            bytes_accessed=kp * n32 * 4 + kp * f_pad * 2
            + n32 * 32 * f_pad * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xt, packed_t)


def _apply_t(packed_t, num_dst, x):
    """out = A @ x via the transposed kernel (no COO remainder term)."""
    f = x.shape[1]
    f_pad = _pad_to(max(f, 16), 16)
    kp = packed_t.shape[0]
    dt = _op_dtype()
    xt = jnp.zeros((f_pad, kp), dt)
    xt = xt.at[:f, : x.shape[0]].set(x.astype(dt).T)
    out_t = _bit_matmul_t(packed_t, xt)            # (32, f_pad, n32)
    out_t = out_t * _T_PLANE_SCALE                 # undo 2^b plane values
    n32 = out_t.shape[2]
    out = out_t.transpose(1, 0, 2).reshape(f_pad, 32 * n32)
    return out[:f, :num_dst].T


def _bit_kernel(p_ref, x_ref, o_ref, *, f_pad):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:]                                   # (BK, BN//32) int32
    acc = jnp.zeros_like(o_ref)
    for b in range(32):
        a_b = ((p >> b) & 1).astype(x_ref.dtype)   # plane b, (BK, BN//32)
        acc += jax.lax.dot_general(
            a_b, x_ref[:, b * f_pad:(b + 1) * f_pad],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] += acc


@partial(jax.jit, static_argnames=())
def _bit_matmul(packed, xp):
    """packed (K_pad, N_pad//32) int32, xp (N_pad//32, 32*F_pad) bf16
    -> (K_pad, F_pad) f32."""
    kp, n32 = packed.shape
    f_pad = xp.shape[1] // 32
    grid = (kp // BK, (n32 * 32) // BN)
    bn32 = BN // 32
    return pl.pallas_call(
        partial(_bit_kernel, f_pad=f_pad),
        grid=grid,
        in_specs=[pl.BlockSpec((BK, bn32), lambda k, n: (k, n)),
                  pl.BlockSpec((bn32, 32 * f_pad), lambda k, n: (n, 0))],
        out_specs=pl.BlockSpec((BK, f_pad), lambda k, n: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((kp, f_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * n32 * 32 * f_pad,
            bytes_accessed=kp * n32 * 4 + n32 * 32 * f_pad * 2
            + kp * f_pad * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(packed, xp)


def _arrange_x(x, n32, f_pad):
    """x (num_src, F) -> xp (N32, 32*F_pad) bf16, plane-major."""
    n_pad = n32 * 32
    dt = _op_dtype()
    xpad = jnp.zeros((n_pad, f_pad), dt)
    xpad = xpad.at[: x.shape[0], : x.shape[1]].set(x.astype(dt))
    return (xpad.reshape(32, n32, f_pad).transpose(1, 0, 2)
            .reshape(n32, 32 * f_pad))


_REM_CHUNK = 1_048_576   # COO-remainder rows gathered per scan step


_T_MAX_F = 96   # route F <= this through the transposed (narrow-F) kernel


def _apply(packed, packed_t, rem_src, rem_dst, rem_w, num_dst, x):
    f = x.shape[1]
    if f <= _T_MAX_F:
        out = _apply_t(packed_t, num_dst, x)
    else:
        f_pad = max(128, _pad_to(f, 128))
        xp = _arrange_x(x, packed.shape[1], f_pad)
        out = _bit_matmul(packed, xp)[:num_dst, :f]
    r = rem_src.shape[0]
    if r and r <= _REM_CHUNK:
        out = out + jax.ops.segment_sum(
            jnp.take(x, rem_src, axis=0).astype(jnp.float32)
            * rem_w[:, None],
            rem_dst, num_segments=num_dst)
    elif r:
        # chunk the gather+scatter: an (R, F) materialization at R in the
        # tens of millions OOMs HBM (lane padding inflates F to 128)
        pad = _pad_to(r, _REM_CHUNK) - r
        rs = jnp.pad(rem_src, (0, pad))
        rd = jnp.pad(rem_dst, (0, pad))
        rw = jnp.pad(rem_w, (0, pad))          # zero weight = no-op rows
        nc = (r + pad) // _REM_CHUNK

        def body(acc, ch):
            s, d, w = ch
            return acc + jax.ops.segment_sum(
                jnp.take(x, s, axis=0).astype(jnp.float32) * w[:, None],
                d, num_segments=num_dst), None

        out, _ = jax.lax.scan(
            body, out,
            (rs.reshape(nc, _REM_CHUNK), rd.reshape(nc, _REM_CHUNK),
             rw.reshape(nc, _REM_CHUNK)))
    return out


@jax.custom_vjp
def bit_spmm(bf: BitFormat, x):
    """out (num_dst, F) = A @ x via the bitmask kernel + COO remainder."""
    return _apply(bf.packed, bf.packed_rev, bf.rem_src, bf.rem_dst,
                  bf.rem_w, bf.num_dst, x)


def _bit_fwd(bf, x):
    return bit_spmm(bf, x), (bf,)


def _bit_bwd(res, dZ):
    (bf,) = res
    # d/dx (A x) = A^T dZ; remainder transposes by swapping src/dst
    dX = _apply(bf.packed_rev, bf.packed, bf.rem_dst, bf.rem_src,
                bf.rem_w, bf.num_src, dZ)
    return (None, dX.astype(dZ.dtype))


bit_spmm.defvjp(_bit_fwd, _bit_bwd)
