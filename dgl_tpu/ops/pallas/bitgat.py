"""Dense bit-masked flash attention: the GAT hot path over BitFormat.

The bitmask SpMM insight (``bitmm.py``: below ~0.5% density a TPU is
faster streaming the whole 1-bit adjacency than gathering edges)
extends to attention.  GAT scores e_ij = lrelu(el_i + er_j) are
separable node quantities combined per (src, dst) pair, so each
(src-block, dst-plane) tile of scores is a broadcast-add — no edge
tensor, no gather.  The kernel computes scores densely, masks with the
adjacency bits, exponentiates, and consumes the result immediately
(flash-attention structure): the numerator accumulates via an MXU dot
(z^T @ P -> the dst-transposed output) and the denominator via a
row-sum; softmax normalization is one divide at the last grid step.
Nothing edge- or N^2-shaped ever exists in HBM.

Measured (tools/perf_bitgat_probe.py, v5e): fwd 101 ms at 22% of
Reddit area (full-scale ~460 ms) vs the fused slot-space GAT fwd
1059 ms — 2.3x, because slot-space attention pays one-hot MXU
contractions per edge bucket while this pays 2 unpack ops + ~10 VPU
ops per adjacency BIT, and d=492 density makes bits cheaper than
bucket bookkeeping.

Numerics contract (same family as gat_fused.py): NO per-dst max pass;
``el``/``er`` are clipped to ±20 each before entering the kernel, so
raw logits live in [-40, 40] and exp() cannot overflow in f32.
Softmax is shift-invariant, so results are exact while the TRUE logits
stay in range; beyond it, saturated logits flatten toward equal
weights with zero gradient (the clip VJP zeroes them).  Zero-in-degree
rows produce 0 (denominator clamped at 1e-20 — NOT below: f32
subnormals flush to zero on TPU).

Restrictions (dispatcher falls back to the slot/XLA paths): simple
graphs only (the COO multi-edge remainder of BitFormat cannot ride a
softmax), no attention dropout, no ``get_attention``.

Orientation glossary (BitFormat from ``bitmm.pack_bits``):
  ``packed``     (K_pad, N32): row = dst, bit b of word w = src b*N32+w
  ``packed_rev`` (S_pad, K32): row = src, bit b of word w = dst b*K32+w
The FORWARD iterates ``packed_rev`` (src rows stream, dst on
plane-lanes) so the aggregation dot z^T @ P has full 128 output lanes
with D only padding sublanes (the cheap direction — the narrow-F
lesson of ``bitmm._bit_matmul_t``).  The BACKWARD iterates ``packed``
(dst rows stream, src on plane-lanes) for the same reason mirrored:
dZ and del live on the src side.

Reference semantics replaced: GATConv attention
(``python/dgl/nn/pytorch/conv/gatconv.py:14``), i.e. gsddmm u_add_v +
edge_softmax + gspmm u_mul_e_sum (``src/array/kernel.cc:309``); the
dense-bitmask formulation itself has no reference counterpart (GPUs
gather; TPUs stream).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitmm import BitFormat, _interpret, _op_dtype

CLIP = 20.0          # per-operand logit clip (see numerics contract)
_DEN_EPS = 1e-20     # not smaller: f32 subnormals flush to zero on TPU
_VMEM_BUDGET = 14 << 20   # scoped-vmem limit is 16 MiB; leave headroom


def _pick_lanes(k32: int, heads: int, d_: int, bs: int,
                extra=None, strict: bool = True):
    """Largest plane-lane width whose VMEM footprint fits.

    Budget model (measured against the compiler's scoped-vmem
    accounting): scratch accumulators live once; in/out blocks are
    DOUBLE-buffered by the pipeline.  At H*D=128 the 256-lane geometry
    costs 16.86 MiB > the 16 MiB limit; 128 lanes costs ~7 MiB.

    ``extra``: per-KERNEL additional bytes as a function of the lane
    width — each caller models its own hoists / extra operands (the
    forward's per-head elb broadcast, the sharded backward's livp/rhop
    inputs, …) on top of the shared accumulator+block terms.
    ``strict=False`` returns ``None`` instead of raising when no width
    fits, so dispatchers can fall back to the slot path."""
    for bwd in (256, 128):
        if k32 % bwd:
            continue
        acc = heads * 32 * d_ * bwd * 4          # f32 accumulator
        lacc = heads * 32 * bwd * 4
        blocks = (bs * bwd * 4                    # packed bits
                  + heads * d_ * bs * 4           # feature operand (<=f32)
                  + heads * 32 * bwd * 4          # plane-major node vec
                  + acc + lacc)                   # out blocks
        tot = acc + lacc + 2 * blocks
        if extra is not None:
            tot += extra(bwd)
        if tot <= _VMEM_BUDGET:
            return bwd
    if not strict:
        return None
    raise ValueError(
        f"bitgat: no lane width fits VMEM at heads={heads} D={d_} "
        f"(H*D too large for the dense-attention accumulators)")


def _fwd_extra(heads, d_, bs):
    """Forward-kernel buffers beyond the shared model: the per-head elb
    broadcast hoist (all heads alive at once) + the el input block."""
    return lambda bwd: heads * bs * bwd * 4 + 2 * bs * heads * 4


def _bwd_extra(heads, d_, bk):
    """Single-chip backward: one head's 3 broadcast hoists + zeros tile
    + the (bk, 3H) merged node-vector input + der scratch/out blocks."""
    return lambda bws: (4 * bk * bws * 4 + 2 * bk * 3 * heads * 4
                        + bk * heads * 4 + 2 * heads * bk * 4)


# ---------------------------------------------------------------------------
# in-kernel attention dropout (VERDICT r4 #2)
#
# The reference GAT recipe trains with attn_drop=0.6
# (``python/dgl/nn/pytorch/conv/gatconv.py:14``,
# ``examples/pytorch/gat/train.py:24``): each softmax-normalized
# attention weight is zeroed i.i.d. with prob p and survivors scale by
# 1/(1-p).  Flash-style kernels store nothing per edge, so the mask is
# REGENERATED from a counter-based hash of the GLOBAL (src, dst) ids —
# identical in the forward (src-major grid) and backward (dst-major
# grid), and reproducible in the XLA oracle (``dropout_keep_reference``)
# for gradient tests.
#
# VPU budget (two schemes MEASURED on the full-Reddit train step: a
# murmur mix + per-head multiply cost 1.44x, a shared mix + per-head
# byte fields 1.35-1.38x — both over the 1.3x bar): the minimal scheme
# is per-head MULTIPLICATIVE hashing of the raw combined id word.  Per
# tile the bases hoist (base = i*C1 ^ seed, t0 = j*C2); per PLANE the
# pair word is 2 ops (t0 + const_b, xor) because j*C2 distributes over
# the plane's additive id offset; per HEAD the keep bit is the top 15
# bits of ``word * M_h`` (odd multiplier: a bijection on Z/2^32 whose
# high bits are the classic multiplicative hash — mul/shift/cmp).
# Keep threshold = round((1-p) * 2^15): p resolves to ~3e-5, and the
# survivor scale uses the SAME quantized keep so the estimator stays
# unbiased w.r.t. the actual mask probability.
# ---------------------------------------------------------------------------

_DROP_RES = 1 << 15
_DC1 = np.int32(np.uint32(0x9E3779B1))
_DC2 = np.int32(np.uint32(0x85EBCA6B))
_HEAD_MULTS = tuple(np.int32(np.uint32(c)) for c in (
    0xC2B2AE35, 0x27D4EB2F, 0x165667B1, 0x9E3779B9,
    0x85EBCA77, 0xC2B2AE3D, 0x2545F491, 0x94D049BB))


def drop_thresh(attn_drop: float):
    """Static keep-threshold for ``attn_drop`` (None = no dropout)."""
    if attn_drop <= 0.0:
        return None
    if not attn_drop < 1.0:
        raise ValueError(f"attn_drop must be in [0, 1), got {attn_drop}")
    return max(1, int(round((1.0 - attn_drop) * _DROP_RES)))


def _head_keep(x0, h: int, thresh: int):
    """Per-head keep mask: top 15 bits of the per-head multiplicative
    hash of the shared pair word x0 = i*C1 ^ seed ^ j*C2."""
    v = x0 * _HEAD_MULTS[h]
    return jax.lax.shift_right_logical(v, 17) < jnp.int32(thresh)


def dropout_keep_reference(src_ids, dst_ids, heads: int, seed,
                           attn_drop: float):
    """XLA oracle of the in-kernel mask: (E,) global id arrays ->
    (E, heads) bool keep mask — bit-exact with the Pallas kernels."""
    thresh = drop_thresh(attn_drop)
    if thresh is None:
        return jnp.ones(src_ids.shape + (heads,), bool)
    x0 = (src_ids.astype(jnp.int32) * _DC1 ^ jnp.int32(seed)
          ^ dst_ids.astype(jnp.int32) * _DC2)
    return jnp.stack([_head_keep(x0, h, thresh)
                      for h in range(heads)], axis=-1)


# ---------------------------------------------------------------------------
# forward: src-major over packed_rev
# ---------------------------------------------------------------------------


def _fwd_kernel(pt_ref, elc_ref, erp_ref, zt_ref, seed_ref, out_ref,
                l_ref, acc_ref, lacc_ref, *, heads, slope, ns, k32,
                thresh, keep):
    d = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lacc_ref[...] = jnp.zeros_like(lacc_ref)

    p = pt_ref[...]                              # (BS, bwd) int32
    bs, bwd = p.shape
    # hoist the el lane-slice + sublane-broadcast out of the plane loop:
    # repeated 32x per head it breaks tpu_compile_helper (HTTP 500,
    # measured 2026-08-20); materialized once per head it compiles.
    elb = [elc_ref[:, h:h + 1] + jnp.zeros((bs, bwd), jnp.float32)
           for h in range(heads)]
    if thresh is not None:
        # hoisted hash bases: i = src = s*bs + sublane, j = dst =
        # b*k32 + d*bwd + lane; the plane offset folds in as one add
        # because j*C2 distributes over addition (mod 2^32)
        ii = jax.lax.broadcasted_iota(jnp.int32, (bs, bwd), 0) + s * bs
        base = ii * _DC1 ^ seed_ref[0, 0]
        t0 = (jax.lax.broadcasted_iota(jnp.int32, (bs, bwd), 1)
              + d * bwd) * _DC2
    for b in range(32):
        mask = (p & np.int32(np.uint32(1) << b)) != 0
        if thresh is not None:
            # j*C2 distributes over the plane's additive offset b*k32
            cb = np.int32(np.uint32(
                (b * k32 * int(np.uint32(_DC2))) & 0xFFFFFFFF))
            x0 = base ^ (t0 + cb)
        for h in range(heads):
            raw = elb[h] + erp_ref[h, b:b + 1, :]
            sc = jnp.maximum(raw, slope * raw)   # lrelu, 0 <= slope <= 1
            pm = jnp.where(mask, jnp.exp(sc), 0.0)
            lacc_ref[h, b, :] += jnp.sum(pm, axis=0)
            pmc = pm.astype(zt_ref.dtype)
            if thresh is not None:
                # denominator keeps ALL edges (dropout acts on the
                # NORMALIZED weights); numerator keeps the survivors.
                # Select AFTER the bf16 cast — packed bf16 VPU ops run
                # at twice the f32 lane rate.
                pmc = jnp.where(_head_keep(x0, h, thresh), pmc,
                                jnp.zeros_like(pmc))
            acc_ref[h, b] += jax.lax.dot_general(
                zt_ref[h], pmc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(s == ns - 1)
    def _():
        den = jnp.maximum(lacc_ref[...], _DEN_EPS) * keep
        out_ref[...] = acc_ref[...] / den[:, :, None, :]
        l_ref[...] = lacc_ref[...]


@partial(jax.jit, static_argnames=("slope", "thresh"))
def _fwd_call(pt, elc, erp, zt, slope, seed=None, thresh=None):
    s_pad, k32 = pt.shape
    heads, d_, _ = zt.shape
    bs = 512
    bwd = _pick_lanes(k32, heads, d_, bs, extra=_fwd_extra(heads, d_, bs))
    ns = s_pad // bs
    grid = (k32 // bwd, ns)
    keep = 1.0 if thresh is None else thresh / _DROP_RES
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads, slope=slope, ns=ns, k32=k32,
                thresh=thresh, keep=keep),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bwd), lambda d, s: (s, d)),
            pl.BlockSpec((bs, heads), lambda d, s: (s, 0)),
            pl.BlockSpec((heads, 32, bwd), lambda d, s: (0, 0, d)),
            pl.BlockSpec((heads, d_, bs), lambda d, s: (0, 0, s)),
            pl.BlockSpec((1, 1), lambda d, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
            pl.BlockSpec((heads, 32, bwd), lambda d, s: (0, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, 32, d_, k32), jnp.float32),
            jax.ShapeDtypeStruct((heads, 32, k32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, 32, d_, bwd), jnp.float32),
            pltpu.VMEM((heads, 32, bwd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_pad * k32 * 32 * d_ * heads,
            bytes_accessed=s_pad * k32 * 4
            + s_pad * heads * d_ * 2 + 32 * k32 * d_ * heads * 4,
            transcendentals=s_pad * k32 * 32 * heads),
        interpret=_interpret(),
    )(pt, elc, erp, zt, seed)


# ---------------------------------------------------------------------------
# backward: dst-major over packed
# ---------------------------------------------------------------------------


def _bwd_kernel(pk_ref, elp_ref, nvec_ref, gt_ref, zpt_ref, seed_ref,
                dzt_ref, delp_ref, der_ref,
                dz_acc, del_acc, der_acc, *, heads, slope, nk, n32,
                thresh):
    """VMEM-stack discipline (measured 2026-08-20, /tmp bisect at 50k
    nodes): the natural form — b,h fully unrolled, per-head broadcast
    hoists, grad-er as an SSA accumulation chain of (BK, 1) values —
    costs 39.4 MiB of scoped vmem against the 16 MiB limit.  The chain
    alone is ~21 MiB (each (BK, 1) link pads to a full 128-lane tile
    and Mosaic keeps every link alive); H-wide hoists and 32x unroll
    liveness add the rest.  So: heads stay OUTER (one head's hoists
    alive at a time), the 32 bit-planes run as a fori_loop (single-
    iteration temporary liveness), and grad-er accumulates into a
    scratch ref (one buffer, re-zeroed each grid step).

    HBM-layout discipline (full-Reddit OOM, measured 2026-08-20): every
    array whose TRAILING dim is H or D pays a 128-lane tile pad in HBM
    (32x at H=4 — a (nb, K_pad, H) grad-er output alone was 6.46 GB).
    So (a) grad-er streams out as (nb, H, K_pad) — lanes carry dst
    rows; the (BK, H) scratch is rotated by an MXU dot with I_H (plain
    2D transpose is not a Mosaic primitive, a (H, H) contraction always
    is); (b) the dst-row node vectors (er, 1/l, rho) ride ONE merged
    (K_pad, 3H) operand — one lane-pad instead of three; (c) the dy
    operand exists only as (H, D, K_pad) — the (H, K_pad, D) mirror
    would lane-pad D 4x; the SDDMM dot contracts dim 0 of both."""
    n = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        dz_acc[...] = jnp.zeros_like(dz_acc)
        del_acc[...] = jnp.zeros_like(del_acc)

    p = pk_ref[...]                              # (BK, bws) int32
    bk, bws = p.shape
    zeros = jnp.zeros((bk, bws), jnp.float32)
    der_acc[...] = jnp.zeros_like(der_acc)       # per-k rows: reset each step
    if thresh is not None:
        # dropout mask from GLOBAL ids: dst j = k*bk + row, src
        # i = b*n32 + n*bws + lane — the same (i, j) hash as the
        # forward's src-major grid, regenerated flash-style.  Here the
        # SRC id varies per plane, so hoist u0 = lane_src*C1 and
        # pre = seed ^ j*C2 (xor commutes), fold the plane offset as
        # one add of a compile-time constant.
        jj = jax.lax.broadcasted_iota(jnp.int32, (bk, bws), 0) + k * bk
        pre = seed_ref[0, 0] ^ jj * _DC2
        u0 = (jax.lax.broadcasted_iota(jnp.int32, (bk, bws), 1)
              + n * bws) * _DC1
        # the src id varies per plane: i*C1 distributes over the plane
        # offset b*n32, and b is TRACED here (fori_loop group), so fold
        # (n32*C1) mod 2^32 statically and multiply by b in-kernel
        c1n32 = np.int32(np.uint32(
            (n32 * int(np.uint32(_DC1))) & 0xFFFFFFFF))
    for h in range(heads):
        erb = nvec_ref[:, h:h + 1] + zeros
        lib = nvec_ref[:, heads + h:heads + h + 1] + zeros
        rhb = nvec_ref[:, 2 * heads + h:2 * heads + h + 1] + zeros
        gt_h = gt_ref[h]                         # (D, BK)

        def plane(b):
            mask = (p & jnp.left_shift(jnp.int32(1), b)) != 0
            raw = erb + elp_ref[b, h:h + 1, :]   # (BK, bws) + (1, bws)
            sc = jnp.maximum(raw, slope * raw)
            alpha = jnp.where(mask, jnp.exp(sc), 0.0) * lib
            # u_ij = g_j . z_i  — dense SDDMM dot (contraction = D,
            # dim 0 of BOTH operands: gt (D, BK) x zpt (D, bws))
            u = jax.lax.dot_general(
                gt_h, zpt_ref[h, b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if thresh is not None:
                # lib rides pre-scaled by 1/keep and rhb by keep, so
                # the dropout VJP is ONE select: alpha_m = mask*alpha
                # serves both de (alpha_m*u - alpha*rhb == the masked-u
                # form) and the dz dot operand
                x0 = (u0 + b * c1n32) ^ pre
                alpha_m = jnp.where(_head_keep(x0, h, thresh), alpha,
                                    0.0)
                de = alpha_m * u - alpha * rhb
            else:
                alpha_m = alpha
                de = alpha * (u - rhb)           # softmax VJP
            draw = jnp.where(raw > 0, de, slope * de)   # lrelu VJP
            der_acc[:, h:h + 1] += jnp.sum(draw, axis=1, keepdims=True)
            del_acc[b, h:h + 1, :] += jnp.sum(draw, axis=0, keepdims=True)
            dz_acc[h, b] += jax.lax.dot_general(
                gt_h, alpha_m.astype(gt_h.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # manual 16-plane group unroll (measured at full Reddit,
        # fwd+bwd ms/step: no unroll 2182, groups of 8 1469, groups of
        # 16 1370, full 32x unroll = 24.2M VMEM stack > the 16M limit;
        # Mosaic's fori_loop unroll= only supports 1 or num_steps) —
        # so loop over 2 groups, 16 statically-unrolled planes per body
        def plane_group(i, carry):
            for j in range(16):
                plane(i * 16 + j)
            return carry

        jax.lax.fori_loop(0, 2, plane_group, 0)
    # rotate (BK, H) -> (H, BK) on the MXU: I_H contracted with der_acc
    der_ref[0] = jax.lax.dot_general(
        jnp.eye(heads, dtype=jnp.float32), der_acc[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        dzt_ref[...] = dz_acc[...]
        delp_ref[...] = del_acc[...]


@partial(jax.jit, static_argnames=("slope", "thresh"))
def _bwd_call(pk, elp, nvec, gt, zpt, slope, seed=None, thresh=None):
    k_pad, n32 = pk.shape
    heads, _, d_, _ = zpt.shape
    bk = 512
    bws = _pick_lanes(n32, heads, d_, bk, extra=_bwd_extra(heads, d_, bk))
    nk = k_pad // bk
    nb = n32 // bws
    grid = (nb, nk)
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    return pl.pallas_call(
        partial(_bwd_kernel, heads=heads, slope=slope, nk=nk, n32=n32,
                thresh=thresh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, bws), lambda n, k: (k, n)),
            pl.BlockSpec((32, heads, bws), lambda n, k: (0, 0, n)),
            pl.BlockSpec((bk, 3 * heads), lambda n, k: (k, 0)),
            pl.BlockSpec((heads, d_, bk), lambda n, k: (0, 0, k)),
            pl.BlockSpec((heads, 32, d_, bws), lambda n, k: (0, 0, 0, n)),
            pl.BlockSpec((1, 1), lambda n, k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((heads, 32, d_, bws), lambda n, k: (0, 0, 0, n)),
            pl.BlockSpec((32, heads, bws), lambda n, k: (0, 0, n)),
            pl.BlockSpec((1, heads, bk), lambda n, k: (n, 0, k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, 32, d_, n32), jnp.float32),
            jax.ShapeDtypeStruct((32, heads, n32), jnp.float32),
            jax.ShapeDtypeStruct((nb, heads, k_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, 32, d_, bws), jnp.float32),
            pltpu.VMEM((32, heads, bws), jnp.float32),
            pltpu.VMEM((bk, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * k_pad * n32 * 32 * d_ * heads,
            bytes_accessed=k_pad * n32 * 4
            + k_pad * heads * d_ * 4 + 32 * n32 * d_ * heads * 6,
            transcendentals=k_pad * n32 * 32 * heads),
        interpret=_interpret(),
    )(pk, elp, nvec, gt, zpt, seed)


# ---------------------------------------------------------------------------
# layout plumbing (all inside jit at the call sites)
# ---------------------------------------------------------------------------


def _plane_major_node(v, n_pad):
    """(N, H) f32 -> (H, 32, n_pad//32): entry [h, b, w] = v[b*n32 + w]."""
    n32 = n_pad // 32
    out = jnp.zeros((n_pad, v.shape[1]), jnp.float32).at[: v.shape[0]].set(
        v.astype(jnp.float32))
    return out.reshape(32, n32, v.shape[1]).transpose(2, 0, 1)


def _plane_first_node(v, n_pad):
    """(N, H) f32 -> (32, H, n_pad//32): entry [b, h, w] = v[b*n32 + w].

    Plane-FIRST variant for the backward kernel: the plane index must be
    dim 0 (a batch dim) so the in-kernel fori_loop can index it
    dynamically — dynamic sublane indexing is not a thing on TPU."""
    n32 = n_pad // 32
    out = jnp.zeros((n_pad, v.shape[1]), jnp.float32).at[: v.shape[0]].set(
        v.astype(jnp.float32))
    return out.reshape(32, n32, v.shape[1]).transpose(0, 2, 1)


def _row_pad(v, n_pad):
    """(N, ...) -> (n_pad, ...) zero-padded f32."""
    pad = n_pad - v.shape[0]
    return jnp.pad(v.astype(jnp.float32), ((0, pad),) + ((0, 0),) *
                   (v.ndim - 1))


def _unplane_node(t, num):
    """(H, 32, n32) -> (num, H)."""
    h, _, n32 = t.shape
    return t.transpose(1, 2, 0).reshape(32 * n32, h)[:num]


def _unplane_feat(t, num):
    """(H, 32, D, n32) -> (num, H, D): node id = b * n32 + w."""
    h, _, d_, n32 = t.shape
    return t.transpose(1, 3, 0, 2).reshape(32 * n32, h, d_)[:num]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _bitgat_core(bf: BitFormat, el, er, z, seed, slope, thresh):
    out, _ = _bitgat_fwd(bf, el, er, z, seed, slope, thresh)
    return out


def _bitgat_fwd(bf: BitFormat, el, er, z, seed, slope, thresh):
    heads, d_ = z.shape[1], z.shape[2]
    s_pad, k32 = bf.packed_rev.shape
    dt = _op_dtype()
    elc = _row_pad(el, s_pad)                                # (S_pad, H)
    erp = _plane_major_node(er, 32 * k32)                    # (H, 32, K32)
    zt = jnp.zeros((s_pad, heads, d_), dt).at[: z.shape[0]].set(
        z.astype(dt)).transpose(1, 2, 0)                     # (H, D, S_pad)
    out_t, l_t = _fwd_call(bf.packed_rev, elc, erp, zt, slope,
                           seed=seed, thresh=thresh)
    out = _unplane_feat(out_t, bf.num_dst)                   # (num_dst,H,D)
    l = _unplane_node(l_t, bf.num_dst)                       # (num_dst, H)
    return out, (bf, el, er, z, seed, l, out)


def _bitgat_fwd_vjp(bf, el, er, z, seed, slope, thresh):
    out, res = _bitgat_fwd(bf, el, er, z, seed, slope, thresh)
    return out, res


def _bitgat_bwd(slope, thresh, res, g):
    bf, el, er, z, seed, l, out = res
    heads, d_ = z.shape[1], z.shape[2]
    k_pad, n32 = bf.packed.shape
    dt = _op_dtype()
    g = g.astype(jnp.float32)
    # rho from the (dropout-)forward output IS the softmax-VJP dot for
    # the masked weights: (g . out) = sum_i a~_ij u_ij
    rho = (g * out).sum(-1)                                  # (num_dst, H)
    linv = 1.0 / jnp.maximum(l, _DEN_EPS)
    if thresh is not None:
        # pre-scale so the kernel's dropout VJP is pure masking:
        # alpha rides linv/keep, the rho term rides rho*keep
        keep = thresh / _DROP_RES
        linv = linv / keep
        rho = rho * keep
    elp = _plane_first_node(el, 32 * n32)                    # (32, H, N32)
    # one merged (K_pad, 3H) dst-row operand: [er | 1/l | rho] — three
    # separate (K_pad, H) arrays each pay a 32x HBM lane pad at H=4
    nvec = _row_pad(jnp.concatenate(
        [er.astype(jnp.float32), linv, rho], axis=1), k_pad)
    gt = jnp.zeros((k_pad, heads, d_), dt).at[: g.shape[0]].set(
        g.astype(dt)).transpose(1, 2, 0)                     # (H, D, K_pad)
    zpt = jnp.zeros((32 * n32, heads, d_), dt).at[: z.shape[0]].set(
        z.astype(dt)).reshape(32, n32, heads, d_).transpose(2, 0, 3, 1)
    dzt, delp, der_part = _bwd_call(bf.packed, elp, nvec, gt, zpt, slope,
                                    seed=seed, thresh=thresh)
    dz = _unplane_feat(dzt, z.shape[0]).astype(z.dtype)
    # delp is plane-FIRST (32, H, n32): node id = b * n32 + w
    dl = delp.transpose(0, 2, 1).reshape(32 * n32, heads)[
        : el.shape[0]].astype(el.dtype)
    # der_part (nb, H, K_pad): partial sums over src-plane blocks
    dr = der_part.sum(0).T[: er.shape[0]].astype(er.dtype)
    return (None, dl, dr, dz, None)


_bitgat_core.defvjp(_bitgat_fwd_vjp, _bitgat_bwd)


def bitgat_attention_aggregate(bf: BitFormat, el, er, z,
                               negative_slope: float = 0.2,
                               attn_drop: float = 0.0,
                               dropout_seed=None):
    """GAT attention + aggregation over the bitmask format.

    ``el``/``er`` (N_src, H)/(N_dst, H) attention logits, ``z``
    (N_src, H, D) projected source features ->
    (N_dst, H, D) softmax-weighted aggregation.  Differentiable in
    el/er/z (Appendix-A style custom VJP, flash recomputation).

    ``attn_drop`` > 0 applies the reference's attention dropout
    (``nn/pytorch/conv/gatconv.py:14``: drop NORMALIZED weights, scale
    survivors by 1/(1-p)) INSIDE the kernels — the mask is a
    counter-based hash of (src, dst, head, ``dropout_seed``),
    regenerated in the backward, nothing stored.  ``dropout_seed``: an
    int32 scalar (traced is fine — vary it per training step).

    Requires a SIMPLE graph (``bf.rem_src`` empty) — multi-edges
    cannot ride the bitmask's COO remainder through a softmax.
    """
    if bf.rem_src.shape[0]:
        raise ValueError(
            "bitgat requires a simple graph (BitFormat has a multi-edge "
            "remainder); use the slot-space or XLA attention path")
    thresh = drop_thresh(attn_drop)
    if thresh is not None and z.shape[1] > 8:
        raise ValueError(
            "bitgat in-kernel dropout supports up to 8 heads, got "
            f"{z.shape[1]}")
    if thresh is not None and dropout_seed is None:
        raise ValueError("attn_drop > 0 requires dropout_seed")
    seed = (jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
            if thresh is not None else jnp.zeros((1, 1), jnp.int32))
    el = jnp.clip(el, -CLIP, CLIP)     # the ±40-raw-logit contract;
    er = jnp.clip(er, -CLIP, CLIP)     # clip VJP zeroes saturated grads
    return _bitgat_core(bf, el, er, z, seed, float(negative_slope),
                        thresh)
