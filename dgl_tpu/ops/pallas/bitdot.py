"""Dense bit-masked dot-product flash attention: DotGat over BitFormat.

``bitgat.py`` extends the bitmask-SpMM insight to SEPARABLE (GAT-style)
attention scores; this module covers the dot-product family
(DotGatConv): e_ij = (z_i . q_j) / sqrt(D).  Dot scores are where the
dense formulation shines brightest — the per-tile score block is ONE
MXU contraction (z^T-block x q-plane), so the whole attention chain is
three MXU passes per (src-block, dst-plane, head) tile with zero
gather, zero edge tensor, zero N^2 HBM traffic (flash structure, as in
``bitgat``).

DotGat specialization (k == v): DotGatConv uses the SAME projected
source tensor as attention key and as message value
(``python/dgl/nn/pytorch/conv/dotgatconv.py:12``).  The backward
exploits this: dK and dV land in ONE accumulator (dz = dK + dV), which
is what lets the dst-major pass fit the 16 MiB VMEM budget at
H*D = 128 (separate dK/dV accumulators measure 17.9 MiB > limit).

Measured, full Reddit (114.6M edges, v5e, vs the slot-space path):
  H=2 D=64: fwd 671 ms vs 1306 (1.95x), fwd+bwd 2552 vs 3657 (1.43x)
  H=4 D=32: fwd 1217 vs 1316 (1.08x), fwd+bwd 4676 vs 3676 (0.79x)
The score-dot contraction depth IS the head dim D, so at D=32 the MXU
runs quarter-depth and training loses to the slot path — the
dispatcher gates this kernel on D >= 64 (slot cost is flat in the
H/D split at fixed H*D; the dense dots double their efficiency).

Backward structure — two passes, one per orientation (the src-side
grads dz accumulate over dst, the dst-side grad dq accumulates over
src; a single pass would need one of them as O(grid) partial sums in
HBM, the 6.46 GB lane-padding lesson of ``bitgat._bwd_call``):
  pass A (dst rows stream over ``packed``):     dz = dK + dV
  pass B (src rows stream over ``packed_rev``): dq
Each pass re-streams the bit matrix once (flash recomputation — the
score tile is cheaper to recompute than any edge tensor is to store).

Numerics contract (matches the slot-space path ``gat_fused.py:515``):
scores e = (z.q)/sqrt(D) are clipped to +-40 before exp, replacing the
per-dst max-subtraction; exact while true scores are in range, and the
clip VJP zeroes saturated gradients.  Zero-in-degree rows produce 0
(denominator clamped at 1e-20).

Restrictions (dispatcher falls back to slot/XLA paths): simple graphs
only, no attention dropout.

Reference semantics replaced: DotGatConv
(``python/dgl/nn/pytorch/conv/dotgatconv.py:12``) = gsddmm u_dot_v +
edge_softmax + gspmm u_mul_e_sum (``src/array/kernel.cc:309``).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitmm import BitFormat, _interpret, _op_dtype
from .bitgat import (_DEN_EPS, _VMEM_BUDGET, _plane_first_node, _row_pad,
                     _unplane_feat)

CLIP = 40.0   # score clip before exp (same as gat_fused.py slot path)


def _pick_lanes(k32: int, heads: int, d_: int, bs: int, dtb: int) -> int:
    """Largest plane-lane width fitting VMEM (cf. bitgat._pick_lanes);
    the dot kernels additionally double-buffer a plane-major FEATURE
    block (H, 32, D, lanes) instead of bitgat's (H, 32, lanes) node
    vector, so the budget charges H*32*D*lanes*dtb per feature operand.
    ``dtb`` = bytes of the MXU operand dtype (2 on TPU, 4 interpret)."""
    for bwd in (256, 128):
        if k32 % bwd:
            continue
        if _interpret():
            return bwd      # interpret mode has no VMEM; widest wins
        acc = heads * 32 * d_ * bwd * 4
        lacc = heads * 32 * bwd * 4
        blocks = (bs * bwd * 4                    # packed bits
                  + 2 * heads * d_ * bs * dtb    # row-feature operands
                  + 2 * heads * 32 * d_ * bwd * dtb  # plane-major feats
                  + 2 * heads * 32 * bwd * 4     # plane-major node vecs
                  + acc + lacc)                  # out blocks
        if acc + lacc + 2 * blocks <= _VMEM_BUDGET:
            return bwd
    raise ValueError(
        f"bitdot: no lane width fits VMEM at heads={heads} D={d_} "
        f"(H*D too large for the dense-attention accumulators)")


# ---------------------------------------------------------------------------
# forward: src-major over packed_rev
# ---------------------------------------------------------------------------


def _fwd_kernel(pt_ref, zt_ref, qp_ref, out_ref, l_ref,
                acc_ref, lacc_ref, *, heads, isd, ns):
    """Loop/layout discipline (measured on bitgat, re-measured here):
    heads outer with the row-layout score operand hoisted ONCE per head
    (an MXU dot with I_D — per-plane dim0-dim0 contractions relayout;
    hoisting cut fwd 1617 -> 1215 ms at full Reddit), planes as a 2x16
    group-unrolled fori_loop (full 32x unroll = 21.6M VMEM stack > the
    16M limit; plain fori_loop serializes the dots).  ``lacc`` is
    plane-FIRST (32, H, lanes): the dynamic plane index must land on a
    batch dim.  (A ones-row-in-the-dot denominator variant measured
    1322 ms — the VPU column-sum is NOT the bottleneck; don't redo.)"""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lacc_ref[...] = jnp.zeros_like(lacc_ref)

    p = pt_ref[...]                              # (BS, bwd) int32
    d_ = zt_ref.shape[1]
    eye = jnp.eye(d_, dtype=zt_ref.dtype)
    for h in range(heads):
        zt_h = zt_ref[h]                         # (D, BS)
        zrow = jax.lax.dot_general(
            zt_h, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(zt_ref.dtype)

        def plane(b):
            mask = (p & jnp.left_shift(jnp.int32(1), b)) != 0
            # score tile: one MXU pass, contraction = D
            raw = jax.lax.dot_general(
                zrow, qp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc = jnp.clip(raw * isd, -CLIP, CLIP)
            pm = jnp.where(mask, jnp.exp(sc), 0.0)
            lacc_ref[b, h:h + 1, :] += jnp.sum(pm, axis=0, keepdims=True)
            acc_ref[h, b] += jax.lax.dot_general(
                zt_h, pm.astype(zt_ref.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def plane_group(i, carry):
            for j in range(16):
                plane(i * 16 + j)
            return carry

        jax.lax.fori_loop(0, 2, plane_group, 0)

    @pl.when(s == ns - 1)
    def _():
        for h in range(heads):
            for b in range(32):
                den = jnp.maximum(lacc_ref[b, h:h + 1, :], _DEN_EPS)
                out_ref[h, b] = acc_ref[h, b] / den
        l_ref[...] = lacc_ref[...]


@partial(jax.jit, static_argnames=("isd",))
def _fwd_call(pt, zt, qp, isd):
    s_pad, k32 = pt.shape
    heads, d_, _ = zt.shape
    bs = 512
    dtb = jnp.dtype(zt.dtype).itemsize
    bwd = _pick_lanes(k32, heads, d_, bs, dtb)
    ns = s_pad // bs
    grid = (k32 // bwd, ns)
    return pl.pallas_call(
        partial(_fwd_kernel, heads=heads, isd=isd, ns=ns),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bwd), lambda d, s: (s, d)),
            pl.BlockSpec((heads, d_, bs), lambda d, s: (0, 0, s)),
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
            pl.BlockSpec((32, heads, bwd), lambda d, s: (0, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, 32, d_, k32), jnp.float32),
            jax.ShapeDtypeStruct((32, heads, k32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, 32, d_, bwd), jnp.float32),
            pltpu.VMEM((32, heads, bwd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * s_pad * k32 * 32 * d_ * heads,
            bytes_accessed=s_pad * k32 * 4 + 2 * s_pad * heads * d_ * 2
            + 32 * k32 * d_ * heads * 4,
            transcendentals=s_pad * k32 * 32 * heads),
        interpret=_interpret(),
    )(pt, zt, qp)


# ---------------------------------------------------------------------------
# backward pass A: dst-major over packed -> dz (= dK + dV)
# ---------------------------------------------------------------------------


def _bwdA_kernel(pk_ref, qt_ref, gt_ref, nvec_ref, zp_ref, dzt_ref,
                 dz_acc, *, heads, isd, nk):
    """Heads outer + 16-plane group unroll: the VMEM-stack and
    pipelining discipline measured on bitgat's backward (full 32x
    unroll blows the 16 MiB scoped-vmem stack; a plain fori_loop
    serializes the per-plane MXU dots — 1733 -> 1018 ms at full
    Reddit with 8-plane groups, and dot kernels want the larger
    group since dots dominate)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        dz_acc[...] = jnp.zeros_like(dz_acc)

    p = pk_ref[...]                              # (BK, bws) int32
    bk, bws = p.shape
    d_ = qt_ref.shape[1]
    eye = jnp.eye(d_, dtype=qt_ref.dtype)
    zeros = jnp.zeros((bk, bws), jnp.float32)
    for h in range(heads):
        lib = nvec_ref[:, h:h + 1] + zeros
        rhb = nvec_ref[:, heads + h:heads + h + 1] + zeros
        qt_h = qt_ref[h]                         # (D, BK)
        gt_h = gt_ref[h]                         # (D, BK)
        # hoisted row-layout operands (one MXU I_D rotation per head —
        # see _fwd_kernel): per-plane dim0-dim0 contractions relayout
        qrow = jax.lax.dot_general(
            qt_h, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(qt_ref.dtype)
        grow = jax.lax.dot_general(
            gt_h, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(gt_ref.dtype)

        def plane(b):
            mask = (p & jnp.left_shift(jnp.int32(1), b)) != 0
            raw = jax.lax.dot_general(
                qrow, zp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = raw * isd
            pm = jnp.where(mask, jnp.exp(jnp.clip(e, -CLIP, CLIP)), 0.0)
            alpha = pm * lib
            u = jax.lax.dot_general(
                grow, zp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            de = alpha * (u - rhb)               # softmax VJP
            # clip VJP zeroes saturated scores; d(raw)/d(e) = isd
            draw = jnp.where((e > -CLIP) & (e < CLIP), de, 0.0) * isd
            # dz = dK + dV in one accumulator (k == v for DotGat)
            dz_acc[h, b] += jax.lax.dot_general(
                qt_h, draw.astype(qt_h.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz_acc[h, b] += jax.lax.dot_general(
                gt_h, alpha.astype(gt_h.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def plane_group(i, carry):
            for j in range(16):
                plane(i * 16 + j)
            return carry

        jax.lax.fori_loop(0, 2, plane_group, 0)

    @pl.when(k == nk - 1)
    def _():
        dzt_ref[...] = dz_acc[...]


@partial(jax.jit, static_argnames=("isd",))
def _bwdA_call(pk, qt, gt, nvec, zp, isd):
    k_pad, n32 = pk.shape
    heads, _, d_, _ = zp.shape
    bk = 512
    dtb = jnp.dtype(zp.dtype).itemsize
    bws = _pick_lanes(n32, heads, d_, bk, dtb)
    nk = k_pad // bk
    grid = (n32 // bws, nk)
    return pl.pallas_call(
        partial(_bwdA_kernel, heads=heads, isd=isd, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, bws), lambda n, k: (k, n)),
            pl.BlockSpec((heads, d_, bk), lambda n, k: (0, 0, k)),
            pl.BlockSpec((heads, d_, bk), lambda n, k: (0, 0, k)),
            pl.BlockSpec((bk, 2 * heads), lambda n, k: (k, 0)),
            pl.BlockSpec((heads, 32, d_, bws), lambda n, k: (0, 0, 0, n)),
        ],
        out_specs=[
            pl.BlockSpec((heads, 32, d_, bws), lambda n, k: (0, 0, 0, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, 32, d_, n32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, 32, d_, bws), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * k_pad * n32 * 32 * d_ * heads,
            bytes_accessed=k_pad * n32 * 4 + 2 * k_pad * heads * d_ * 2
            + 32 * n32 * d_ * heads * 6,
            transcendentals=k_pad * n32 * 32 * heads),
        interpret=_interpret(),
    )(pk, qt, gt, nvec, zp)


# ---------------------------------------------------------------------------
# backward pass B: src-major over packed_rev -> dq
# ---------------------------------------------------------------------------


def _bwdB_kernel(pt_ref, zt_ref, qp_ref, gp_ref, livp_ref, rhop_ref,
                 dqt_ref, dq_acc, *, heads, isd, ns):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    p = pt_ref[...]                              # (BS, bwd) int32
    d_ = zt_ref.shape[1]
    eye = jnp.eye(d_, dtype=zt_ref.dtype)
    for h in range(heads):
        zt_h = zt_ref[h]                         # (D, BS)
        zrow = jax.lax.dot_general(               # hoisted rotation
            zt_h, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(zt_ref.dtype)

        def plane(b):
            mask = (p & jnp.left_shift(jnp.int32(1), b)) != 0
            raw = jax.lax.dot_general(
                zrow, qp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            e = raw * isd
            pm = jnp.where(mask, jnp.exp(jnp.clip(e, -CLIP, CLIP)), 0.0)
            # livp/rhop are plane-FIRST (32, H, lanes): the dynamic
            # plane index must land on dim 0 (a batch dim) — dynamic
            # sublane indexing is not a thing on TPU
            alpha = pm * livp_ref[b, h:h + 1, :]   # (1, bwd) broadcast
            u = jax.lax.dot_general(
                zrow, gp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            de = alpha * (u - rhop_ref[b, h:h + 1, :])
            draw = jnp.where((e > -CLIP) & (e < CLIP), de, 0.0) * isd
            dq_acc[h, b] += jax.lax.dot_general(
                zt_h, draw.astype(zt_h.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def plane_group(i, carry):
            for j in range(16):
                plane(i * 16 + j)
            return carry

        jax.lax.fori_loop(0, 2, plane_group, 0)

    @pl.when(s == ns - 1)
    def _():
        dqt_ref[...] = dq_acc[...]


@partial(jax.jit, static_argnames=("isd",))
def _bwdB_call(pt, zt, qp, gp, livp, rhop, isd):
    s_pad, k32 = pt.shape
    heads, d_, _ = zt.shape
    bs = 512
    dtb = jnp.dtype(zt.dtype).itemsize
    bwd = _pick_lanes(k32, heads, d_, bs, dtb)
    ns = s_pad // bs
    grid = (k32 // bwd, ns)
    return pl.pallas_call(
        partial(_bwdB_kernel, heads=heads, isd=isd, ns=ns),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bwd), lambda d, s: (s, d)),
            pl.BlockSpec((heads, d_, bs), lambda d, s: (0, 0, s)),
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
            pl.BlockSpec((32, heads, bwd), lambda d, s: (0, 0, d)),
            pl.BlockSpec((32, heads, bwd), lambda d, s: (0, 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((heads, 32, d_, bwd), lambda d, s: (0, 0, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, 32, d_, k32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, 32, d_, bwd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * s_pad * k32 * 32 * d_ * heads,
            bytes_accessed=s_pad * k32 * 4 + s_pad * heads * d_ * 2
            + 3 * 32 * k32 * d_ * heads * 4,
            transcendentals=s_pad * k32 * 32 * heads),
        interpret=_interpret(),
    )(pt, zt, qp, gp, livp, rhop)


# ---------------------------------------------------------------------------
# layout plumbing + custom VJP
# ---------------------------------------------------------------------------


def _feat_rows_t(x, n_pad, heads, d_, dt):
    """(N, H, D) -> (H, D, n_pad) zero-padded, dtype dt."""
    return jnp.zeros((n_pad, heads, d_), dt).at[: x.shape[0]].set(
        x.astype(dt)).transpose(1, 2, 0)


def _feat_plane_major(x, n_pad, heads, d_, dt):
    """(N, H, D) -> (H, 32, D, n_pad//32): entry [h,b,:,w] = x[b*n32+w,h]."""
    n32 = n_pad // 32
    return jnp.zeros((n_pad, heads, d_), dt).at[: x.shape[0]].set(
        x.astype(dt)).reshape(32, n32, heads, d_).transpose(2, 0, 3, 1)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bitdot_core(bf: BitFormat, q, z, isd):
    out, _ = _bitdot_fwd(bf, q, z, isd)
    return out


def _bitdot_fwd(bf: BitFormat, q, z, isd):
    heads, d_ = z.shape[1], z.shape[2]
    s_pad, k32 = bf.packed_rev.shape
    dt = _op_dtype()
    zt = _feat_rows_t(z, s_pad, heads, d_, dt)
    qp = _feat_plane_major(q, 32 * k32, heads, d_, dt)
    out_t, l_t = _fwd_call(bf.packed_rev, zt, qp, isd)
    out = _unplane_feat(out_t, bf.num_dst)
    # l_t is plane-FIRST (32, H, k32): node id = b * k32 + w
    l = l_t.transpose(0, 2, 1).reshape(32 * k32, heads)[: bf.num_dst]
    return out, (bf, q, z, l, out)


def _bitdot_fwd_vjp(bf, q, z, isd):
    out, res = _bitdot_fwd(bf, q, z, isd)
    return out, res


def _bitdot_bwd(isd, res, g):
    bf, q, z, l, out = res
    heads, d_ = z.shape[1], z.shape[2]
    k_pad, n32 = bf.packed.shape
    s_pad, k32 = bf.packed_rev.shape
    dt = _op_dtype()
    g = g.astype(jnp.float32)
    rho = (g * out).sum(-1)                      # (num_dst, H)
    linv = 1.0 / jnp.maximum(l, _DEN_EPS)
    # pass A (dst-major): dz = dK + dV
    nvec = _row_pad(jnp.concatenate([linv, rho], axis=1), k_pad)
    qt = _feat_rows_t(q, k_pad, heads, d_, dt)
    gt = _feat_rows_t(g, k_pad, heads, d_, dt)
    zp = _feat_plane_major(z, 32 * n32, heads, d_, dt)
    dzt = _bwdA_call(bf.packed, qt, gt, nvec, zp, isd)[0]
    dz = _unplane_feat(dzt, z.shape[0]).astype(z.dtype)
    # pass B (src-major): dq
    zt = _feat_rows_t(z, s_pad, heads, d_, dt)
    qp = _feat_plane_major(q, 32 * k32, heads, d_, dt)
    gp = _feat_plane_major(g, 32 * k32, heads, d_, dt)
    livp = _plane_first_node(linv, 32 * k32)     # (32, H, K32)
    rhop = _plane_first_node(rho, 32 * k32)
    dqt = _bwdB_call(bf.packed_rev, zt, qp, gp, livp, rhop, isd)[0]
    dq = _unplane_feat(dqt, q.shape[0]).astype(q.dtype)
    return (None, dq, dz)


_bitdot_core.defvjp(_bitdot_fwd_vjp, _bitdot_bwd)


def bitdot_attention_aggregate(bf: BitFormat, q, z):
    """DotGat attention + aggregation over the bitmask format.

    ``q`` (N_dst, H, D) projected destination features, ``z``
    (N_src, H, D) projected source features serving as BOTH attention
    key and message value (the DotGat contract) ->
    (N_dst, H, D) softmax( (z.q)/sqrt(D) )-weighted aggregation.
    Differentiable in q/z.

    Requires a SIMPLE graph (``bf.rem_src`` empty) — multi-edges
    cannot ride the bitmask's COO remainder through a softmax.
    """
    if bf.rem_src.shape[0]:
        raise ValueError(
            "bitdot requires a simple graph (BitFormat has a multi-edge "
            "remainder); use the slot-space or XLA attention path")
    return _bitdot_core(bf, q, z, 1.0 / math.sqrt(z.shape[2]))
