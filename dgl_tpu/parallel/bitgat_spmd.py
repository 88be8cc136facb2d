"""Mesh-sharded dense bit-masked flash attention (multi-chip GAT).

Extends the sharded bitmask SpMM (``bitspmd.py``) to the attention hot
path (``ops/pallas/bitgat.py``).  Destination sharding is the natural
choice for attention: softmax normalizes over each dst's IN-edges, and
a dst-sharded packing keeps every in-edge of a local dst on its owner —
the softmax is ENTIRELY local, no cross-device reduction ever touches
the attention chain.

Data movement per layer (the bitspmd wire math, unchanged):
  forward:  all_gather of el (N, H) + z (N, H, D) bf16 over ICI
            (~15 MB at Reddit H*D=128) vs ~N^2/8P bytes of local
            adjacency streaming per chip — the collective is noise.
  backward: one more all_gather (recompute) + ONE psum_scatter of the
            src-side grads (dz, del); der (dst-side) is local.

One shard set serves forward AND backward — symmetric or not.  The
column shard of the A^T packing (src rows x local dst planes) contains
every in-edge of the local dst range, which is everything attention
needs; the backward runs a SRC-MAJOR local kernel over the same shard
(grid: src blocks outer, dst windows inner) so dz/del accumulate over
the inner sweep with consecutive output revisits, while the dst-side
grad der streams out as per-src-block partials summed in XLA.  (The
single-chip kernel instead streams the transposed packing dst-major —
on one chip that buys full-lane dz dots; across the mesh it would cost
a second N^2/8P shard set.)

Layout contract == bitspmd: contiguous dst ranges, ``npp = 32*W`` nodes
per device, features row-sharded ``P(axis)`` padded to ``P*npp``
(``bitspmd.pad_nodes``).  Simple graphs only (multi-edge remainders
cannot ride a softmax) — build the format from a deduplicated edge
list; ``bit_sharded_gat`` checks the remainder is empty.

Reference semantics replaced: DistDGL's sampled attention training
(``python/dgl/distributed/dist_graph.py:519`` + per-partition
SpMM/SDDMM chains); the dense sharded formulation has no reference
counterpart (SURVEY §7.7 — GPUs gather, TPUs stream).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..ops.pallas.bitmm import _interpret, _op_dtype
from ..ops.pallas.bitgat import (_DEN_EPS, _fwd_call, _pick_lanes,
                                 _plane_first_node, _plane_major_node,
                                 _unplane_feat, _unplane_node)
from .bitspmd import BitShardedFormat, build_bit_sharded_format  # noqa: F401 (re-export)

CLIP = 20.0   # same per-operand clip contract as bitgat


# ---------------------------------------------------------------------------
# src-major local backward kernel (grid: src blocks OUTER, dst windows inner)
# ---------------------------------------------------------------------------


def _bwd_src_kernel(pt_ref, elc_ref, erp_ref, livp_ref, rhop_ref,
                    zt_ref, gp_ref, dz_ref, del_ref, der_ref,
                    dz_acc, del_acc, *, heads, slope, nd):
    """Per (src-block s, dst-window d) tile: recompute alpha flash-style,
    emit dz/del (src side, accumulated over the inner d sweep) and der
    (dst side, per-s partials).  Discipline per the bitgat/bitdot
    measurements: heads outer, 16-plane group fori_loop, row-layout
    score operands hoisted once per head via an MXU I_D rotation."""
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        dz_acc[...] = jnp.zeros_like(dz_acc)
        del_acc[...] = jnp.zeros_like(del_acc)

    p = pt_ref[...]                              # (BS, bwd) int32
    bs, bwd = p.shape
    d_ = zt_ref.shape[1]
    eye = jnp.eye(d_, dtype=zt_ref.dtype)
    zeros = jnp.zeros((bs, bwd), jnp.float32)
    for h in range(heads):
        elb = elc_ref[:, h:h + 1] + zeros        # (BS, bwd) broadcast
        zrow = jax.lax.dot_general(               # (BS, D) hoisted
            zt_ref[h], eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(zt_ref.dtype)

        def plane(b):
            mask = (p & jnp.left_shift(jnp.int32(1), b)) != 0
            raw = elb + erp_ref[b, h:h + 1, :]
            sc = jnp.maximum(raw, slope * raw)
            alpha = (jnp.where(mask, jnp.exp(sc), 0.0)
                     * livp_ref[b, h:h + 1, :])
            # u_ij = g_j . z_i  (dst j on lanes)
            u = jax.lax.dot_general(
                zrow, gp_ref[h, b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            de = alpha * (u - rhop_ref[b, h:h + 1, :])
            draw = jnp.where(raw > 0, de, slope * de)
            # dz_i += sum_j alpha_ij g_j   (contract dst lanes)
            dz_acc[h] += jax.lax.dot_general(
                alpha.astype(gp_ref.dtype), gp_ref[h, b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            del_acc[:, h:h + 1] += jnp.sum(draw, axis=1, keepdims=True)
            der_ref[0, b, h:h + 1, :] = jnp.sum(draw, axis=0,
                                                keepdims=True)

        def plane_group(i, carry):
            for j in range(16):
                plane(i * 16 + j)
            return carry

        jax.lax.fori_loop(0, 2, plane_group, 0)

    @pl.when(d == nd - 1)
    def _():
        # stream dz LANE-MAJOR in the node dim: a (heads, s_pad, D)
        # output pays up to a 128/D lane pad in HBM on the full-length
        # per-device partials that precede the psum_scatter (the
        # round-4 HBM discipline); rotate (bs, D) -> (D, bs) with an
        # MXU I_D dot (Mosaic has no 2D transpose primitive)
        eye_o = jnp.eye(d_, dtype=jnp.float32)
        for h in range(heads):
            dz_ref[h] = jax.lax.dot_general(
                eye_o, dz_acc[h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        del_ref[...] = del_acc[...]


@partial(jax.jit, static_argnames=("slope",))
def _bwd_src_call(pt, elc, erp, livp, rhop, zt, gp, slope):
    s_pad, k32 = pt.shape
    heads, d_, _ = zt.shape
    bs = 512
    # own VMEM accounting (this kernel's buffer set differs from the
    # single-chip forward's): livp/rhop extra plane-major inputs
    # (double-buffered), the (heads, D, bs) dz out block + scratch,
    # the del out block, and the per-head broadcast hoists
    bwd = _pick_lanes(
        k32, heads, d_, bs,
        extra=lambda w: (2 * 2 * 32 * heads * w * 4
                         + 4 * heads * bs * d_ * 4
                         + 3 * bs * heads * 4 + 2 * bs * w * 4))
    ns = s_pad // bs
    nd = k32 // bwd
    grid = (ns, nd)
    return pl.pallas_call(
        partial(_bwd_src_kernel, heads=heads, slope=slope, nd=nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bwd), lambda s, d: (s, d)),
            pl.BlockSpec((bs, heads), lambda s, d: (s, 0)),
            pl.BlockSpec((32, heads, bwd), lambda s, d: (0, 0, d)),
            pl.BlockSpec((32, heads, bwd), lambda s, d: (0, 0, d)),
            pl.BlockSpec((32, heads, bwd), lambda s, d: (0, 0, d)),
            pl.BlockSpec((heads, d_, bs), lambda s, d: (0, 0, s)),
            pl.BlockSpec((heads, 32, d_, bwd), lambda s, d: (0, 0, 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((heads, d_, bs), lambda s, d: (0, 0, s)),
            pl.BlockSpec((bs, heads), lambda s, d: (s, 0)),
            pl.BlockSpec((1, 32, heads, bwd), lambda s, d: (s, 0, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, d_, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, heads), jnp.float32),
            jax.ShapeDtypeStruct((ns, 32, heads, k32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, bs, d_), jnp.float32),
            pltpu.VMEM((bs, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * s_pad * k32 * 32 * d_ * heads,
            bytes_accessed=s_pad * k32 * 4 + s_pad * heads * d_ * 6
            + 32 * k32 * d_ * heads * 2,
            transcendentals=s_pad * k32 * 32 * heads),
        interpret=_interpret(),
    )(pt, elc, erp, livp, rhop, zt, gp)


# ---------------------------------------------------------------------------
# sharded wrapper (shard_map + custom VJP)
# ---------------------------------------------------------------------------


def _local_fwd(shard, el_l, er_l, z_l, *, npp, kp, slope, axis):
    heads, d_ = z_l.shape[1], z_l.shape[2]
    w = npp // 32
    dt = _op_dtype()
    elg = jax.lax.all_gather(el_l, axis, tiled=True)     # (P*npp, H)
    zg = jax.lax.all_gather(z_l, axis, tiled=True)       # (P*npp, H, D)
    elc = elg[:kp].astype(jnp.float32)
    erp = _plane_major_node(er_l, npp)                   # (H, 32, W)
    zt = zg[:kp].astype(dt).transpose(1, 2, 0)           # (H, D, kp)
    out_t, l_t = _fwd_call(shard, elc, erp, zt, slope)
    out = _unplane_feat(out_t, npp)                      # (npp, H, D)
    l = _unplane_node(l_t, npp)                          # (npp, H)
    return out, l


def _scatter_rows(x, nparts, axis):
    """(P*npp, ...) full-length per-device partials -> row-sharded sum."""
    return jax.lax.psum_scatter(x, axis, scatter_dimension=0, tiled=True)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bit_sharded_gat(fmt: BitShardedFormat, el, er, z, mesh,
                    axis: str = "data", negative_slope: float = 0.2):
    """GAT attention + aggregation over the mesh-sharded bitmask.

    ``el``/``er`` (P*npp, H) and ``z`` (P*npp, H, D), all row-sharded
    ``P(axis)`` (pad with ``bitspmd.pad_nodes``); returns the
    (P*npp, H, D) row-sharded softmax-weighted aggregation.
    Differentiable in el/er/z.  Requires a simple graph (empty
    multi-edge remainder) and H*D <= 128."""
    out, _ = _gat_fwd(fmt, el, er, z, mesh, axis, negative_slope)
    return out


def _run_fwd(fmt, el, er, z, mesh, axis, slope):
    npp, kp = fmt.npp, fmt.kp

    def local(sh, el_l, er_l, z_l):
        return _local_fwd(sh[0], el_l, er_l, z_l, npp=npp, kp=kp,
                          slope=slope, axis=axis)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False)
    return fn(fmt.shards, el, er, z)


def _gat_fwd(fmt, el, er, z, mesh, axis, slope):
    # static pytree-aux flag: survives jit tracing (a value check on
    # fmt.rem_w would silently pass when fmt is a jit argument, since
    # remainder arrays always hold >=1 dummy slot)
    if fmt.has_remainder:
        raise ValueError(
            "bit_sharded_gat requires a simple graph (the sharded format "
            "has a multi-edge remainder); deduplicate the edge list")
    el = jnp.clip(el, -CLIP, CLIP)
    er = jnp.clip(er, -CLIP, CLIP)
    out, l = _run_fwd(fmt, el, er, z, mesh, axis, slope)
    return out, (fmt, el, er, z, l, out)


def _gat_bwd(mesh, axis, slope, res, g):
    fmt, el, er, z, l, out = res
    npp, kp, nparts = fmt.npp, fmt.kp, fmt.num_parts
    heads, d_ = z.shape[1], z.shape[2]
    total = nparts * npp

    def local(sh, el_l, er_l, z_l, g_l, out_l, l_l):
        dt = _op_dtype()
        g32 = g_l.astype(jnp.float32)
        rho_l = (g32 * out_l).sum(-1)                    # (npp, H)
        linv_l = 1.0 / jnp.maximum(l_l, _DEN_EPS)
        elg = jax.lax.all_gather(el_l, axis, tiled=True)
        zg = jax.lax.all_gather(z_l, axis, tiled=True)
        elc = elg[:kp].astype(jnp.float32)
        erp = _plane_first_node(er_l, npp)               # (32, H, W)
        livp = _plane_first_node(linv_l, npp)
        rhop = _plane_first_node(rho_l, npp)
        zt = zg[:kp].astype(dt).transpose(1, 2, 0)       # (H, D, kp)
        gp = g32.astype(dt).reshape(32, npp // 32, heads, d_
                                    ).transpose(2, 0, 3, 1)
        dzt, delc, der_part = _bwd_src_call(
            sh[0], elc, erp, livp, rhop, zt, gp, slope)
        # src-side grads: full-length partials -> reduce-scatter to
        # rows.  dz stays LANE-MAJOR (H, D, total) through the scatter
        # — the (total, H, D) mirror pays a 128/D lane pad in HBM on
        # the full-length partials; transpose only the npp-row result.
        dz_full = jnp.zeros((heads, d_, total), jnp.float32)
        dz_full = dz_full.at[:, :, :kp].set(dzt)
        del_full = jnp.zeros((total, heads), jnp.float32)
        del_full = del_full.at[:kp].set(delc)
        dz_l = jax.lax.psum_scatter(
            dz_full, axis, scatter_dimension=2,
            tiled=True).transpose(2, 0, 1)               # (npp, H, D)
        del_l = _scatter_rows(del_full, nparts, axis)    # (npp, H)
        # dst-side grad: local sum over the src-block partials
        # der_part (ns, 32, H, W): plane-major node id = b * W + w
        der_sum = der_part.sum(0)                        # (32, H, W)
        der_l = der_sum.transpose(0, 2, 1).reshape(npp, heads)
        return dz_l, del_l, der_l

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)
    dz, dl, dr = fn(fmt.shards, el, er, z, g, out, l)
    # clip VJP on el/er: zero the saturated entries
    dl = jnp.where((el > -CLIP) & (el < CLIP), dl, 0.0).astype(el.dtype)
    dr = jnp.where((er > -CLIP) & (er < CLIP), dr, 0.0).astype(er.dtype)
    return (None, dl, dr, dz.astype(z.dtype))


bit_sharded_gat.defvjp(
    lambda fmt, el, er, z, mesh, axis, slope: _gat_fwd(
        fmt, el, er, z, mesh, axis, slope),
    _gat_bwd)
