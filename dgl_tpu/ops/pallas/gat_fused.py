"""Fused slot-space GAT attention-aggregation (Pallas TPU).

Why: canonical-order per-edge tensors require 27M-element random
gathers on TPU (measured 0.7-22 s per gather at Reddit scale — there is
no gather hardware).  Here attention NEVER exists in canonical edge
order: scores, exp-weights, and gradients all live in the tiled format's
(B, H, C) slot space, produced and consumed by one-hot MXU contractions;
softmax normalization folds into a node-level divide:

    out[d]  = (sum_e p_e x_src) / den_d,   p_e = exp(clip(lrelu(el+er)))
    den_d   = sum_{e->d} p_e

Forward = 3 kernel passes (scores, denominator, weighted aggregation);
backward = 3 more (ds from the multihead SDDMM identity, del/der
accumulation, dx as a transposed weighted aggregation in forward bucket
order — reverse formats and slot permutations are never needed; src-tile
revisits zero on host-precomputed first-visit flags).

Numerics: scores clipped to ±40 before exp (replaces the max-subtraction
stabilizer; attention logits after leaky_relu live far inside this
range), bf16 MXU contractions with f32 accumulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiled_spmm import TiledFormat, _head_onehot

CLIP = 40.0


def _onehots(sl_ref, dl_ref, T):
    n_chunks = sl_ref.shape[1]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 0)
    s_parts, d_parts = [], []
    for ci in range(n_chunks):
        s_parts.append((sl_ref[0, ci][None, :] == iota_t
                        ).astype(jnp.bfloat16))
        d_parts.append((dl_ref[0, ci][None, :] == iota_t
                        ).astype(jnp.bfloat16))
    return jnp.concatenate(s_parts, 1), jnp.concatenate(d_parts, 1)


def _valid_row(v_ref):
    return jnp.concatenate([v_ref[0, ci][None, :]
                            for ci in range(v_ref.shape[1])], 1)  # (1, C)


# ---------------------------------------------------------------------------
# forward


def _scores_kernel(pair_ref, el_ref, er_ref,
                   sl_ref, dl_ref, v_ref, p_ref, g_ref, *, slope):
    # el_ref/er_ref: (H, T) — head-major node blocks (a (T, H) block
    # would pad H to 128 lanes: 32x DMA waste per bucket)
    T = el_ref.shape[1]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    # el_slot / er_slot (H, C): one-hot column of S/D selects the row
    el_s = jax.lax.dot_general(
        el_ref[:].astype(jnp.bfloat16), S_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    er_s = jax.lax.dot_general(
        er_ref[:].astype(jnp.bfloat16), D_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    raw = el_s + er_s
    lrelu = jnp.where(raw >= 0, raw, slope * raw)
    p = jnp.exp(jnp.clip(lrelu, -CLIP, CLIP)) * _valid_row(v_ref)
    p_ref[0] = p
    g_ref[0] = p * jnp.where(raw >= 0, 1.0, slope)   # dp/draw


def _scores_bias_kernel(pair_ref, el_ref, er_ref,
                        sl_ref, dl_ref, v_ref, ee_ref, p_ref, g_ref, *,
                        slope):
    """EGAT scores: raw = el[u] + er[v] + ee_slot (per-slot additive
    edge bias, pre-permuted on the host/jnp side)."""
    T = el_ref.shape[1]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    el_s = jax.lax.dot_general(
        el_ref[:].astype(jnp.bfloat16), S_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    er_s = jax.lax.dot_general(
        er_ref[:].astype(jnp.bfloat16), D_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    raw = el_s + er_s + ee_ref[0]
    lrelu = jnp.where(raw >= 0, raw, slope * raw)
    p = jnp.exp(jnp.clip(lrelu, -CLIP, CLIP)) * _valid_row(v_ref)
    p_ref[0] = p
    g_ref[0] = p * jnp.where(raw >= 0, 1.0, slope)


def _den_kernel(pair_ref, p_ref, sl_ref, dl_ref,
                den_ref):
    b = pl.program_id(1)
    T = den_ref.shape[1]                            # den_ref: (H, T)

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        den_ref[:] = jnp.zeros_like(den_ref)

    _, D_T = _onehots(sl_ref, dl_ref, T)
    den_ref[:] += jax.lax.dot_general(
        p_ref[0].astype(jnp.bfloat16), D_T,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (H, T)


def _agg_kernel(pair_ref, x_ref, sl_ref, dl_ref,
                p_ref, out_ref, *, H, Fh):
    b = pl.program_id(1)
    T = out_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    G = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (C, HF)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    out_ref[:] += jnp.dot(D_T, (G * pfull).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# backward


def _ds_kernel(pair_ref, x_ref, zn_ref, rp_ref,
               sl_ref, dl_ref, g_ref, ds_ref, *, H, Fh):
    T = x_ref.shape[0]                              # x/zn: (T, HF)
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Gx = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    R = _head_onehot(H, Fh, jnp.bfloat16)
    qp = jax.lax.dot_general(R, (Gx * Gz).astype(jnp.bfloat16),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (H, C)
    # rp_ref: (H, T)
    rp_s = jax.lax.dot_general(rp_ref[:].astype(jnp.bfloat16), D_T,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_ref[0] = (qp - rp_s) * g_ref[0]


def _der_kernel(pair_ref, ds_ref, sl_ref, dl_ref, der_ref):
    b = pl.program_id(1)
    T = der_ref.shape[1]                            # der_ref: (H, T)

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        der_ref[:] = jnp.zeros_like(der_ref)

    _, D_T = _onehots(sl_ref, dl_ref, T)
    der_ref[:] += jax.lax.dot_general(
        ds_ref[0].astype(jnp.bfloat16), D_T,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (H, T)


def _del_kernel(pairp_ref, so_ref, ds_ref,
                sl_ref, dl_ref, del_ref):
    # iterated through src_order: src tiles are consecutive
    b = pl.program_id(1)
    T = del_ref.shape[1]                            # del_ref: (H, T)
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        del_ref[:] = jnp.zeros_like(del_ref)

    S_T, _ = _onehots(sl_ref, dl_ref, T)
    del_ref[:] += jax.lax.dot_general(
        ds_ref[0].astype(jnp.bfloat16), S_T,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (H, T)


def _dx_kernel(pairp_ref, so_ref, zn_ref,
               sl_ref, dl_ref, p_ref, dx_ref, *, H, Fh):
    b = pl.program_id(1)
    T = dx_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, HF)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dx_ref[:] += jnp.dot(S_T, (Gz * pfull).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# host-side drivers


def _specs_edge(C):
    return pl.BlockSpec((1, C // 128, 128), lambda j, b, pr: (b, 0, 0))


def _pad_nodes(a, n_pad, H, Fh=None):
    if Fh is None:
        # head-major (H, n_pad): 4-sublane x T-lane blocks DMA exactly
        out = jnp.zeros((H, n_pad), jnp.float32)
        return out.at[:, : a.shape[0]].set(a.astype(jnp.float32).T)
    out = jnp.zeros((n_pad, H, Fh), jnp.bfloat16)
    out = out.at[: a.shape[0], :, : a.shape[2]].set(a.astype(jnp.bfloat16))
    return out.reshape(n_pad, H * Fh)


def _lane_pad(H, Fh):
    lane_goal = max(128, -(-(H * Fh) // 128) * 128)
    Fh_pad = lane_goal // H
    if Fh_pad * H != lane_goal:
        Fh_pad = max(128, -(-Fh // 128) * 128)
    return Fh_pad


def _common(tf):
    T, C, B = tf.tile, tf.cap, tf.num_buckets
    return T, C, B, tf.num_src_tiles * T, tf.num_dst_tiles * T


def _pair(tf):
    """One packed i32 per bucket (dst_tile << 16 | src_tile): halves the
    scalar-prefetch SMEM footprint (1 MiB cap — two (B,) arrays overflow
    at B=131k+, hit at full-Reddit bucket counts)."""
    assert tf.num_dst_tiles < (1 << 15) and tf.num_src_tiles < (1 << 16), \
        "packed tile ids exceed 16 bits (graph over ~33M nodes per side)"
    return (tf.dst_tile.astype(jnp.int32) << 16) | tf.src_tile


def _pair_perm(tf):
    """``_pair`` in src-major bucket order (for the src-accumulating
    backward kernels; pairs ride SMEM pre-permuted so the kernels never
    need the full src_tile table)."""
    return jnp.take(_pair(tf), tf.src_order)


def gat_forward(tf: TiledFormat, el2, er2, x3, H: int, Fh: int,
                slope: float, ee_slot=None):
    """Returns (out (num_dst, H, Fh), p_slot, g_slot, den).

    ``ee_slot`` (B, H, C), optional: per-slot additive edge bias
    (EGAT) — pre-permuted canonical->slot, zeros at padded slots."""
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    elp = _pad_nodes(el2, n_src_pad, H)
    erp = _pad_nodes(er2, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    score_in = [pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] & 0xFFFF)),
                pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                _specs_edge(C), _specs_edge(C), _specs_edge(C)]
    score_args = [elp, erp, tf.src_local, tf.dst_local, tf.valid]
    kern = partial(_scores_kernel, slope=slope)
    if ee_slot is not None:
        score_in.append(pl.BlockSpec((1, H, C),
                                     lambda j, b, pr: (b, 0, 0)))
        score_args.append(ee_slot)
        kern = partial(_scores_bias_kernel, slope=slope)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=score_in,
        out_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                   pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))])
    p_slot, g_slot = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((B, H, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, C), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), *score_args)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)          # (H, n_dst_pad)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, g_slot, den_c


def gat_backward(tf: TiledFormat, x3, p_slot, g_slot, den, out, dZ,
                 H: int, Fh: int):
    """Returns (del (num_src,H), der (num_dst,H), dx (num_src,H,Fh)).

    ``tf.src_order`` must be present (build with ``tf.with_src_first()``
    on the host before tracing)."""
    assert tf.src_order is not None, \
        "call tf.with_src_first() before jit (host-side permutation)"
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    den_t = den.T[: dZ.shape[0]]                            # (nd, H)
    zn = dZ / den_t[:, :, None]                             # (nd, H, Fh)
    rp = (out * dZ).sum(-1) / den_t                         # (nd, H)
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, znp, rpp, tf.src_local, tf.dst_local,
      g_slot)

    # der: natural (dst-monotonic) bucket order
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, pr: (0, pr[b] >> 16)))
    dr = pl.pallas_call(
        _der_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), ds_slot, tf.src_local, tf.dst_local)

    # del / dx: src-major bucket order via so[b] index maps — src-tile
    # output revisits become consecutive (the only safe revisit pattern)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, prp, so: (0, prp[b] & 0xFFFF)))
    dl = pl.pallas_call(
        _del_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_src_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, ds_slot, tf.src_local,
      tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    dx = pl.pallas_call(
        partial(_dx_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, tf.src_local,
      tf.dst_local, p_slot)

    return (dl.T[: tf.num_src], dr.T[: tf.num_dst],
            dx.reshape(n_src_pad, H, Fh_pad)[: tf.num_src, :, :Fh],
            ds_slot)


# ---------------------------------------------------------------------------
# custom_vjp entry


def _primal(tf, el2, er2, x3, H, Fh, slope):
    return gat_forward(tf, el2, er2, x3, H, Fh, slope)[0]


def _fwd(tf, el2, er2, x3, H, Fh, slope):
    out, p, g, den = gat_forward(tf, el2, er2, x3, H, Fh, slope)
    return out, (tf, x3, p, g, den, out)


def _bwd(H, Fh, slope, res, dZ):
    tf, x3, p, g, den, out = res
    dl, dr, dx, _ = gat_backward(tf, x3, p, g, den, out, dZ, H, Fh)
    return (None, dl.astype(jnp.float32), dr.astype(jnp.float32),
            dx.astype(x3.dtype))


gat_attention_aggregate = jax.custom_vjp(_primal, nondiff_argnums=(4, 5, 6))
gat_attention_aggregate.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# EGAT: GAT attention with an additive per-edge bias term in slot space.
# raw = el[u] + er[v] + ee_slot; d(ee_slot) = ds_slot directly (the
# bias enters raw additively), so the VJP reuses gat_backward wholesale.


def _egat_primal(tf, el2, er2, ee_slot, x3, H, Fh, slope):
    return gat_forward(tf, el2, er2, x3, H, Fh, slope,
                       ee_slot=ee_slot)[0]


def _egat_fwd(tf, el2, er2, ee_slot, x3, H, Fh, slope):
    out, p, g, den = gat_forward(tf, el2, er2, x3, H, Fh, slope,
                                 ee_slot=ee_slot)
    return out, (tf, x3, p, g, den, out)


def _egat_bwd(H, Fh, slope, res, dZ):
    tf, x3, p, g, den, out = res
    dl, dr, dx, ds_slot = gat_backward(tf, x3, p, g, den, out, dZ, H,
                                       Fh)
    return (None, dl.astype(jnp.float32), dr.astype(jnp.float32),
            ds_slot, dx.astype(x3.dtype))


egat_attention_aggregate = jax.custom_vjp(_egat_primal,
                                          nondiff_argnums=(5, 6, 7))
egat_attention_aggregate.defvjp(_egat_fwd, _egat_bwd)
egat_attention_aggregate.__doc__ = """Fused EGAT attention + aggregation.

Like gat_attention_aggregate plus ee_slot (B, H, C): a per-slot
additive edge-bias term (canonical->slot permuted, zeros at padding).
Gradients flow to el2/er2/ee_slot/x3."""
gat_attention_aggregate.__doc__ = """Fused GAT attention + aggregation.

Args: tf (TiledFormat, with src_first flags), el2 (N_src, H) src logits,
er2 (N_dst, H) dst logits, x3 (N_src, H, Fh) values, static (H, Fh,
negative_slope).  Returns (N_dst, H, Fh) = softmax-normalized
attention-weighted neighbor sum, with full (del, der, dx) gradients.
"""


# ---------------------------------------------------------------------------
# Fused dot-product attention (DotGatConv): e = <k_src, q_dst>/sqrt(D).
# Entirely composed from the kernels above: the scores pass is the
# multihead SDDMM-dot, ds reuses _ds_kernel with g = p (softmax chain,
# no leaky-relu), dq/dk/dx are the dst-/src-accumulating weighted
# aggregations.

def dot_gat_forward(tf: TiledFormat, q3, k3, x3, H: int, D: int,
                    Fh: int):
    from .tiled_spmm import tiled_sddmm_dot_multihead
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    scale = 1.0 / float(np.sqrt(D))
    e_slot = tiled_sddmm_dot_multihead(tf, k3, q3, H, D) * scale
    valid = tf.valid.reshape(B, 1, C)
    p_slot = jnp.exp(jnp.clip(e_slot, -CLIP, CLIP)) * valid

    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, den_c


def _dot_gat_primal(tf, q3, k3, x3, H, D, Fh):
    return dot_gat_forward(tf, q3, k3, x3, H, D, Fh)[0]


def _dot_gat_fwd(tf, q3, k3, x3, H, D, Fh):
    out, p_slot, den = dot_gat_forward(tf, q3, k3, x3, H, D, Fh)
    return out, (tf, q3, k3, x3, p_slot, den, out)


def _dot_gat_bwd(H, D, Fh, res, dZ):
    tf, q3, k3, x3, p_slot, den, out = res
    assert tf.src_order is not None
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    scale = 1.0 / float(np.sqrt(D))
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    D_pad = _lane_pad(H, D)
    HD = H * D_pad
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)
    qp = _pad_nodes(q3, n_dst_pad, H, D_pad)
    kp = _pad_nodes(k3, n_src_pad, H, D_pad)

    # ds = (q' - rp) * p   (softmax chain; g == p for dot attention)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, znp, rpp, tf.src_local, tf.dst_local,
      p_slot)
    ds_scaled = ds_slot * scale

    # dq[dst] = sum_e ds_e * k_src: dst-accumulating weighted aggregation
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)))
    dq = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=D_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HD), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), kp, tf.src_local, tf.dst_local, ds_scaled)

    # dk[src] = sum_e ds_e * q_dst: src-accumulating (src-major order)
    def _dx_call(node_blocks, weights, out_rows, width):
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1, B),
            in_specs=[pl.BlockSpec(
                (T, width), lambda j, b, prp, so: (prp[b] >> 16, 0)),
                pl.BlockSpec((1, C // 128, 128),
                             lambda j, b, prp, so: (so[b], 0, 0)),
                pl.BlockSpec((1, C // 128, 128),
                             lambda j, b, prp, so: (so[b], 0, 0)),
                pl.BlockSpec((1, H, C),
                             lambda j, b, prp, so: (so[b], 0, 0))],
            out_specs=pl.BlockSpec(
                (T, width), lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
        return pl.pallas_call(
            partial(_dx_kernel, H=H, Fh=width // H),
            out_shape=jax.ShapeDtypeStruct((out_rows, width), jnp.float32),
            grid_spec=grid,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(_pair_perm(tf), tf.src_order, node_blocks,
          tf.src_local, tf.dst_local, weights)

    dk = _dx_call(qp, ds_scaled, n_src_pad, HD)
    dx = _dx_call(znp, p_slot, n_src_pad, HF)

    return (None,
            dq.reshape(n_dst_pad, H, D_pad)[: q3.shape[0], :, :D].astype(
                q3.dtype),
            dk.reshape(n_src_pad, H, D_pad)[: k3.shape[0], :, :D].astype(
                k3.dtype),
            dx.reshape(n_src_pad, H, Fh_pad)[: x3.shape[0], :, :Fh].astype(
                x3.dtype))


dot_gat_attention_aggregate = jax.custom_vjp(_dot_gat_primal,
                                             nondiff_argnums=(4, 5, 6))
dot_gat_attention_aggregate.defvjp(_dot_gat_fwd, _dot_gat_bwd)


# ---------------------------------------------------------------------------
# Fused GATv2: e = a^T lrelu(U_src + V_dst) (vector attention logits).
# Ra is the head-block-diagonal embedding of the attention vector a:
# Ra[h, h*Dp + d] = a[h, d] — so the lane-space reduction e = Ra @ W^T
# and the edge-vector gradient dW = (ds^T Ra) * lrelu'(W_raw) are both
# single matmuls.  Values x (= U in GATv2Conv) aggregate through the
# shared kernels.

def _gatv2_scores_kernel(pair_ref, u_ref, v_ref,
                         ra_ref, sl_ref, dl_ref, vd_ref, p_ref, *, slope):
    T = u_ref.shape[0]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs                                     # (C, HD)
    W = jnp.where(raw >= 0, raw, slope * raw)
    e = jax.lax.dot_general(ra_ref[:].astype(jnp.bfloat16),
                            W.astype(jnp.bfloat16),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (H, C)
    p_ref[0] = jnp.exp(jnp.clip(e, -CLIP, CLIP)) * _valid_row(vd_ref)


def _gatv2_dv_da_kernel(pair_ref, u_ref, v_ref,
                        ra_ref, ds_ref, sl_ref, dl_ref,
                        dv_ref, da_ref, *, slope):
    b = pl.program_id(1)
    T = u_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    @pl.when(b == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs
    W = jnp.where(raw >= 0, raw, slope * raw)
    ds = ds_ref[0]                                     # (H, C)
    # dW[c, l] = ds[h(l), c] * Ra[h(l), l] * lrelu'(raw[c, l])
    ds_full = jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                  ra_ref[:].astype(jnp.bfloat16),
                                  dimension_numbers=(((0,), (0,)),
                                                     ((), ())),
                                  preferred_element_type=jnp.float32)
    dW = ds_full * jnp.where(raw >= 0, 1.0, slope)     # (C, HD)
    dv_ref[:] += jnp.dot(D_T, dW.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    # da accumulates ds @ W over every bucket (single (H, HD) block)
    da_ref[:] += jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                     W.astype(jnp.bfloat16),
                                     dimension_numbers=(((1,), (0,)),
                                                        ((), ())),
                                     preferred_element_type=jnp.float32)


def _gatv2_du_kernel(pairp_ref, so_ref, u_ref,
                     v_ref, ra_ref, ds_ref, sl_ref, dl_ref, du_ref, *,
                     slope):
    b = pl.program_id(1)
    T = u_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs
    ds_full = jax.lax.dot_general(ds_ref[0].astype(jnp.bfloat16),
                                  ra_ref[:].astype(jnp.bfloat16),
                                  dimension_numbers=(((0,), (0,)),
                                                     ((), ())),
                                  preferred_element_type=jnp.float32)
    dW = ds_full * jnp.where(raw >= 0, 1.0, slope)
    du_ref[:] += jnp.dot(S_T, dW.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def gatv2_forward(tf: TiledFormat, U3, V3, x3, attn, H: int, D: int,
                  Fh: int, slope: float):
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, D)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    up = _pad_nodes(U3, n_src_pad, H, D_pad)
    vp = _pad_nodes(V3, n_dst_pad, H, D_pad)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)
    Ra = jnp.zeros((H, HD), jnp.float32)
    Ra = Ra.at[:, : H * D_pad].set(
        jax.vmap(lambda h: jnp.zeros((HD,)).at[
            h * D_pad + jnp.arange(D)].set(attn[h]))(jnp.arange(H)))

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  _specs_edge(C), _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    p_slot = pl.pallas_call(
        partial(_gatv2_scores_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, tf.src_local, tf.dst_local,
      tf.valid)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, den_c, Ra, up, vp, xp


def _gatv2_primal(tf, U3, V3, x3, attn, H, D, Fh, slope):
    return gatv2_forward(tf, U3, V3, x3, attn, H, D, Fh, slope)[0]


def _gatv2_fwd(tf, U3, V3, x3, attn, H, D, Fh, slope):
    out, p_slot, den, Ra, up, vp, xp = gatv2_forward(
        tf, U3, V3, x3, attn, H, D, Fh, slope)
    return out, (tf, p_slot, den, Ra, up, vp, xp, out,
                 U3.shape[0], V3.shape[0], x3.shape[0])


def _gatv2_bwd(H, D, Fh, slope, res, dZ):
    (tf, p_slot, den, Ra, up, vp, xp, out, n_u, n_v, n_x) = res
    assert tf.src_order is not None
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, D)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)

    # ds = (q' - rp) * p  (softmax chain, g = p)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, znp, rpp, tf.src_local, tf.dst_local,
      p_slot)

    # dV + da (natural order), dU (src-major order)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                   pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0))])
    dv, da_full = pl.pallas_call(
        partial(_gatv2_dv_da_kernel, slope=slope),
        out_shape=[jax.ShapeDtypeStruct((n_dst_pad, HD), jnp.float32),
                   jax.ShapeDtypeStruct((H, HD), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, ds_slot, tf.src_local,
      tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, prp, so: (0, 0)),
                  pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    du = pl.pallas_call(
        partial(_gatv2_du_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HD), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, up, vp, Ra, ds_slot,
      tf.src_local, tf.dst_local)

    # dx: src-accumulating weighted aggregation with weights p
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    dx = pl.pallas_call(
        partial(_dx_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, tf.src_local,
      tf.dst_local, p_slot)

    dU = du.reshape(n_src_pad, H, D_pad)[: n_u, :, :D]
    dV = dv.reshape(n_dst_pad, H, D_pad)[: n_v, :, :D]
    dX = dx.reshape(n_src_pad, H, Fh_pad)[: n_x, :, :Fh]
    # da: extract each head's diagonal block from (H, HD)
    da = jnp.stack([da_full[h, h * D_pad: h * D_pad + D]
                    for h in range(H)], 0)
    return (None, dU, dV, dX, da)


gatv2_attention_aggregate = jax.custom_vjp(_gatv2_primal,
                                           nondiff_argnums=(5, 6, 7, 8))
gatv2_attention_aggregate.defvjp(_gatv2_fwd, _gatv2_bwd)


# ---------------------------------------------------------------------------
# Fused EGATConv: e = a_h . lrelu(FNI[u] + FNJ[v] + FE_e)  (reference
# ``nn/pytorch/conv/egatconv.py:217-260``).  Identical shape to GATv2
# except the additive per-edge term FE, which lives in SLOT space
# (B, C, H*De) — pre-permuted ONCE from canonical order (or computed
# directly in slot order by applying fc_fij to slot-permuted raw edge
# features), so the 23M-row random gathers of the chunked path never
# happen.  Backward emits dFE directly in slot space (bf16), and dFNI
# reads it back in src-major order instead of recomputing the logits.


def _egatc_scores_kernel(pair_ref, u_ref, v_ref,
                         ra_ref, fe_ref, sl_ref, dl_ref, vd_ref, p_ref, *,
                         slope):
    T = u_ref.shape[0]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs + fe_ref[0].astype(jnp.float32)      # (C, HD)
    W = jnp.where(raw >= 0, raw, slope * raw)
    e = jax.lax.dot_general(ra_ref[:].astype(jnp.bfloat16),
                            W.astype(jnp.bfloat16),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (H, C)
    p_ref[0] = jnp.exp(jnp.clip(e, -CLIP, CLIP)) * _valid_row(vd_ref)


def _egatc_dv_da_dfe_kernel(pair_ref, u_ref, v_ref,
                            ra_ref, fe_ref, ds_ref, sl_ref, dl_ref,
                            dv_ref, da_ref, dfe_ref, *, slope):
    b = pl.program_id(1)
    T = u_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    @pl.when(b == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs + fe_ref[0].astype(jnp.float32)
    W = jnp.where(raw >= 0, raw, slope * raw)
    ds = ds_ref[0]                                     # (H, C)
    ds_full = jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                  ra_ref[:].astype(jnp.bfloat16),
                                  dimension_numbers=(((0,), (0,)),
                                                     ((), ())),
                                  preferred_element_type=jnp.float32)
    dW = ds_full * jnp.where(raw >= 0, 1.0, slope)     # (C, HD)
    dfe_ref[0] = dW.astype(dfe_ref.dtype)
    dv_ref[:] += jnp.dot(D_T, dW.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    da_ref[:] += jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                     W.astype(jnp.bfloat16),
                                     dimension_numbers=(((1,), (0,)),
                                                        ((), ())),
                                     preferred_element_type=jnp.float32)


def _dw_src_kernel(pairp_ref, so_ref, dw_ref,
                   sl_ref, dl_ref, du_ref):
    """du[src] += S_T @ dW (slot-space block), src-major bucket order."""
    b = pl.program_id(1)
    T = du_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    S_T, _ = _onehots(sl_ref, dl_ref, T)
    du_ref[:] += jnp.dot(S_T, dw_ref[0].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def slot_edge_tensor(tf: TiledFormat, efeat_flat, width: int,
                     host: bool = True):
    """Permute a canonical (E, width) edge tensor into (B, C, width) slot
    layout.  With ``host=True`` the permutation runs in numpy (sequential
    memcpy speed) — do this ONCE at setup; the on-device jnp.take variant
    is a 23M-row random gather (seconds at Reddit scale)."""
    B, C = tf.num_buckets, tf.cap
    eid = np.asarray(tf.eid).reshape(-1)
    if host:
        ef = np.asarray(efeat_flat)
        out = np.zeros((B * C, width), ef.dtype)
        m = eid >= 0
        out[np.nonzero(m)[0]] = ef[eid[m]]
        return jnp.asarray(out.reshape(B, C, width))
    idx = jnp.maximum(jnp.asarray(eid), 0)
    out = jnp.take(jnp.asarray(efeat_flat), idx, axis=0)
    out = out * (jnp.asarray(eid) >= 0)[:, None].astype(out.dtype)
    return out.reshape(B, C, width)


def unslot_edge_tensor(tf: TiledFormat, slot_tensor):
    """Scatter a (B, C, width) slot tensor back to canonical (E, width)
    order (device scatter; only use when canonical order is demanded)."""
    B, C, width = slot_tensor.shape
    eid = np.asarray(tf.eid).reshape(-1)
    m = eid >= 0
    E = int(eid.max()) + 1
    out = jnp.zeros((E, width), slot_tensor.dtype)
    return out.at[jnp.asarray(eid[m])].set(
        slot_tensor.reshape(B * C, width)[jnp.asarray(np.nonzero(m)[0])])


def egatc_forward(tf: TiledFormat, fni3, fnj3, fe_slot, attn, x3, H: int,
                  De: int, Fh: int, slope: float):
    """Returns (out (num_dst, H, Fh), p_slot, den, Ra, up, vp, xp)."""
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, De)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    up = _pad_nodes(fni3, n_src_pad, H, D_pad)
    vp = _pad_nodes(fnj3, n_dst_pad, H, D_pad)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)
    Ra = jnp.zeros((H, HD), jnp.float32)
    Ra = Ra.at[:, : H * D_pad].set(
        jax.vmap(lambda h: jnp.zeros((HD,)).at[
            h * D_pad + jnp.arange(De)].set(attn[h]))(jnp.arange(H)))

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, C, HD), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    p_slot = pl.pallas_call(
        partial(_egatc_scores_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, fe_slot, tf.src_local,
      tf.dst_local, tf.valid)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, den_c, Ra, up, vp, xp


def _egatc_primal(tf, fni3, fnj3, fe_slot, attn, x3, H, De, Fh, slope):
    return egatc_forward(tf, fni3, fnj3, fe_slot, attn, x3, H, De, Fh,
                         slope)[0]


def _egatc_fwd(tf, fni3, fnj3, fe_slot, attn, x3, H, De, Fh, slope):
    out, p_slot, den, Ra, up, vp, xp = egatc_forward(
        tf, fni3, fnj3, fe_slot, attn, x3, H, De, Fh, slope)
    return out, (tf, p_slot, den, Ra, up, vp, xp, fe_slot, out,
                 fni3.shape[0], fnj3.shape[0], x3.shape[0])


def _egatc_bwd(H, De, Fh, slope, res, dZ):
    (tf, p_slot, den, Ra, up, vp, xp, fe_slot, out, n_u, n_v,
     n_x) = res
    assert tf.src_order is not None
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, De)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, znp, rpp, tf.src_local, tf.dst_local,
      p_slot)

    # dFNJ + dattn + dFE in one dst-major pass; dFE stays bf16 in slot
    # space (13.7 GB would not fit in f32 at Reddit scale)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, C, HD), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                   pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                   pl.BlockSpec((1, C, HD),
                                lambda j, b, pr: (b, 0, 0))])
    dv, da_full, dfe_slot = pl.pallas_call(
        partial(_egatc_dv_da_dfe_kernel, slope=slope),
        out_shape=[jax.ShapeDtypeStruct((n_dst_pad, HD), jnp.float32),
                   jax.ShapeDtypeStruct((H, HD), jnp.float32),
                   jax.ShapeDtypeStruct((B, C, HD), jnp.bfloat16)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, fe_slot, ds_slot,
      tf.src_local, tf.dst_local)

    # dFNI: src-major read of the just-written dFE block
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((1, C, HD),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    du = pl.pallas_call(
        _dw_src_kernel,
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HD), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, dfe_slot, tf.src_local,
      tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    dx = pl.pallas_call(
        partial(_dx_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, tf.src_local,
      tf.dst_local, p_slot)

    dFNI = du.reshape(n_src_pad, H, D_pad)[: n_u, :, :De]
    dFNJ = dv.reshape(n_dst_pad, H, D_pad)[: n_v, :, :De]
    dX = dx.reshape(n_src_pad, H, Fh_pad)[: n_x, :, :Fh]
    da = jnp.stack([da_full[h, h * D_pad: h * D_pad + De]
                    for h in range(H)], 0)
    return (None, dFNI, dFNJ, dfe_slot.astype(fe_slot.dtype), da, dX)


egatconv_attention_aggregate = jax.custom_vjp(_egatc_primal,
                                              nondiff_argnums=(6, 7, 8, 9))
egatconv_attention_aggregate.defvjp(_egatc_fwd, _egatc_bwd)
egatconv_attention_aggregate.__doc__ = """Fused EGATConv attention +
aggregation: e = attn_h . lrelu(FNI[u] + FNJ[v] + FE_e), out[d] =
softmax-weighted sum of x[src].  FE rides in slot space (B, C, H*De_pad)
— build it with ``slot_edge_tensor`` once, or apply fc_fij to
slot-permuted edge features.  Gradients: dFNI, dFNJ, dFE(slot, bf16),
dattn, dx.  Ref: nn/pytorch/conv/egatconv.py:217-260."""


# ---------------------------------------------------------------------------
# Fused EdgeGATConv: logits raw = el[u] + er[v] + ee_e (lrelu AFTER the
# additive sum — reference ``nn/pytorch/conv/edgegatconv.py``), message
# m_e = x[src_e] + fe_e where fe_e = W_e f_e is the per-edge message
# term.  fe rides SLOT space (B, C, H*Fh_pad) bf16 like EGATConv's FE;
# ee_slot (B, H, C) is its attn_edge contraction (computed outside in
# jnp — both derive from the same slot-resident fc_edge output, so the
# random canonical-order gathers of the chunked path never happen).
# Backward: d(ee) = ds (additive bias), dfe = p * zn[dst] emitted in the
# SAME src-major pass as dx (they share D_T^T @ zn).


def _agg_fe_kernel(pair_ref, x_ref, fe_ref, sl_ref,
                   dl_ref, p_ref, out_ref, *, H, Fh):
    b = pl.program_id(1)
    T = out_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    G = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (C, HF)
    G = G + fe_ref[0].astype(jnp.float32)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    out_ref[:] += jnp.dot(D_T, (G * pfull).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


def _ds_fe_kernel(pair_ref, x_ref, fe_ref, zn_ref,
                  rp_ref, sl_ref, dl_ref, g_ref, ds_ref, *, H, Fh):
    T = x_ref.shape[0]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Gx = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Gx = Gx + fe_ref[0].astype(jnp.float32)
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    R = _head_onehot(H, Fh, jnp.bfloat16)
    qp = jax.lax.dot_general(R, (Gx * Gz).astype(jnp.bfloat16),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (H, C)
    rp_s = jax.lax.dot_general(rp_ref[:].astype(jnp.bfloat16), D_T,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds_ref[0] = (qp - rp_s) * g_ref[0]


def _dx_dfe_kernel(pairp_ref, so_ref, zn_ref,
                   sl_ref, dl_ref, p_ref, dx_ref, dfe_ref, *, H, Fh):
    b = pl.program_id(1)
    T = dx_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (C, HF)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    W = Gz * pfull
    dfe_ref[0] = W.astype(dfe_ref.dtype)
    dx_ref[:] += jnp.dot(S_T, W.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def edgegat_forward(tf: TiledFormat, el2, er2, ee_slot, fe_slot, x3,
                    H: int, Fh: int, slope: float):
    """Returns (out (num_dst, H, Fh), p_slot, g_slot, den)."""
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    elp = _pad_nodes(el2, n_src_pad, H)
    erp = _pad_nodes(er2, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] & 0xFFFF)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                   pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))])
    p_slot, g_slot = pl.pallas_call(
        partial(_scores_bias_kernel, slope=slope),
        out_shape=[jax.ShapeDtypeStruct((B, H, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, C), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), elp, erp, tf.src_local, tf.dst_local,
      tf.valid, ee_slot)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((1, C, HF), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_fe_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, fe_slot, tf.src_local, tf.dst_local,
      p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, g_slot, den_c


def edgegat_backward(tf: TiledFormat, x3, fe_slot, p_slot, g_slot, den,
                     out, dZ, H: int, Fh: int):
    """Returns (del, der, ds_slot(=dee), dfe_slot(bf16), dx)."""
    assert tf.src_order is not None, \
        "call tf.with_src_first() before jit (host-side permutation)"
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((1, C, HF), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_fe_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, fe_slot, znp, rpp, tf.src_local,
      tf.dst_local, g_slot)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, pr: (0, pr[b] >> 16)))
    dr = pl.pallas_call(
        _der_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), ds_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, prp, so: (0, prp[b] & 0xFFFF)))
    dl = pl.pallas_call(
        _del_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_src_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, ds_slot, tf.src_local,
      tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=[pl.BlockSpec((T, HF),
                                lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)),
                   pl.BlockSpec((1, C, HF),
                                lambda j, b, prp, so: (so[b], 0, 0))])
    dx, dfe_slot = pl.pallas_call(
        partial(_dx_dfe_kernel, H=H, Fh=Fh_pad),
        out_shape=[jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
                   jax.ShapeDtypeStruct((B, C, HF), jnp.bfloat16)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, tf.src_local,
      tf.dst_local, p_slot)

    return (dl.T[: tf.num_src], dr.T[: tf.num_dst], ds_slot, dfe_slot,
            dx.reshape(n_src_pad, H, Fh_pad)[: x3.shape[0], :, :Fh])


def _edgegat_primal(tf, el2, er2, ee_slot, fe_slot, x3, H, Fh, slope):
    return edgegat_forward(tf, el2, er2, ee_slot, fe_slot, x3, H, Fh,
                           slope)[0]


def _edgegat_fwd(tf, el2, er2, ee_slot, fe_slot, x3, H, Fh, slope):
    out, p_slot, g_slot, den = edgegat_forward(
        tf, el2, er2, ee_slot, fe_slot, x3, H, Fh, slope)
    return out, (tf, x3, fe_slot, p_slot, g_slot, den, out)


def _edgegat_bwd(H, Fh, slope, res, dZ):
    tf, x3, fe_slot, p_slot, g_slot, den, out = res
    dl, dr, ds_slot, dfe_slot, dx = edgegat_backward(
        tf, x3, fe_slot, p_slot, g_slot, den, out, dZ, H, Fh)
    return (None, dl.astype(jnp.float32), dr.astype(jnp.float32),
            ds_slot, dfe_slot.astype(fe_slot.dtype), dx.astype(x3.dtype))


edgegat_attention_aggregate = jax.custom_vjp(_edgegat_primal,
                                             nondiff_argnums=(6, 7, 8))
edgegat_attention_aggregate.defvjp(_edgegat_fwd, _edgegat_bwd)
edgegat_attention_aggregate.__doc__ = """Fused EdgeGATConv attention +
aggregation: raw = el[u] + er[v] + ee_e, p = exp(lrelu(raw)),
out[d] = (sum_e p_e (x[src_e] + fe_e)) / den_d.  ee_slot (B, H, C) and
fe_slot (B, C, H*Fh_pad bf16) ride slot space (build raw edge features
with ``slot_edge_tensor`` once, apply fc_edge per call).  Gradients:
del, der, dee(slot), dfe(slot, bf16), dx.
Ref: nn/pytorch/conv/edgegatconv.py."""


# ---------------------------------------------------------------------------
# EdgeGATConv v2: the edge transform fe = (ef W_e) is computed INSIDE the
# kernels (a (C, Fe)@(Fe, HD) matmul per bucket, ~1.5% of the bucket's
# MXU work) instead of materializing the (B, C, H*Fh_pad) slot tensor —
# 6.35 GB at 23M edges, whose residual + gradient + an XLA layout copy
# made the v1 backward exceed single-chip HBM.  Edge features ride slot
# space TRANSPOSED, (B, Fe_pad, C) bf16 (Fe on sublanes: 850 MB at
# Fe=16), and the attn_edge logit term is the Ra-style head-block
# contraction ee = Ra @ fe^T computed in the scores pass.  Gradients to
# el/er/ef/We/attn/x all flow; dWe and d(attn) accumulate in-kernel
# (one (Fe, HD) / (H, HD) block revisited every grid step, da_full
# pattern).  Ref semantics: nn/pytorch/conv/edgegatconv.py.


def _fe_in_kernel(ef_ref, we_ref):
    """(C, HD) edge-message block: fe = ef^T @ We, computed in VMEM."""
    return jax.lax.dot_general(
        ef_ref[0].astype(jnp.bfloat16), we_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _eg2_scores_kernel(pair_ref, el_ref, er_ref, ef_ref, we_ref, ra_ref,
                       sl_ref, dl_ref, v_ref, p_ref, g_ref, *, slope):
    T = el_ref.shape[1]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    el_s = jax.lax.dot_general(
        el_ref[:].astype(jnp.bfloat16), S_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    er_s = jax.lax.dot_general(
        er_ref[:].astype(jnp.bfloat16), D_T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    fe = _fe_in_kernel(ef_ref, we_ref)                 # (C, HD)
    ee = jax.lax.dot_general(
        ra_ref[:].astype(jnp.bfloat16), fe.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H, C)
    raw = el_s + er_s + ee
    lrelu = jnp.where(raw >= 0, raw, slope * raw)
    p = jnp.exp(jnp.clip(lrelu, -CLIP, CLIP)) * _valid_row(v_ref)
    p_ref[0] = p
    g_ref[0] = p * jnp.where(raw >= 0, 1.0, slope)


def _eg2_agg_kernel(pair_ref, x_ref, ef_ref, we_ref, sl_ref, dl_ref,
                    p_ref, out_ref, *, H, Fh):
    b = pl.program_id(1)
    T = out_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    G = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    G = G + _fe_in_kernel(ef_ref, we_ref)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    out_ref[:] += jnp.dot(D_T, (G * pfull).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)


def _eg2_ds_kernel(pair_ref, x_ref, ef_ref, we_ref, ra_ref, zn_ref,
                   rp_ref, sl_ref, dl_ref, g_ref, ds_ref, da_ref, *,
                   H, Fh):
    """ds = (q' - rp) * g; also accumulates d(attn) = ds @ fe."""
    b = pl.program_id(1)
    T = x_ref.shape[0]

    @pl.when(b == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    fe = _fe_in_kernel(ef_ref, we_ref)
    Gx = jax.lax.dot_general(S_T, x_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + fe
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    R = _head_onehot(H, Fh, jnp.bfloat16)
    qp = jax.lax.dot_general(R, (Gx * Gz).astype(jnp.bfloat16),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rp_s = jax.lax.dot_general(rp_ref[:].astype(jnp.bfloat16), D_T,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    ds = (qp - rp_s) * g_ref[0]
    ds_ref[0] = ds
    da_ref[:] += jax.lax.dot_general(
        ds.astype(jnp.bfloat16), fe.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H, HD)


def _eg2_dx_def_kernel(pairp_ref, so_ref, zn_ref, ef_ref, we_ref,
                       ra_ref, p_ref, ds_ref, sl_ref, dl_ref,
                       dx_ref, def_ref, dwe_ref, *, H, Fh):
    """Src-major pass emitting dx, d(ef) per slot block, and the global
    dWe accumulator.  The per-slot message gradient is
    W = Gz * pfull + D_T^T-scattered ds-bias term?  No: the edge message
    m_e = x_src + fe_e enters out weighted by p_e, so d(fe) shares
    dx's weighted gradient W; the LOGIT path adds ds@Ra through fe:
    dfe = W + ds^T-embedded Ra rows."""
    b = pl.program_id(1)
    T = dx_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    @pl.when(b == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Gz = jax.lax.dot_general(D_T, zn_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    R = _head_onehot(H, Fh, jnp.float32)
    pfull = jax.lax.dot_general(p_ref[0], R,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    W = Gz * pfull                                     # message grad
    dx_ref[:] += jnp.dot(S_T, W.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    # logit-path gradient through fe: ds (H, C) embedded to (C, HD)
    ds_full = jax.lax.dot_general(
        ds_ref[0].astype(jnp.bfloat16), ra_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dW_slot = W + ds_full                              # (C, HD) = dfe
    def_ref[0] = jax.lax.dot_general(
        we_ref[:].astype(jnp.bfloat16), dW_slot.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(def_ref.dtype)
    dwe_ref[:] += jax.lax.dot_general(
        ef_ref[0].astype(jnp.bfloat16), dW_slot.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Fe, HD)


def _eg2_specs(C, Fe_pad, HF, T, H):
    return dict(
        el=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] & 0xFFFF)),
        er=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
        ef=pl.BlockSpec((1, Fe_pad, C), lambda j, b, pr: (b, 0, 0)),
        we=pl.BlockSpec((Fe_pad, HF), lambda j, b, pr: (0, 0)),
        ra=pl.BlockSpec((H, HF), lambda j, b, pr: (0, 0)),
        slot=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
        x_src=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
        x_dst=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
        n_dst=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
        out_dst=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
    )


def edgegat_v2_forward(tf: TiledFormat, el2, er2, ef_t, We_p, Ra, x3,
                       H: int, Fh: int, slope: float):
    """Forward with the in-kernel edge transform.  ``ef_t``:
    (B, Fe_pad, C) bf16 slot-transposed raw edge features; ``We_p``:
    (Fe_pad, H*Fh_pad) edge-transform matrix; ``Ra``: (H, H*Fh_pad)
    head-block embedding of attn_edge."""
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    Fe_pad = ef_t.shape[1]
    elp = _pad_nodes(el2, n_src_pad, H)
    erp = _pad_nodes(er2, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)
    sp = _eg2_specs(C, Fe_pad, HF, T, H)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[sp["el"], sp["er"], sp["ef"], sp["we"], sp["ra"],
                  _specs_edge(C), _specs_edge(C), _specs_edge(C)],
        out_specs=[sp["slot"], sp["slot"]])
    p_slot, g_slot = pl.pallas_call(
        partial(_eg2_scores_kernel, slope=slope),
        out_shape=[jax.ShapeDtypeStruct((B, H, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, C), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), elp, erp, ef_t, We_p, Ra, tf.src_local, tf.dst_local,
      tf.valid)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[sp["slot"], _specs_edge(C), _specs_edge(C)],
        out_specs=sp["n_dst"])
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[sp["x_src"], sp["ef"], sp["we"],
                  _specs_edge(C), _specs_edge(C), sp["slot"]],
        out_specs=sp["out_dst"])
    num = pl.pallas_call(
        partial(_eg2_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, ef_t, We_p, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, g_slot, den_c


def edgegat_v2_backward(tf, ef_t, We_p, Ra, x3, p_slot, g_slot, den,
                        out, dZ, H: int, Fh: int):
    assert tf.src_order is not None
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    Fe_pad = ef_t.shape[1]
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)
    sp = _eg2_specs(C, Fe_pad, HF, T, H)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[sp["x_src"], sp["ef"], sp["we"], sp["ra"],
                  sp["x_dst"], sp["n_dst"],
                  _specs_edge(C), _specs_edge(C), sp["slot"]],
        out_specs=[sp["slot"], sp["ra"]])
    ds_slot, da_full = pl.pallas_call(
        partial(_eg2_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=[jax.ShapeDtypeStruct((B, H, C), jnp.float32),
                   jax.ShapeDtypeStruct((H, HF), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, ef_t, We_p, Ra, znp, rpp, tf.src_local,
      tf.dst_local, g_slot)

    # der (natural order), del (src-major) — shared kernels
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, pr: (0, pr[b] >> 16)))
    dr = pl.pallas_call(
        _der_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), ds_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0)),
                  pl.BlockSpec((1, C // 128, 128),
                               lambda j, b, prp, so: (so[b], 0, 0))],
        out_specs=pl.BlockSpec((H, T),
                               lambda j, b, prp, so: (0,
                                                      prp[b] & 0xFFFF)))
    dl = pl.pallas_call(
        _del_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_src_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, ds_slot, tf.src_local, tf.dst_local)

    # dx + d(ef_t) + dWe in one src-major pass
    so_spec = lambda sh: pl.BlockSpec(
        sh, lambda j, b, prp, so: (so[b], 0, 0))
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  so_spec((1, Fe_pad, C)),
                  pl.BlockSpec((Fe_pad, HF),
                               lambda j, b, prp, so: (0, 0)),
                  pl.BlockSpec((H, HF), lambda j, b, prp, so: (0, 0)),
                  so_spec((1, H, C)), so_spec((1, H, C)),
                  so_spec((1, C // 128, 128)),
                  so_spec((1, C // 128, 128))],
        out_specs=[pl.BlockSpec(
            (T, HF), lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)),
            so_spec((1, Fe_pad, C)),
            pl.BlockSpec((Fe_pad, HF), lambda j, b, prp, so: (0, 0))])
    dx, def_t, dwe = pl.pallas_call(
        partial(_eg2_dx_def_kernel, H=H, Fh=Fh_pad),
        out_shape=[jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
                   jax.ShapeDtypeStruct((B, Fe_pad, C), jnp.bfloat16),
                   jax.ShapeDtypeStruct((Fe_pad, HF), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, ef_t, We_p, Ra, p_slot,
      ds_slot, tf.src_local, tf.dst_local)

    return (dl.T[: tf.num_src], dr.T[: tf.num_dst],
            dx.reshape(n_src_pad, H, Fh_pad)[: tf.num_src, :, :Fh],
            def_t, dwe, da_full)


def _build_ra(attn, H, Fh, Fh_pad):
    HF = H * Fh_pad
    Ra = jnp.zeros((H, HF), jnp.float32)
    return Ra.at[:, : HF].set(
        jax.vmap(lambda h: jnp.zeros((HF,)).at[
            h * Fh_pad + jnp.arange(Fh)].set(attn[h]))(jnp.arange(H)))


def _eg2_primal(tf, el2, er2, ef_t, We_p, attn, x3, H, Fh, slope):
    Fh_pad = _lane_pad(H, Fh)
    Ra = _build_ra(attn, H, Fh, Fh_pad)
    return edgegat_v2_forward(tf, el2, er2, ef_t, We_p, Ra, x3, H, Fh,
                              slope)[0]


def _eg2_fwd(tf, el2, er2, ef_t, We_p, attn, x3, H, Fh, slope):
    Fh_pad = _lane_pad(H, Fh)
    Ra = _build_ra(attn, H, Fh, Fh_pad)
    out, p, g, den = edgegat_v2_forward(tf, el2, er2, ef_t, We_p, Ra,
                                        x3, H, Fh, slope)
    return out, (tf, ef_t, We_p, Ra, x3, p, g, den, out)


def _eg2_bwd(H, Fh, slope, res, dZ):
    tf, ef_t, We_p, Ra, x3, p, g, den, out = res
    dl, dr, dx, def_t, dwe, da_full = edgegat_v2_backward(
        tf, ef_t, We_p, Ra, x3, p, g, den, out, dZ, H, Fh)
    Fh_pad = _lane_pad(H, Fh)
    da = jnp.stack([da_full[h, h * Fh_pad: h * Fh_pad + Fh]
                    for h in range(H)], 0)
    return (None, dl.astype(jnp.float32), dr.astype(jnp.float32),
            def_t.astype(ef_t.dtype), dwe.astype(We_p.dtype), da,
            dx.astype(x3.dtype))


edgegat_attention_aggregate_v2 = jax.custom_vjp(_eg2_primal,
                                                nondiff_argnums=(7, 8, 9))
edgegat_attention_aggregate_v2.defvjp(_eg2_fwd, _eg2_bwd)
edgegat_attention_aggregate_v2.__doc__ = """Fused EdgeGATConv with the
edge transform computed IN-KERNEL: no (B, C, H*Fh_pad) tensor ever
exists in HBM (the v1 limit at 23M x 128).  Args: tf, el2 (N,H),
er2 (N,H), ef_t (B, Fe_pad, C) bf16 slot-transposed raw edge features,
We_p (Fe_pad, H*Fh_pad) edge-transform matrix, attn (H, Fh) attn_edge,
x3 (N, H, Fh); static (H, Fh, slope).  Gradients flow to all six
differentiable inputs.  Ref: nn/pytorch/conv/edgegatconv.py."""


def slot_edge_tensor_t(tf: TiledFormat, efeat, Fe_pad: int = None):
    """Canonical (E, Fe) edge features -> (B, Fe_pad, C) bf16
    slot-TRANSPOSED layout (Fe on sublanes: 850 MB at Reddit scale
    instead of the 6.8 GB lane-padded form). Host-side sequential copy;
    do once at setup."""
    B, C = tf.num_buckets, tf.cap
    ef = np.asarray(efeat)
    Fe = ef.shape[1]
    if Fe_pad is None:
        Fe_pad = max(16, -(-Fe // 16) * 16)
    eid = np.asarray(tf.eid).reshape(-1)
    out = np.zeros((B * C, Fe_pad), np.float32)
    m = eid >= 0
    out[np.nonzero(m)[0], :Fe] = ef[eid[m]]
    out = out.reshape(B, C, Fe_pad).transpose(0, 2, 1)
    return jnp.asarray(out.astype(jnp.bfloat16))


def pad_We_heads(We, H: int, Fh: int, Fe_pad: int = None):
    """(Fe, H*Fh) edge-transform matrix -> (Fe_pad, H*Fh_pad) with each
    head's columns placed at its padded block (matches the kernels'
    head-major padded lane layout)."""
    Fe = We.shape[0]
    if Fe_pad is None:
        Fe_pad = max(16, -(-Fe // 16) * 16)
    Fh_pad = _lane_pad(H, Fh)
    out = jnp.zeros((Fe_pad, H * Fh_pad), We.dtype)
    w3 = We.reshape(Fe, H, Fh)
    for h in range(H):
        out = out.at[:Fe, h * Fh_pad: h * Fh_pad + Fh].set(w3[:, h])
    return out


# ---------------------------------------------------------------------------
# EGATConv v2: same in-kernel edge-transform treatment.  EGAT's logit is
# e = attn_h . lrelu(FNI[u] + FNJ[v] + FE_e) with FE = fc_fij(ef) + bias;
# the bias rides as an extra all-ones feature row (ef_t[:, Fe, :] = 1,
# Wf_p[Fe, :] = bias), so the kernels share ``_fe_in_kernel``.  raw is
# recomputed in each pass (the gatv2 pattern) — nothing (B, C, H*De)
# ever exists in HBM.


def _egatc2_scores_kernel(pair_ref, u_ref, v_ref, ra_ref, ef_ref,
                          wf_ref, sl_ref, dl_ref, vd_ref, p_ref, *,
                          slope):
    T = u_ref.shape[0]
    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs + _fe_in_kernel(ef_ref, wf_ref)
    W = jnp.where(raw >= 0, raw, slope * raw)
    e = jax.lax.dot_general(ra_ref[:].astype(jnp.bfloat16),
                            W.astype(jnp.bfloat16),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p_ref[0] = jnp.exp(jnp.clip(e, -CLIP, CLIP)) * _valid_row(vd_ref)


def _egatc2_dv_da_kernel(pair_ref, u_ref, v_ref, ra_ref, ef_ref,
                         wf_ref, ds_ref, sl_ref, dl_ref,
                         dv_ref, da_ref, def_ref, dwf_ref, *, slope):
    b = pl.program_id(1)
    T = u_ref.shape[0]

    @pl.when((b == 0) | ((pair_ref[b] >> 16) !=
                         (pair_ref[jnp.maximum(b - 1, 0)] >> 16)))
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    @pl.when(b == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs + _fe_in_kernel(ef_ref, wf_ref)
    W = jnp.where(raw >= 0, raw, slope * raw)
    ds = ds_ref[0]
    ds_full = jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                  ra_ref[:].astype(jnp.bfloat16),
                                  dimension_numbers=(((0,), (0,)),
                                                     ((), ())),
                                  preferred_element_type=jnp.float32)
    dW = ds_full * jnp.where(raw >= 0, 1.0, slope)     # (C, HD) = dFE
    dv_ref[:] += jnp.dot(D_T, dW.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    da_ref[:] += jax.lax.dot_general(ds.astype(jnp.bfloat16),
                                     W.astype(jnp.bfloat16),
                                     dimension_numbers=(((1,), (0,)),
                                                        ((), ())),
                                     preferred_element_type=jnp.float32)
    def_ref[0] = jax.lax.dot_general(
        wf_ref[:].astype(jnp.bfloat16), dW.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(def_ref.dtype)
    dwf_ref[:] += jax.lax.dot_general(
        ef_ref[0].astype(jnp.bfloat16), dW.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _egatc2_du_kernel(pairp_ref, so_ref, u_ref, v_ref, ra_ref, ef_ref,
                      wf_ref, ds_ref, sl_ref, dl_ref, du_ref, *, slope):
    b = pl.program_id(1)
    T = u_ref.shape[0]
    cur = pairp_ref[b] & 0xFFFF
    prev = pairp_ref[jnp.maximum(b - 1, 0)] & 0xFFFF

    @pl.when((b == 0) | (cur != prev))
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    S_T, D_T = _onehots(sl_ref, dl_ref, T)
    Us = jax.lax.dot_general(S_T, u_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    Vs = jax.lax.dot_general(D_T, v_ref[:].astype(jnp.bfloat16),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    raw = Us + Vs + _fe_in_kernel(ef_ref, wf_ref)
    ds_full = jax.lax.dot_general(ds_ref[0].astype(jnp.bfloat16),
                                  ra_ref[:].astype(jnp.bfloat16),
                                  dimension_numbers=(((0,), (0,)),
                                                     ((), ())),
                                  preferred_element_type=jnp.float32)
    dW = ds_full * jnp.where(raw >= 0, 1.0, slope)
    du_ref[:] += jnp.dot(S_T, dW.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)


def egatc2_forward(tf: TiledFormat, fni3, fnj3, ef_t, Wf_p, Ra, x3,
                   H: int, De: int, Fh: int, slope: float):
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, De)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    Fe_pad = ef_t.shape[1]
    up = _pad_nodes(fni3, n_src_pad, H, D_pad)
    vp = _pad_nodes(fnj3, n_dst_pad, H, D_pad)
    xp = _pad_nodes(x3, n_src_pad, H, Fh_pad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD),
                               lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, Fe_pad, C), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((Fe_pad, HD), lambda j, b, pr: (0, 0)),
                  _specs_edge(C), _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    p_slot = pl.pallas_call(
        partial(_egatc2_scores_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, ef_t, Wf_p, tf.src_local, tf.dst_local,
      tf.valid)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)))
    den = pl.pallas_call(
        _den_kernel,
        out_shape=jax.ShapeDtypeStruct((H, n_dst_pad), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), p_slot, tf.src_local, tf.dst_local)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)))
    num = pl.pallas_call(
        partial(_agg_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, tf.src_local, tf.dst_local, p_slot)

    den_c = jnp.maximum(den, 1e-20)
    out = (num.reshape(n_dst_pad, H, Fh_pad)
           / den_c.T[:, :, None])[: tf.num_dst, :, :Fh]
    return out, p_slot, den_c, up, vp, xp


def egatc2_backward(tf, ef_t, Wf_p, Ra, up, vp, xp, p_slot, den, out,
                    dZ, H: int, De: int, Fh: int, slope: float):
    assert tf.src_order is not None
    T, C, B, n_src_pad, n_dst_pad = _common(tf)
    D_pad = _lane_pad(H, De)
    HD = H * D_pad
    Fh_pad = _lane_pad(H, Fh)
    HF = H * Fh_pad
    Fe_pad = ef_t.shape[1]
    den_t = den.T[: dZ.shape[0]]
    zn = dZ / den_t[:, :, None]
    rp = (out * dZ).sum(-1) / den_t
    znp = _pad_nodes(zn, n_dst_pad, H, Fh_pad)
    rpp = _pad_nodes(rp, n_dst_pad, H)

    # softmax-chain ds (g = p): shared _ds_kernel
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HF), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, T), lambda j, b, pr: (0, pr[b] >> 16)),
                  _specs_edge(C), _specs_edge(C),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)))
    ds_slot = pl.pallas_call(
        partial(_ds_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((B, H, C), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), xp, znp, rpp, tf.src_local, tf.dst_local, p_slot)

    # dFNJ + dattn + d(ef) + dWf in one dst-major pass
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD),
                               lambda j, b, pr: (pr[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, Fe_pad, C), lambda j, b, pr: (b, 0, 0)),
                  pl.BlockSpec((Fe_pad, HD), lambda j, b, pr: (0, 0)),
                  pl.BlockSpec((1, H, C), lambda j, b, pr: (b, 0, 0)),
                  _specs_edge(C), _specs_edge(C)],
        out_specs=[pl.BlockSpec((T, HD), lambda j, b, pr: (pr[b] >> 16, 0)),
                   pl.BlockSpec((H, HD), lambda j, b, pr: (0, 0)),
                   pl.BlockSpec((1, Fe_pad, C),
                                lambda j, b, pr: (b, 0, 0)),
                   pl.BlockSpec((Fe_pad, HD), lambda j, b, pr: (0, 0))])
    dv, da_full, def_t, dwf = pl.pallas_call(
        partial(_egatc2_dv_da_kernel, slope=slope),
        out_shape=[jax.ShapeDtypeStruct((n_dst_pad, HD), jnp.float32),
                   jax.ShapeDtypeStruct((H, HD), jnp.float32),
                   jax.ShapeDtypeStruct((B, Fe_pad, C), jnp.bfloat16),
                   jax.ShapeDtypeStruct((Fe_pad, HD), jnp.float32)],
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair(tf), up, vp, Ra, ef_t, Wf_p, ds_slot, tf.src_local,
      tf.dst_local)

    # dFNI (src-major, raw recomputed)
    so_spec = lambda sh: pl.BlockSpec(
        sh, lambda j, b, prp, so: (so[b], 0, 0))
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)),
                  pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  pl.BlockSpec((H, HD), lambda j, b, prp, so: (0, 0)),
                  so_spec((1, Fe_pad, C)),
                  pl.BlockSpec((Fe_pad, HD),
                               lambda j, b, prp, so: (0, 0)),
                  so_spec((1, H, C)),
                  so_spec((1, C // 128, 128)), so_spec((1, C // 128, 128))],
        out_specs=pl.BlockSpec((T, HD),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    du = pl.pallas_call(
        partial(_egatc2_du_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HD), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, up, vp, Ra, ef_t, Wf_p, ds_slot,
      tf.src_local, tf.dst_local)

    # dx: src-major weighted aggregation (shared kernel)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1, B),
        in_specs=[pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] >> 16, 0)),
                  so_spec((1, C // 128, 128)), so_spec((1, C // 128, 128)),
                  so_spec((1, H, C))],
        out_specs=pl.BlockSpec((T, HF),
                               lambda j, b, prp, so: (prp[b] & 0xFFFF, 0)))
    dx = pl.pallas_call(
        partial(_dx_kernel, H=H, Fh=Fh_pad),
        out_shape=jax.ShapeDtypeStruct((n_src_pad, HF), jnp.float32),
        grid_spec=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(_pair_perm(tf), tf.src_order, znp, tf.src_local, tf.dst_local,
      p_slot)

    return du, dv, def_t, dwf, da_full, dx


def _egatc2_primal(tf, fni3, fnj3, ef_t, Wf_p, attn, x3, H, De, Fh,
                   slope):
    D_pad = _lane_pad(H, De)
    Ra = _build_ra(attn, H, De, D_pad)
    return egatc2_forward(tf, fni3, fnj3, ef_t, Wf_p, Ra, x3, H, De,
                          Fh, slope)[0]


def _egatc2_fwd(tf, fni3, fnj3, ef_t, Wf_p, attn, x3, H, De, Fh, slope):
    D_pad = _lane_pad(H, De)
    Ra = _build_ra(attn, H, De, D_pad)
    out, p, den, up, vp, xp = egatc2_forward(
        tf, fni3, fnj3, ef_t, Wf_p, Ra, x3, H, De, Fh, slope)
    return out, (tf, ef_t, Wf_p, Ra, up, vp, xp, p, den, out,
                 fni3.shape[0], fnj3.shape[0], x3.shape[0])


def _egatc2_bwd(H, De, Fh, slope, res, dZ):
    (tf, ef_t, Wf_p, Ra, up, vp, xp, p, den, out, n_u, n_v, n_x) = res
    du, dv, def_t, dwf, da_full, dx = egatc2_backward(
        tf, ef_t, Wf_p, Ra, up, vp, xp, p, den, out, dZ, H, De, Fh,
        slope)
    D_pad = _lane_pad(H, De)
    Fh_pad = _lane_pad(H, Fh)
    da = jnp.stack([da_full[h, h * D_pad: h * D_pad + De]
                    for h in range(H)], 0)
    return (None,
            du.reshape(-1, H, D_pad)[: n_u, :, :De],
            dv.reshape(-1, H, D_pad)[: n_v, :, :De],
            def_t.astype(ef_t.dtype), dwf.astype(Wf_p.dtype), da,
            dx.reshape(-1, H, Fh_pad)[: n_x, :, :Fh])


egatconv_attention_aggregate_v2 = jax.custom_vjp(
    _egatc2_primal, nondiff_argnums=(7, 8, 9, 10))
egatconv_attention_aggregate_v2.defvjp(_egatc2_fwd, _egatc2_bwd)
egatconv_attention_aggregate_v2.__doc__ = """Fused EGATConv with the
edge transform (fc_fij + bias) computed IN-KERNEL from slot-transposed
raw edge features — no (B, C, H*De) tensor in HBM.  The bias rides as
an extra all-ones feature row of ``ef_t`` matched by a bias row of
``Wf_p``.  Gradients to FNI/FNJ/ef/Wf(+bias)/attn/x.
Ref: nn/pytorch/conv/egatconv.py:217-260."""
