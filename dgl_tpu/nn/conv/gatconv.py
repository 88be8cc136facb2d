"""GAT-family attention layers: GATConv, GATv2Conv, DotGatConv, EGATConv.

Reference spec ``python/dgl/nn/pytorch/conv/gatconv.py:14`` (SURVEY App. C):
el/er projections, ``apply_edges(u_add_v)``, leaky_relu, ``edge_softmax``,
attn-drop, weighted aggregate; multi-head via (N, H, D) reshape, not
separate kernels — exactly the layout the TPU wants (H*D padded to lanes).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import function as fn
from ...core import update_all, apply_edges
from ...ops import edge_softmax
from ...utils import expand_as_pair


class GATConv(nn.Module):
    """Numerics contract of the fused slot-space path (gat_fused.py):
    attention logits are clipped to ±40 before exp INSTEAD of per-dst
    max subtraction (softmax is shift-invariant, so results are exact
    while |logit| < 40; beyond that, saturated logits flatten to equal
    weights with zero gradient).  The dense bit-masked path
    (ops/pallas/bitgat.py, selected when the graph's bitmask format is
    built) clips each OPERAND — el and er — to ±20 instead, which
    saturates earlier: e.g. el=30, er=-25 has true logit 5 but computes
    0+(-20)=-20 on that path, so merely building the bitmask format can
    change attention numerics relative to the slot/XLA paths.  Keep
    attention inputs normalized (e.g. LayerNorm upstream) if logits can
    leave these ranges; the XLA fallback path applies exact
    max-subtracted edge_softmax."""
    in_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, edge_weight=None, get_attention=False,
                 *, deterministic: bool = True, _params_only=False):
        H, D = self.num_heads, self.out_feats
        if _params_only:
            # HeteroGraphConv fused dispatch: create this module's params
            # (identical tree to the normal path — fc stays a Dense
            # submodule) and hand them back so the caller can batch R
            # relations' projections into one stacked einsum.
            x = feat[0] if isinstance(feat, tuple) else feat
            fc = nn.Dense(H * D, use_bias=False, name="fc")
            _ = fc(jnp.zeros((1, self.in_feats), x.dtype))
            w = fc.variables["params"]["kernel"]
            al = self.param("attn_l", nn.initializers.glorot_uniform(),
                            (1, H, D), x.dtype)
            ar = self.param("attn_r", nn.initializers.glorot_uniform(),
                            (1, H, D), x.dtype)
            b = (self.param("bias", nn.initializers.zeros, (1, H, D),
                            x.dtype) if self.bias else None)
            return w, al, ar, b
        feat_src, feat_dst = expand_as_pair(feat, graph)
        if self.feat_drop > 0:
            drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
            feat_src = drop(feat_src)
            feat_dst = drop(feat_dst)

        fc = nn.Dense(H * D, use_bias=False, name="fc")
        ft_src = fc(feat_src).reshape(-1, H, D)
        ft_dst = (fc(feat_dst).reshape(-1, H, D)
                  if feat_src is not feat_dst else
                  ft_src[: graph.num_dst_nodes()] if graph.is_block
                  else ft_src)

        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(),
                            (1, H, D), ft_src.dtype)
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(),
                            (1, H, D), ft_src.dtype)

        # TPU scale path: (E, H, 1) edge tensors tile to (8, 128) blocks
        # (32-128x HBM padding, OOM at Reddit scale) — above the tiled
        # threshold run the whole edge chain in flat (E*H,) layout with
        # one Pallas SpMM per head (see ops/edgeflat.py).
        from ...utils import config as _cfg
        unit = graph.unit()
        use_flat = (unit.num_edges >= _cfg.get("pallas_spmm_min_edges")
                    and edge_weight is None and not get_attention
                    and not getattr(unit, "is_sharded", False))
        if use_flat:
            el2 = (ft_src * attn_l).sum(-1)             # (N, H)
            er2 = (ft_dst * attn_r).sum(-1)
            train_drop = self.attn_drop > 0 and not deterministic
            pallas_ok = _cfg.use_pallas()
            # dense bit-masked flash attention when the bitmask format is
            # built (the SpMM headline family; 2.3x over the slot path at
            # Reddit density — see ops/pallas/bitgat.py).  H*D <= 128
            # keeps the (H, 32, D, lanes) accumulators inside VMEM.
            # Attention dropout runs IN-KERNEL (hash-regenerated mask,
            # VERDICT r4 #2) — the reference recipe (attn_drop=0.6,
            # ``examples/pytorch/gat/train.py:24``) stays on this path.
            bits = getattr(unit, "_bits", None)
            use_bitgat = (pallas_ok and bits is not None
                          and bits.rem_src.shape[0] == 0 and H * D <= 128
                          and (not train_drop or H <= 8))
            # fully-fused slot-space attention when the tiled format is
            # available and no attention dropout is active (no in-kernel
            # dropout in the slot family — bitgat is the dropout path)
            from ...ops.pallas import spmm as _pspmm
            tf_fwd = None
            if pallas_ok and not use_bitgat and not train_drop:
                tf_fwd, _ = _pspmm.get_tiled_formats(
                    unit,
                    build_if_missing=_cfg.get("pallas_auto_build_tiled"))
            if use_bitgat:
                from ...ops.pallas.bitgat import bitgat_attention_aggregate
                seed = None
                if train_drop:
                    seed = jax.random.bits(
                        self.make_rng("dropout"), (),
                        jnp.uint32).astype(jnp.int32)
                rst = bitgat_attention_aggregate(
                    bits, el2, er2, ft_src,
                    float(self.negative_slope),
                    attn_drop=float(self.attn_drop) if train_drop
                    else 0.0,
                    dropout_seed=seed).astype(ft_src.dtype)
            elif tf_fwd is not None:
                from ...ops.pallas.gat_fused import gat_attention_aggregate
                rst = gat_attention_aggregate(
                    tf_fwd, el2, er2, ft_src, H, D,
                    float(self.negative_slope))
            else:
                from ...ops.edgeflat import (sddmm_flat, edge_softmax_flat,
                                             spmm_mul_flat)
                e_flat = sddmm_flat(unit, "add", el2, er2)
                e_flat = nn.leaky_relu(
                    e_flat, negative_slope=self.negative_slope)
                a_flat = edge_softmax_flat(unit, e_flat, H)
                if self.attn_drop > 0:
                    a_flat = nn.Dropout(self.attn_drop,
                                        deterministic=deterministic)(
                                            a_flat)
                rst = spmm_mul_flat(unit, ft_src, a_flat, H)
        else:
            el = (ft_src * attn_l).sum(-1, keepdims=True)   # (N, H, 1)
            er = (ft_dst * attn_r).sum(-1, keepdims=True)
            graph.srcdata.update({"ft": ft_src, "el": el})
            graph.dstdata.update({"er": er})
            e = apply_edges(graph, fn.u_add_v("el", "er", "e"))
            e = nn.leaky_relu(e, negative_slope=self.negative_slope)
            a = edge_softmax(graph, e)
            if self.attn_drop > 0:
                a = nn.Dropout(self.attn_drop,
                               deterministic=deterministic)(a)
            if edge_weight is not None:
                a = a * edge_weight.reshape(-1, 1, 1)
            graph.edata["a"] = a
            rst = update_all(graph, fn.u_mul_e("ft", "a", "m"),
                             fn.sum("m", "ft"))["ft"]

        if self.residual:
            res_fc = nn.Dense(H * D, use_bias=False, name="res_fc")
            rst = rst + res_fc(feat_dst).reshape(-1, H, D)
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (1, H, D), rst.dtype)
        if self.activation is not None:
            rst = self.activation(rst)
        if get_attention:
            return rst, a
        return rst


class GATv2Conv(nn.Module):
    """GATv2 (reference ``gatv2conv.py``): attention =
    a^T LeakyReLU(W_l h_u + W_r h_v) — the 'dynamic attention' fix."""
    in_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True
    share_weights: bool = False

    @nn.compact
    def __call__(self, graph, feat, get_attention=False, *,
                 deterministic: bool = True):
        H, D = self.num_heads, self.out_feats
        feat_src, feat_dst = expand_as_pair(feat, graph)
        if self.feat_drop > 0:
            drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
            feat_src = drop(feat_src)
            feat_dst = drop(feat_dst)
        fc_src = nn.Dense(H * D, use_bias=self.bias, name="fc_src")
        if self.share_weights:
            fc_dst = fc_src
        else:
            fc_dst = nn.Dense(H * D, use_bias=self.bias, name="fc_dst")
        ft_src = fc_src(feat_src).reshape(-1, H, D)
        ft_dst = fc_dst(feat_dst).reshape(-1, H, D)
        attn = self.param("attn", nn.initializers.glorot_uniform(),
                          (1, H, D), ft_src.dtype)
        # fused slot-space path at scale (see gat_fused.py): (E, H, D)
        # edge intermediates tile-pad badly and gather poorly
        from ...utils import config as _cfg
        unit = graph.unit()
        use_fused = (unit.num_edges >= _cfg.get("pallas_spmm_min_edges")
                     and _cfg.use_pallas() and not get_attention
                     and (self.attn_drop == 0 or deterministic)
                     and not getattr(unit, "is_sharded", False))
        tf_fwd = None
        if use_fused:
            from ...ops.pallas import spmm as _pspmm
            tf_fwd, _ = _pspmm.get_tiled_formats(
                unit, build_if_missing=_cfg.get("pallas_auto_build_tiled"))
        if tf_fwd is not None:
            from ...ops.pallas.gat_fused import gatv2_attention_aggregate
            rst = gatv2_attention_aggregate(
                tf_fwd, ft_src, ft_dst, ft_src, attn[0], H, D, D,
                float(self.negative_slope))
        else:
            graph.srcdata.update({"el": ft_src, "ft": ft_src})
            graph.dstdata.update({"er": ft_dst})
            e = apply_edges(graph, fn.u_add_v("el", "er", "e"))  # (E,H,D)
            e = nn.leaky_relu(e, negative_slope=self.negative_slope)
            e = (e * attn).sum(-1, keepdims=True)   # (E, H, 1)
            a = edge_softmax(graph, e)
            if self.attn_drop > 0:
                a = nn.Dropout(self.attn_drop,
                               deterministic=deterministic)(a)
            graph.edata["a"] = a
            rst = update_all(graph, fn.u_mul_e("ft", "a", "m"),
                             fn.sum("m", "ft"))["ft"]
        if self.residual:
            res_fc = nn.Dense(H * D, use_bias=False, name="res_fc")
            rst = rst + res_fc(feat_dst).reshape(-1, H, D)
        if self.activation is not None:
            rst = self.activation(rst)
        if get_attention:
            return rst, a
        return rst


class DotGatConv(nn.Module):
    """Dot-product attention conv (reference ``dotgatconv.py``)."""
    in_feats: int
    out_feats: int
    num_heads: int

    @nn.compact
    def __call__(self, graph, feat):
        H, D = self.num_heads, self.out_feats
        feat_src, feat_dst = expand_as_pair(feat, graph)
        ft_src = nn.Dense(H * D, use_bias=False,
                          name="fc_src")(feat_src).reshape(-1, H, D)
        ft_dst = nn.Dense(H * D, use_bias=False,
                          name="fc_dst")(feat_dst).reshape(-1, H, D)
        # fused dot attention at scale: dense bit-masked flash attention
        # when the bitmask format is built (one MXU pass per score tile —
        # see ops/pallas/bitdot.py), else the slot-space path
        # (gat_fused.py).  H*D <= 128 keeps the (H, 32, D, lanes)
        # accumulators inside VMEM; D >= 64 is the measured crossover
        # (score-dot contraction = D: at D=32 the MXU runs at 1/4 depth
        # and the slot path trains faster — full-Reddit numbers in
        # PERF_NOTES round-4 bitdot section).
        from ...utils import config as _cfg
        unit = graph.unit()
        if (unit.num_edges >= _cfg.get("pallas_spmm_min_edges")
                and _cfg.use_pallas()
                and not getattr(unit, "is_sharded", False)):
            bits = getattr(unit, "_bits", None)
            if (bits is not None and bits.rem_src.shape[0] == 0
                    and H * D <= 128 and D >= 64):
                from ...ops.pallas.bitdot import bitdot_attention_aggregate
                return bitdot_attention_aggregate(
                    bits, ft_dst, ft_src).astype(ft_src.dtype)
            from ...ops.pallas import spmm as _pspmm
            tf_fwd, _ = _pspmm.get_tiled_formats(
                unit, build_if_missing=_cfg.get("pallas_auto_build_tiled"))
            if tf_fwd is not None:
                from ...ops.pallas.gat_fused import (
                    dot_gat_attention_aggregate)
                return dot_gat_attention_aggregate(
                    tf_fwd, ft_dst, ft_src, ft_src, H, D, D)
        graph.srcdata.update({"ft": ft_src})
        graph.dstdata.update({"ft_dst": ft_dst})
        e = apply_edges(graph, fn.u_dot_v("ft", "ft_dst", "a"))
        e = e / jnp.sqrt(jnp.asarray(D, e.dtype))
        a = edge_softmax(graph, e)
        graph.edata["sa"] = a
        return update_all(graph, fn.u_mul_e("ft", "sa", "m"),
                          fn.sum("m", "agg_u"))["agg_u"]


def _egat_logits_chunked(f_ni, f_nj, efeats, Wf, bias_vec, attn,
                         row, col, H, De, chunk: int = 1 << 19):
    """Attention logits (E, H) without materializing the (E, H*De)
    edge tensor: lax.map over fixed edge chunks, rematerialized in the
    backward (jax.checkpoint) so scan residuals stay chunk-sized."""
    E = row.shape[0]
    pad = (-E) % chunk
    rp = jnp.concatenate([row, jnp.zeros((pad,), row.dtype)])
    cp = jnp.concatenate([col, jnp.zeros((pad,), col.dtype)])
    ep = jnp.concatenate(
        [efeats, jnp.zeros((pad, efeats.shape[1]), efeats.dtype)])
    n_chunks = (E + pad) // chunk

    @jax.checkpoint
    def body(args):
        r, c, ef = args
        f = (jnp.take(f_ni, r, axis=0) + jnp.take(f_nj, c, axis=0)
             + ef @ Wf)
        if bias_vec is not None:
            f = f + bias_vec
        f = nn.leaky_relu(f)
        # flat (chunk*H,) output: an (E, H) result would tile H up to
        # 128 lanes in HBM (32x padding = OOM at 23M edges)
        return (f.reshape(-1, H, De) * attn).sum(-1).reshape(-1)

    out = jax.lax.map(body, (rp.reshape(n_chunks, chunk),
                             cp.reshape(n_chunks, chunk),
                             ep.reshape(n_chunks, chunk, -1)))
    return out.reshape(-1)[: E * H]                      # flat (E*H,)


class EGATConv(nn.Module):
    """GAT with edge features (reference ``egatconv.py``): attention from
    f(h_u, h_e, h_v); returns new node and edge features.

    TPU scale path: above the tiled-SpMM edge threshold the attention
    logits are computed in fixed edge chunks (never materializing the
    (E, H*De) tensor) and the softmax + aggregation run in flat (E*H,)
    layout (``ops/edgeflat.py``).  The returned edge features are
    themselves (E, H, De)-sized; pass ``compute_edge_feats=False`` at
    scale to skip them (returns ``(h, None)``)."""
    in_node_feats: int
    in_edge_feats: int
    out_node_feats: int
    out_edge_feats: int
    num_heads: int
    bias: bool = True

    @staticmethod
    def slot_edge_feats(graph, efeats):
        """One-time: permute raw edge features into the tiled format's
        slot order (host-side sequential copy).  Pass the result as
        ``efeats_slot=`` to enable the fully fused path."""
        from ...ops.pallas.gat_fused import slot_edge_tensor
        tf = graph.unit().tiled_format()[0]
        return slot_edge_tensor(tf, efeats, efeats.shape[-1])

    @nn.compact
    def __call__(self, graph, nfeats, efeats, get_attention=False,
                 compute_edge_feats=True, efeats_slot=None):
        H = self.num_heads
        Dn, De = self.out_node_feats, self.out_edge_feats
        feat_src, feat_dst = expand_as_pair(nfeats, graph)
        fc_node_src = nn.Dense(H * Dn, use_bias=False, name="fc_node_src")
        fc_ni = nn.Dense(H * De, use_bias=False, name="fc_ni")
        fc_fij = nn.Dense(H * De, use_bias=False, name="fc_fij")
        fc_nj = nn.Dense(H * De, use_bias=False, name="fc_nj")
        f_ni = fc_ni(feat_src)
        f_nj = fc_nj(feat_dst)
        bias_vec = (self.param("bias", nn.initializers.zeros,
                               (H * De,), f_ni.dtype)
                    if self.bias else None)
        attn = self.param("attn", nn.initializers.glorot_uniform(),
                          (1, H, De), f_ni.dtype)

        from ...utils import config as _cfg
        unit = graph.unit()

        # Fully fused slot-space path (ops/pallas/gat_fused.py
        # egatconv_attention_aggregate): logits, softmax, and aggregation
        # never leave the tiled format's slot space — no per-edge random
        # gathers at all.  Needs the tiled format + TPU; edge features are
        # consumed in slot order (pass ``efeats_slot`` precomputed via
        # ``EGATConv.slot_edge_feats`` to avoid the one-off device
        # permute).
        tf = getattr(unit, "_tiled", None)
        use_fused = (tf is not None
                     and unit.num_edges >= _cfg.get(
                         "pallas_spmm_min_edges")
                     and _cfg.use_pallas()
                     and jax.default_backend() == "tpu"
                     and not get_attention and not compute_edge_feats
                     and efeats_slot is not None)
        if use_fused:
            from ...ops.pallas.gat_fused import (
                egatconv_attention_aggregate_v2, pad_We_heads)
            tf = tf.with_src_first()
            B, C = tf.num_buckets, tf.cap
            _ = fc_fij(efeats_slot.reshape(B * C, -1)[:1])  # params
            Wf = fc_fij.variables["params"]["kernel"]       # (Fe, H*De)
            Fe = efeats_slot.shape[-1]
            rows = Fe + (1 if bias_vec is not None else 0)
            Fe_pad = max(16, -(-rows // 16) * 16)
            # slot-TRANSPOSED raw edge features; the edge transform
            # (fc_fij + bias) runs INSIDE the kernels, so nothing
            # (B, C, H*De)-sized exists in HBM.  The bias rides as an
            # all-ones feature row (padded slots are masked by the
            # kernels' validity row, so it never leaks into outputs).
            ef_t = jnp.zeros((B, Fe_pad, C), jnp.bfloat16)
            ef_t = ef_t.at[:, :Fe, :].set(
                jnp.swapaxes(efeats_slot, 1, 2).astype(jnp.bfloat16))
            if bias_vec is not None:
                ef_t = ef_t.at[:, Fe, :].set(1.0)
                Wfull = jnp.concatenate([Wf, bias_vec[None]], axis=0)
            else:
                Wfull = Wf
            Wf_p = pad_We_heads(Wfull, H, De, Fe_pad)
            x3 = fc_node_src(feat_src).reshape(-1, H, Dn)
            h = egatconv_attention_aggregate_v2(
                tf, f_ni.reshape(-1, H, De), f_nj.reshape(-1, H, De),
                ef_t, Wf_p, attn[0], x3, H, De, Dn, 0.01)
            return h, None

        use_flat = (unit.num_edges >= _cfg.get("pallas_spmm_min_edges")
                    and not get_attention
                    and not getattr(unit, "is_sharded", False))
        if use_flat:
            _ = fc_fij(efeats[:1])       # create params
            Wf = fc_fij.variables["params"]["kernel"]
            row, col = unit.coo()
            logits = _egat_logits_chunked(
                f_ni, f_nj, efeats, Wf, bias_vec, attn,
                jnp.asarray(row), jnp.asarray(col), H, De)
            from ...ops.edgeflat import edge_softmax_flat, spmm_mul_flat
            a_flat = edge_softmax_flat(unit, logits, H)
            x3 = fc_node_src(feat_src).reshape(-1, H, Dn)
            h = spmm_mul_flat(unit, x3, a_flat, H)
            f_out = None
            if compute_edge_feats:
                f_tmp = (jnp.take(f_ni, jnp.asarray(row), 0)
                         + jnp.take(f_nj, jnp.asarray(col), 0)
                         + fc_fij(efeats))
                if bias_vec is not None:
                    f_tmp = f_tmp + bias_vec
                f_out = nn.leaky_relu(f_tmp).reshape(-1, H, De)
            return h, f_out

        f_fij = fc_fij(efeats)
        graph.srcdata["f_ni"] = f_ni
        graph.dstdata["f_nj"] = f_nj
        f_tmp = apply_edges(graph, fn.u_add_v("f_ni", "f_nj", "f_tmp"))
        f_out = f_tmp + f_fij
        if bias_vec is not None:
            f_out = f_out + bias_vec
        f_out = nn.leaky_relu(f_out)
        f_out = f_out.reshape(-1, H, De)
        e = (f_out * attn).sum(-1, keepdims=True)
        a = edge_softmax(graph, e)
        graph.srcdata["h_out"] = fc_node_src(feat_src).reshape(-1, H, Dn)
        graph.edata["a"] = a
        h = update_all(graph, fn.u_mul_e("h_out", "a", "m"),
                       fn.sum("m", "h_out"))["h_out"]
        if get_attention:
            return h, f_out, a
        return h, f_out
