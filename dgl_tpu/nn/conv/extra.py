"""Long-tail conv layers: GCN2, GMM (MoNet), EdgeGAT, EGNN, GatedGCN,
HGT, DGN, TWIRLS, AtomicConv, GroupRevRes, Dense{Graph,SAGE,Cheb}Conv.

Reference specs: ``python/dgl/nn/pytorch/conv/{gcn2conv,gmmconv,
edgegatconv,egnnconv,gatedgcnconv,hgtconv,dgnconv,twirlsconv,atomicconv,
grouprevres,densegraphconv,densesageconv,densechebconv}.py``.  Math follows
those files; implementations are jnp + the fused ops layer, with heads and
types vectorized into batched einsums / gather_mm (MXU-friendly) instead of
per-head/per-type Python loops.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import function as fn
from ...core import update_all, apply_edges
from ...ops import edge_softmax, gspmm, gather_mm
from ...utils import expand_as_pair


class GCN2Conv(nn.Module):
    """GCNII (reference ``gcn2conv.py``): initial residual + identity map —
    ``h' = ((1-β)I + βW)((1-α) Â h + α h0)``, β = ln(λ/l + 1)."""
    in_feats: int
    layer: int = 1
    alpha: float = 0.1
    lambda_: float = 1.0
    project_initial_features: bool = True
    allow_zero_in_degree: bool = False
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph, feat, feat_0, edge_weight=None):
        beta = float(np.log(self.lambda_ / self.layer + 1))
        unit = graph.unit()
        deg = jnp.maximum(unit.in_degrees(), 1).astype(feat.dtype)
        norm = deg[:, None] ** -0.5
        h = feat if edge_weight is not None else feat * norm
        graph.srcdata["h"] = h
        if edge_weight is not None:
            graph.edata["_ew"] = edge_weight
            msg = fn.u_mul_e("h", "_ew", "m")
        else:
            msg = fn.copy_u("h", "m")
        h = update_all(graph, msg, fn.sum("m", "h"))["h"]
        if edge_weight is None:
            h = h * norm
        h = h * (1 - self.alpha)
        feat_0 = feat_0[: h.shape[0]] * self.alpha
        feat_sum = h + feat_0
        w1 = self.param("weight1", nn.initializers.glorot_uniform(),
                        (self.in_feats, self.in_feats), feat.dtype)
        if self.project_initial_features:
            proj = feat_sum @ w1
        else:
            w2 = self.param("weight2", nn.initializers.glorot_uniform(),
                            (self.in_feats, self.in_feats), feat.dtype)
            proj = h @ w1 + feat_0 @ w2
        rst = (1 - beta) * feat_sum + beta * proj
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (self.in_feats,), rst.dtype)
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GMMConv(nn.Module):
    """MoNet gaussian-mixture conv (reference ``gmmconv.py``): per-edge
    pseudo-coordinates weighted by K learned gaussians."""
    in_feats: int
    out_feats: int
    dim: int
    n_kernels: int
    aggregator_type: str = "sum"
    residual: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, graph, feat, pseudo):
        feat_src, feat_dst = expand_as_pair(feat, graph)
        K, D = self.n_kernels, self.out_feats
        h = nn.Dense(K * D, use_bias=False, name="fc")(feat_src)
        graph.srcdata["h"] = h.reshape(-1, K, D)
        mu = self.param("mu", nn.initializers.normal(0.1),
                        (K, self.dim), feat_src.dtype)
        inv_sigma = self.param("inv_sigma", nn.initializers.ones,
                               (K, self.dim), feat_src.dtype)
        gaussian = -0.5 * (pseudo[:, None, :] - mu[None]) ** 2
        gaussian = gaussian * (inv_sigma[None] ** 2)
        graph.edata["w"] = jnp.exp(gaussian.sum(-1, keepdims=True))  # E,K,1
        reducer = getattr(fn, self.aggregator_type)
        rst = update_all(graph, fn.u_mul_e("h", "w", "m"),
                         reducer("m", "h"))["h"].sum(1)
        if self.residual:
            rst = rst + nn.Dense(D, use_bias=False,
                                 name="res_fc")(feat_dst)
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (D,), rst.dtype)
        return rst


def _edge_gat_flat(unit, ft_src, edge_feat, We, el2, er2, attn_e, H, D,
                   negative_slope, chunk: int = 1 << 18):
    """EdgeGAT at scale: out[d] = Σ_e a_e ∘ (W h_src(e) + W_e f_e).

    Logits e = lrelu(el[u] + er[v] + (f_e W_e)·attn_e) and the
    edge-message term Σ a_e (f_e W_e) are evaluated by checkpointed
    lax.scan over fixed edge chunks; softmax runs flat; the node-message
    term rides the multihead tiled SpMM."""
    import jax
    from ...ops.edgeflat import edge_softmax_flat, spmm_mul_flat
    row, col = (jnp.asarray(a) for a in unit.coo())
    E = int(row.shape[0])
    pad = (-E) % chunk
    rp = jnp.concatenate([row, jnp.zeros((pad,), row.dtype)])
    cp = jnp.concatenate([col, jnp.zeros((pad,), col.dtype)])
    ep = jnp.concatenate(
        [edge_feat, jnp.zeros((pad, edge_feat.shape[1]),
                              edge_feat.dtype)])
    n_chunks = (E + pad) // chunk
    attn_e2 = attn_e.reshape(H, D)

    @jax.checkpoint
    def logit_chunk(args):
        r, c, ef = args
        fe = (ef @ We).reshape(-1, H, D)
        ee = jnp.einsum("ehd,hd->eh", fe, attn_e2)
        e = jnp.take(el2, r, axis=0) + jnp.take(er2, c, axis=0) + ee
        # flat (chunk*H,): (E, H) HBM tensors tile H up to 128 lanes
        return nn.leaky_relu(e, negative_slope=negative_slope).reshape(-1)

    logits = jax.lax.map(logit_chunk, (rp.reshape(n_chunks, chunk),
                                       cp.reshape(n_chunks, chunk),
                                       ep.reshape(n_chunks, chunk, -1)))
    a_flat = edge_softmax_flat(unit, logits.reshape(-1)[: E * H], H)
    # node-message term: multihead weighted SpMM
    out = spmm_mul_flat(unit, ft_src, a_flat, H)
    # edge-message term: chunked scan accumulating segment-sums by dst;
    # attention rides flat (n_chunks, chunk*H) and reshapes in-chunk
    ap = jnp.concatenate([a_flat, jnp.zeros((pad * H,), a_flat.dtype)])
    num_dst = unit.num_dst

    def body(acc, args):
        c, ef, a = args

        @jax.checkpoint
        def term(c, ef, a):
            fe = (ef @ We).reshape(-1, H, D)
            a2 = a.reshape(-1, H)
            return jax.ops.segment_sum(fe * a2[..., None], c,
                                       num_segments=num_dst)
        return acc + term(c, ef, a), None

    acc0 = jnp.zeros((num_dst, H, D), out.dtype)
    edge_term, _ = jax.lax.scan(
        body, acc0, (cp.reshape(n_chunks, chunk),
                     ep.reshape(n_chunks, chunk, -1),
                     ap.reshape(n_chunks, chunk * H)))
    return out + edge_term


class EdgeGATConv(nn.Module):
    """GAT with edge features in both attention and message (reference
    ``edgegatconv.py``)."""
    in_feats: int
    edge_feats: int
    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = True
    activation: Optional[Callable] = None
    allow_zero_in_degree: bool = False
    bias: bool = True

    @staticmethod
    def slot_edge_feats(graph, efeats):
        """One-time: permute raw edge features into the tiled format's
        slot order (host-side sequential copy).  Pass the result as
        ``efeats_slot=`` to enable the fully fused slot-space path."""
        from ...ops.pallas.gat_fused import slot_edge_tensor
        tf = graph.unit().tiled_format()[0]
        return slot_edge_tensor(tf, efeats, efeats.shape[-1])

    @nn.compact
    def __call__(self, graph, feat, edge_feat, get_attention=False,
                 *, deterministic: bool = True, efeats_slot=None):
        H, D = self.num_heads, self.out_feats
        feat_src, feat_dst = expand_as_pair(feat, graph)
        if self.feat_drop > 0:
            drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
            feat_src, feat_dst = drop(feat_src), drop(feat_dst)
        ft_src = nn.Dense(H * D, use_bias=False,
                          name="fc")(feat_src).reshape(-1, H, D)
        ft_dst = ft_src[: graph.num_dst_nodes()] if graph.is_block else (
            nn.Dense(H * D, use_bias=False, name="fc_dst")(feat_dst)
            .reshape(-1, H, D) if feat_src is not feat_dst else ft_src)
        fc_edge = nn.Dense(H * D, use_bias=False, name="fc_edge")
        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(),
                            (1, H, D), ft_src.dtype)
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(),
                            (1, H, D), ft_src.dtype)
        attn_e = self.param("attn_edge", nn.initializers.glorot_uniform(),
                            (1, H, D), ft_src.dtype)

        # TPU scale path (same design as EGATConv): flat (E*H,) layout,
        # edge-transform, logits, and the edge-message aggregation term
        # processed in fixed chunks — no (E, H, D) tensor materialized.
        from ...utils import config as _cfg
        unit = graph.unit()

        # Fully fused slot-space path (ops/pallas/gat_fused.py
        # edgegat_attention_aggregate): logits, softmax, node + edge
        # message terms never leave slot space — no per-edge random
        # gathers.  Needs the tiled format + TPU and slot-permuted raw
        # edge features (``EdgeGATConv.slot_edge_feats``).
        tf = getattr(unit, "_tiled", None)
        use_fused = (tf is not None and efeats_slot is not None
                     and unit.num_edges >= _cfg.get(
                         "pallas_spmm_min_edges")
                     and _cfg.use_pallas()
                     and jax.default_backend() == "tpu"
                     and not get_attention
                     and (self.attn_drop == 0 or deterministic)
                     and (self.feat_drop == 0 or deterministic))
        if use_fused:
            from ...ops.pallas.gat_fused import (
                edgegat_attention_aggregate_v2, pad_We_heads)
            tf = tf.with_src_first()
            B, C = tf.num_buckets, tf.cap
            _ = fc_edge(efeats_slot.reshape(B * C, -1)[:1])  # params
            We = fc_edge.variables["params"]["kernel"]       # (Fe, H*D)
            Fe = efeats_slot.shape[-1]
            Fe_pad = max(16, -(-Fe // 16) * 16)
            # slot-TRANSPOSED edge features (Fe on sublanes, bf16): the
            # edge transform fe = ef @ We runs INSIDE the kernels, so no
            # (B, C, H*D_pad) tensor ever exists in HBM (the old path's
            # 6.35 GB residual made fwd+bwd exceed HBM at 23M x 128)
            ef_t = jnp.zeros((B, Fe_pad, C), jnp.bfloat16)
            ef_t = ef_t.at[:, :Fe, :].set(
                jnp.swapaxes(efeats_slot, 1, 2).astype(jnp.bfloat16))
            We_p = pad_We_heads(We, H, D, Fe_pad)
            rst = edgegat_attention_aggregate_v2(
                tf, (ft_src * attn_l).sum(-1), (ft_dst * attn_r).sum(-1),
                ef_t, We_p, attn_e[0], ft_src, H, D,
                self.negative_slope)
        elif (unit.num_edges >= _cfg.get("pallas_spmm_min_edges")
                and not get_attention
                and (self.attn_drop == 0 or deterministic)
                and not getattr(unit, "is_sharded", False)):
            _ = fc_edge(edge_feat[:1])        # create params
            We = fc_edge.variables["params"]["kernel"]
            rst = _edge_gat_flat(
                unit, ft_src, edge_feat, We,
                el2=(ft_src * attn_l).sum(-1),
                er2=(ft_dst * attn_r).sum(-1),
                attn_e=attn_e, H=H, D=D,
                negative_slope=self.negative_slope)
        else:
            ft_edge = fc_edge(edge_feat).reshape(-1, H, D)
            el = (ft_src * attn_l).sum(-1, keepdims=True)
            er = (ft_dst * attn_r).sum(-1, keepdims=True)
            ee = (ft_edge * attn_e).sum(-1, keepdims=True)
            graph.srcdata.update({"ft": ft_src, "el": el})
            graph.dstdata.update({"er": er})
            e = apply_edges(graph, fn.u_add_v("el", "er", "e")) + ee
            e = nn.leaky_relu(e, negative_slope=self.negative_slope)
            a = edge_softmax(graph, e)
            if self.attn_drop > 0:
                a = nn.Dropout(self.attn_drop,
                               deterministic=deterministic)(a)
            # message = (Wh_u + We_uv) * a
            graph.edata["ft_edge"] = ft_edge
            ft_comb = apply_edges(graph, fn.u_add_e("ft", "ft_edge", "m"))
            graph.edata["m"] = ft_comb * a
            rst = update_all(graph, fn.copy_e("m", "m"),
                             fn.sum("m", "ft"))["ft"]
        if self.residual:
            rst = rst + nn.Dense(H * D, use_bias=False, name="res_fc")(
                feat_dst).reshape(-1, H, D)
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (1, H, D), rst.dtype)
        if self.activation is not None:
            rst = self.activation(rst)
        if get_attention:
            return rst, a
        return rst


class EGNNConv(nn.Module):
    """E(n)-equivariant conv (reference ``egnnconv.py``): updates node
    features and coordinates; coordinate update uses normalized diffs."""
    in_size: int
    hidden_size: int
    out_size: int
    edge_feat_size: int = 0

    @nn.compact
    def __call__(self, graph, node_feat, coord_feat, edge_feat=None):
        act = jax.nn.silu
        unit = graph.unit()
        row, col = unit.coo()
        x_diff = coord_feat[row] - coord_feat[col]
        radial = (x_diff ** 2).sum(-1, keepdims=True)
        x_diff = x_diff / (jnp.sqrt(radial) + 1e-30)
        parts = [node_feat[row], node_feat[col], radial]
        if self.edge_feat_size > 0:
            assert edge_feat is not None, "Edge features must be provided."
            parts.append(edge_feat)
        f = jnp.concatenate(parts, -1)
        msg_h = act(nn.Dense(self.hidden_size, name="edge_mlp2")(
            act(nn.Dense(self.hidden_size, name="edge_mlp1")(f))))
        coef = nn.Dense(1, use_bias=False, name="coord_mlp2")(
            act(nn.Dense(self.hidden_size, name="coord_mlp1")(msg_h)))
        msg_x = coef * x_diff
        graph.edata["msg_x"] = msg_x
        graph.edata["msg_h"] = msg_h
        x_neigh = update_all(graph, fn.copy_e("msg_x", "m"),
                             fn.mean("m", "x"))["x"]
        h_neigh = update_all(graph, fn.copy_e("msg_h", "m"),
                             fn.sum("m", "h"))["h"]
        h = nn.Dense(self.out_size, name="node_mlp2")(
            act(nn.Dense(self.hidden_size, name="node_mlp1")(
                jnp.concatenate([node_feat, h_neigh], -1))))
        x = coord_feat + x_neigh
        return h, x


class GatedGCNConv(nn.Module):
    """Gated GCN (reference ``gatedgcnconv.py``): edge-gated aggregation
    with updated edge features, residuals, and normalization."""
    input_feats: int
    edge_feats: int
    output_feats: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, graph, feat, edge_feat, *,
                 deterministic: bool = True):
        h_in, e_in = feat, edge_feat
        O = self.output_feats
        graph.srcdata["Bh"] = nn.Dense(O, name="B")(feat)
        graph.srcdata["Dh"] = nn.Dense(O, name="D")(feat)
        graph.dstdata["Eh"] = nn.Dense(O, name="E")(feat)
        Ah = nn.Dense(O, name="A")(feat)
        Ce = nn.Dense(O, name="C")(edge_feat)
        e = apply_edges(graph, fn.u_add_v("Dh", "Eh", "DEh")) + Ce
        sigma = jax.nn.sigmoid(e)
        graph.edata["sigma"] = sigma
        num = update_all(graph, fn.u_mul_e("Bh", "sigma", "m"),
                         fn.sum("m", "s"))["s"]
        den = update_all(graph, fn.copy_e("sigma", "m"),
                         fn.sum("m", "s"))["s"]
        h = Ah + num / (den + 1e-6)
        if self.batch_norm:
            h = nn.LayerNorm(name="norm_h")(h)
            e = nn.LayerNorm(name="norm_e")(e)
        h = self.activation(h)
        e = self.activation(e)
        if self.residual and h_in.shape[-1] == O:
            h = h_in + h
        if self.residual and e_in.shape[-1] == O:
            e = e_in + e
        if self.dropout > 0:
            drop = nn.Dropout(self.dropout, deterministic=deterministic)
            h, e = drop(h), drop(e)
        return h, e


class HGTConv(nn.Module):
    """Heterogeneous Graph Transformer (reference ``hgtconv.py``): typed
    K/Q/V projections, per-(head, etype) relation matrices + priors, edge
    softmax, typed output projection with gated residual.  Heads × etypes
    are flattened into one ``gather_mm`` grouped GEMM per projection."""
    in_size: int
    head_size: int
    num_heads: int
    num_ntypes: int
    num_etypes: int
    dropout: float = 0.2
    use_norm: bool = False

    @nn.compact
    def __call__(self, g, x, ntype, etype, *, presorted: bool = False,
                 deterministic: bool = True):
        from ..linear import TypedLinear
        H, D = self.num_heads, self.head_size
        sqrt_d = float(np.sqrt(D))
        if g.is_block:
            x_src, srcntype = x, ntype
            x_dst, dstntype = x[: g.num_dst_nodes()], ntype[
                : g.num_dst_nodes()]
        else:
            x_src = x_dst = x
            srcntype = dstntype = ntype
        k = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_k")(x_src, srcntype).reshape(-1, H, D)
        q = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_q")(x_dst, dstntype).reshape(-1, H, D)
        v = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_v")(x_src, srcntype).reshape(-1, H, D)
        unit = g.unit()
        etype = jnp.asarray(etype, jnp.int32)
        # per-(etype, head) relation weights, applied as one grouped GEMM
        # over the flattened (E*H) rows with type id = etype*H + head
        w_att = self.param("relation_att",
                           nn.initializers.glorot_uniform(),
                           (self.num_etypes * H, D, D), x.dtype)
        w_msg = self.param("relation_msg",
                           nn.initializers.glorot_uniform(),
                           (self.num_etypes * H, D, D), x.dtype)
        pri = self.param("relation_pri", nn.initializers.ones,
                         (self.num_etypes, H), x.dtype)
        if getattr(g, "is_sharded", False):
            # mesh plane: per-edge tensors are slot-layout (P, ES, ...);
            # src/dst gathers are halo gsddmms, the grouped GEMMs run
            # over flattened slots (pad slots compute type 0 and land on
            # the dummy dst — dropped by the reduction / softmax mask)
            from ...ops import gsddmm as _gs
            from ...parallel.halo_ops import edge_slots_from_canonical
            k_slot = _gs(unit, "copy_lhs", k, None, "u", "v")
            v_slot = _gs(unit, "copy_lhs", v, None, "u", "v")
            q_slot = _gs(unit, "copy_lhs", q, None, "v", "u")
            ets = edge_slots_from_canonical(unit.hg, etype)  # (P, ES)
            p_, es = ets.shape
            flat_type = (ets.reshape(-1)[:, None] * H +
                         jnp.arange(H, dtype=jnp.int32)[None]).reshape(-1)
            k_e = gather_mm(k_slot.reshape(p_ * es * H, D), w_att,
                            idx_b=flat_type).reshape(p_, es, H, D)
            m_e = gather_mm(v_slot.reshape(p_ * es * H, D), w_msg,
                            idx_b=flat_type).reshape(p_, es, H, D)
            a = ((k_e * q_slot.reshape(p_, es, H, D)).sum(-1)
                 * pri[ets] / sqrt_d)                       # (P, ES, H)
        else:
            row, col = unit.coo()
            E = row.shape[0]
            flat_type = (etype[:, None] * H +
                         jnp.arange(H, dtype=jnp.int32)[None]).reshape(-1)
            k_e = gather_mm(k[row].reshape(E * H, D), w_att,
                            idx_b=flat_type).reshape(E, H, D)
            m_e = gather_mm(v[row].reshape(E * H, D), w_msg,
                            idx_b=flat_type).reshape(E, H, D)
            a = (k_e * q[col]).sum(-1) * pri[etype] / sqrt_d    # (E, H)
        a = edge_softmax(g, a[..., None])                       # (E, H, 1)
        g.edata["m"] = m_e * a
        h = update_all(g, fn.copy_e("m", "m"),
                       fn.sum("m", "h"))["h"].reshape(-1, H * D)
        h = TypedLinear(H * D, H * D, self.num_ntypes,
                        name="linear_a")(h, dstntype)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        skip = self.param("skip", nn.initializers.ones,
                          (self.num_ntypes,), x.dtype)
        alpha = jax.nn.sigmoid(skip[dstntype])[:, None]
        if x_dst.shape[-1] != H * D:
            res_w = self.param("residual_w",
                               nn.initializers.glorot_uniform(),
                               (self.in_size, H * D), x.dtype)
            h = h * alpha + (x_dst @ res_w) * (1 - alpha)
        else:
            h = h * alpha + x_dst * (1 - alpha)
        if self.use_norm:
            h = nn.LayerNorm(name="norm")(h)
        return h


class DGNConv(nn.Module):
    """Directional Graph Network conv (reference ``dgnconv.py``): PNA-style
    towers with directional aggregators driven by a Laplacian-eigenvector
    field.  ``dir{k}-av``/``dir{k}-dx`` use B_av = |w|-normalized |Σ w m|
    and B_dx = |Σ w m − h Σ w| with w = eig_dst − eig_src."""
    in_size: int
    out_size: int
    aggregators: Sequence[str] = ("mean", "max", "dir1-av", "dir1-dx")
    scalers: Sequence[str] = ("identity",)
    delta: float = 1.0
    dropout: float = 0.0
    edge_feat_size: int = 0

    @nn.compact
    def __call__(self, graph, node_feat, edge_feat=None, eig_vec=None):
        unit = graph.unit()
        row, col = unit.coo()
        parts = [node_feat[row], node_feat[col]]
        if self.edge_feat_size > 0:
            parts.append(edge_feat)
        msg = nn.Dense(self.in_size, name="M")(
            jnp.concatenate(parts, -1))
        graph.edata["_m"] = msg
        deg = jnp.maximum(unit.in_degrees(), 1).astype(node_feat.dtype)
        outs = []
        for agg in self.aggregators:
            if agg.startswith("dir"):
                kdx = int(agg.split("-")[0][3:]) - 1
                w = (eig_vec[col, kdx] - eig_vec[row, kdx])[:, None]
                graph.edata["_wm"] = msg * w
                graph.edata["_w"] = jnp.broadcast_to(
                    jnp.abs(w), (w.shape[0], 1))
                swm = update_all(graph, fn.copy_e("_wm", "m"),
                                 fn.sum("m", "o"))["o"]
                if agg.endswith("av"):
                    sw = update_all(graph, fn.copy_e("_w", "m"),
                                    fn.sum("m", "o"))["o"]
                    outs.append(jnp.abs(swm) / (sw + 1e-30))
                else:  # dx: |Σ w·m − h ⊙ Σ w| (forward derivative)
                    graph.edata["_ws"] = w
                    sws = update_all(graph, fn.copy_e("_ws", "m"),
                                     fn.sum("m", "o"))["o"]
                    h_dst = node_feat[: swm.shape[0]]
                    proj = h_dst if h_dst.shape[-1] == swm.shape[-1] else \
                        nn.Dense(swm.shape[-1], use_bias=False,
                                 name=f"dx_proj_{kdx}")(h_dst)
                    outs.append(jnp.abs(swm - proj * sws))
            elif agg in ("mean", "max", "min", "sum"):
                outs.append(update_all(graph, fn.copy_e("_m", "m"),
                                       getattr(fn, agg)("m", "o"))["o"])
            elif agg == "std":
                m1 = update_all(graph, fn.copy_e("_m", "m"),
                                fn.mean("m", "o"))["o"]
                graph.edata["_m2"] = msg ** 2
                m2 = update_all(graph, fn.copy_e("_m2", "m"),
                                fn.mean("m", "o"))["o"]
                outs.append(jnp.sqrt(jnp.maximum(m2 - m1 ** 2, 0) + 1e-30))
            else:
                raise ValueError(agg)
        h = jnp.concatenate(outs, -1)
        scaled = []
        logd = jnp.log(deg + 1)[:, None]
        for s in self.scalers:
            if s == "identity":
                scaled.append(h)
            elif s == "amplification":
                scaled.append(h * (logd / self.delta))
            elif s == "attenuation":
                scaled.append(h * (self.delta / logd))
            else:
                raise ValueError(s)
        h = jnp.concatenate(scaled, -1)
        return nn.Dense(self.out_size, name="U")(
            jnp.concatenate([node_feat, h], -1))


class _MLP(nn.Module):
    hidden: int
    out: int
    num_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_layers):
            d = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(d, name=f"fc{i}")(x)
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(x)
        return x


class TWIRLSConv(nn.Module):
    """TWIRLS unfolded conv (reference ``twirlsconv.py``): MLP →
    ``prop_step`` descent iterations of the graph-regularized energy
    (preconditioned eq.28 or plain eq.30), optional attention reweighting
    at mid-unfolding (eq.27's edge reweighting) → MLP."""
    input_d: int
    output_d: int
    hidden_d: int
    prop_step: int
    num_mlp_before: int = 1
    num_mlp_after: int = 1
    precond: bool = True
    attention: bool = False
    alp: float = 0.0
    lam: float = 1.0
    tau: float = 0.2
    T: float = -1.0
    p: float = 1.0
    dropout: float = 0.0

    def _weighted_deg(self, graph, w):
        graph.edata["_w"] = w
        return update_all(graph, fn.copy_e("_w", "m"),
                          fn.sum("m", "deg"))["deg"].reshape(-1)

    def _ax(self, graph, Y, w):
        graph.srcdata["h"] = Y
        graph.edata["_w"] = w
        return update_all(graph, fn.u_mul_e("h", "_w", "m"),
                          fn.sum("m", "h"))["h"]

    @nn.compact
    def __call__(self, graph, feat, *, deterministic: bool = True):
        alp = self.alp if self.alp > 0 else 1.0 / (self.lam + 1)
        lam = self.lam
        if self.num_mlp_before > 0:
            size_bef = self.hidden_d if self.num_mlp_after > 0 else \
                self.output_d
            feat = _MLP(self.hidden_d, size_bef, self.num_mlp_before,
                        self.dropout, name="mlp_bef")(
                            feat, deterministic=deterministic)
        X = feat
        Y = X
        E = graph.num_edges()
        w = jnp.ones((E, 1), X.dtype)
        deg = self._weighted_deg(graph, w)
        attn_aft = self.prop_step // 2 if self.attention else -1
        for k in range(self.prop_step):
            if k == attn_aft:
                # eq.27 reweighting: w_uv = 1 / clip(||y_u - y_v||^{2-p})
                unit = graph.unit()
                row, col = unit.coo()
                dist = ((Y[row] - Y[col]) ** 2).sum(-1)
                ww = jnp.maximum(dist, 0) + 1e-7
                ww = ww ** (1 - 0.5 * self.p)
                ww = jnp.maximum(ww, self.tau)
                if self.T > 0:
                    ww = jnp.where(ww > self.T, jnp.inf, ww)
                w = (1.0 / ww + 1e-9)[:, None]
                deg = self._weighted_deg(graph, w)
            if self.precond:
                # eq.28: Y <- (1-a) Y + a*lam * D̃^-1/2 A D̃^-1/2 Y
                #        + a * D̃^-1 X, D̃ = lam*D + (1-lam)I
                dt = (lam * deg + (1 - lam))[:, None]
                prop = self._ax(graph, Y * dt ** -0.5, w) * dt ** -0.5
                Y = (1 - alp) * Y + alp * lam * prop + alp * X / dt
            else:
                # eq.30 with normalized laplacian
                dn = jnp.maximum(deg, 1e-12)[:, None] ** -0.5
                prop = self._ax(graph, Y * dn, w) * dn
                Y = (1 - alp * lam - alp) * Y + alp * lam * prop + alp * X
        if self.num_mlp_after > 0:
            Y = _MLP(self.hidden_d, self.output_d, self.num_mlp_after,
                     self.dropout, name="mlp_aft")(
                         Y, deterministic=deterministic)
        return Y


class AtomicConv(nn.Module):
    """Atomic convolution (reference ``atomicconv.py``): K radial filters
    ``exp(-(d−r_k)²γ_k) · cutoff(d)`` over neighbor distances, outer-
    producted with (optionally one-hot) node features and summed."""
    interaction_cutoffs: Any = None     # (K,)
    rbf_kernel_means: Any = None        # (K,)
    rbf_kernel_scaling: Any = None      # (K,)
    features_to_use: Any = None         # (T,) atomic numbers or None

    @nn.compact
    def __call__(self, graph, feat, distances):
        cut = jnp.asarray(self.interaction_cutoffs)[None, :]    # (1,K)
        mean = jnp.asarray(self.rbf_kernel_means)[None, :]
        gamma = jnp.asarray(self.rbf_kernel_scaling)[None, :]
        d = distances.reshape(-1, 1)                             # (E,1)
        rbf = jnp.exp(-gamma * (d - mean) ** 2)                  # (E,K)
        cos_v = 0.5 * (jnp.cos(jnp.pi * d / cut) + 1)
        rbf = rbf * jnp.where(d <= cut, cos_v, 0.0)
        if self.features_to_use is not None:
            feat = (feat == jnp.asarray(self.features_to_use)[None]
                    ).astype(d.dtype)                            # (V,T)
        unit = graph.unit()
        row, _ = unit.coo()
        E = rbf.shape[0]
        m = (feat[row][:, :, None] * rbf[:, None, :]).reshape(E, -1)
        graph.edata["m"] = m
        out = update_all(graph, fn.copy_e("m", "m"),
                         fn.sum("m", "h"))["h"]
        return out                                               # (V, T*K)


class GroupRevRes(nn.Module):
    """Grouped reversible residual connection (reference
    ``grouprevres.py``): split channels in G groups,
    ``y_i = x_i + F_i(y_{i-1})``; reversibility trades memory for compute —
    here each group call is wrapped in ``nn.remat`` (XLA rematerialization,
    the TPU analogue of recomputing from the inverse)."""
    gnn_module: Any
    groups: int = 2

    @nn.compact
    def __call__(self, g, x, *args):
        G = self.groups
        xs = jnp.split(x, G, axis=-1)
        if args:
            per_arg = [jnp.split(a, G, axis=-1) for a in args]
            chunked = [tuple(c[i] for c in per_arg) for i in range(G)]
        else:
            chunked = [()] * G
        mods = [self.gnn_module.clone(name=f"group{i}", parent=self)
                for i in range(G)]
        y_in = sum(xs[1:]) if G > 1 else jnp.zeros_like(xs[0])
        ys = []
        for i in range(G):
            y_in = xs[i] + mods[i](g, y_in, *chunked[i])
            ys.append(y_in)
        return jnp.concatenate(ys, -1)


class DenseGraphConv(nn.Module):
    """GCN over a dense adjacency (reference ``densegraphconv.py``)."""
    in_feats: int
    out_feats: int
    norm: str = "both"
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, adj, feat):
        adj = adj.astype(feat.dtype)
        src_deg = jnp.maximum(adj.sum(0), 1)
        dst_deg = jnp.maximum(adj.sum(1), 1)
        feat_src = feat
        if self.norm == "both":
            feat_src = feat_src * (src_deg ** -0.5)[:, None]
        elif self.norm == "left":
            feat_src = feat_src * (src_deg ** -1)[:, None]
        w = self.param("weight", nn.initializers.glorot_uniform(),
                       (self.in_feats, self.out_feats), feat.dtype)
        if self.in_feats > self.out_feats:
            rst = adj @ (feat_src @ w)
        else:
            rst = (adj @ feat_src) @ w
        if self.norm == "both":
            rst = rst * (dst_deg ** -0.5)[:, None]
        elif self.norm == "right":
            rst = rst * (dst_deg ** -1)[:, None]
        if self.bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (self.out_feats,), rst.dtype)
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class DenseSAGEConv(nn.Module):
    """GraphSAGE-mean over dense adjacency incl. self feature (reference
    ``densesageconv.py``)."""
    in_feats: int
    out_feats: int
    bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, adj, feat):
        adj = adj.astype(feat.dtype)
        in_deg = adj.sum(1, keepdims=True)
        h = (adj @ feat + feat) / (in_deg + 1)
        rst = nn.Dense(self.out_feats, use_bias=self.bias, name="fc")(h)
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class DenseChebConv(nn.Module):
    """Chebyshev spectral conv over dense adjacency (reference
    ``densechebconv.py``)."""
    in_feats: int
    out_feats: int
    k: int = 2
    bias: bool = True

    @nn.compact
    def __call__(self, adj, feat, lambda_max=2.0):
        A = adj.astype(feat.dtype)
        n = A.shape[0]
        d = jnp.maximum(A.sum(1), 1) ** -0.5
        L = jnp.eye(n, dtype=feat.dtype) - (d[:, None] * A) * d[None, :]
        L_hat = 2 * L / lambda_max - jnp.eye(n, dtype=feat.dtype)
        W = self.param("W", nn.initializers.glorot_uniform(),
                       (self.k, self.in_feats, self.out_feats), feat.dtype)
        Zp, Z = feat, None
        out = Zp @ W[0]
        if self.k > 1:
            Z = L_hat @ feat
            out = out + Z @ W[1]
        for i in range(2, self.k):
            Zn = 2 * (L_hat @ Z) - Zp
            out = out + Zn @ W[i]
            Zp, Z = Z, Zn
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_feats,), out.dtype)
        return out
