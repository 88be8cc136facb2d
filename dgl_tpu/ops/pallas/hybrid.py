"""Degree-stratified hybrid SpMM: dense rows for hub nodes + tiles for the rest.

On heavy-tailed graphs (real Reddit: top ~3.5% of dst nodes carry ~50% of
edges) the tile-dense one-hot kernel pays ~4·T·F/fill FLOP per edge no
matter how dense a destination row is.  But a dst row with in-degree d
costs only 2·N·F FLOP as a *dense* mat-vec — cheaper than the one-hot
path whenever d exceeds ~T/fill (~1.2k FLOP per potential src).  So:

* the K highest-in-degree dst rows become a dense (K, N) bf16 adjacency
  block computed with ONE large MXU matmul ``A_dense @ X`` (streamed
  sequentially from HBM — no gathers);
* the remaining edges go through the tile-dense kernel as usual.

The dense block is static per graph (like the tiled format) and holds
edge *multiplicities* (or static edge weights), so fwd = tiled + scatter
of K rows, and the VJP adds ``A_deneᵀ @ dZ[top]`` — also one matmul.

Reference semantics replaced: ``SpMMSumCsr`` (``src/array/cpu/spmm.h:122``)
/ cuSPARSE (``src/array/cuda/spmm.cu:23-55``); the stratification itself
has no reference counterpart (GPUs have gather hardware; TPUs trade HBM
streams for it).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tiled_spmm import (TiledFormat, build_tiled_format, tiled_from_host,
                         tiled_spmm)
from .int8mm import int8_matmul, pad_int8_block


def _device_block(a_wire):
    """Wire (int8/f16) -> device operand: int8 stays int8 (block-padded
    for the streaming kernel), floats widen to bf16."""
    import numpy as np
    a_wire = np.asarray(a_wire)
    if a_wire.dtype == np.int8:
        return jnp.asarray(pad_int8_block(a_wire))
    return jnp.asarray(a_wire).astype(jnp.bfloat16)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HybridFormat:
    """tf_fwd/tf_rev: tiled format(s) over the NON-hub remainder edges —
    a single TiledFormat, or a tuple of them under multi-resolution
    routing (each level a different (tile, cap) geometry; outputs sum).
    a_dense: (K_pad, N_pad) hub rows' adjacency — **int8** when the
    entries are exact small ints (unweighted multiplicities; streamed
    through the int8 Pallas matmul at half the HBM bytes of bf16), else
    bf16 (static float weights).  dense_ids: (K,) int32 hub dst ids
    (sorted)."""

    tf_fwd: TiledFormat
    tf_rev: TiledFormat
    a_dense: jnp.ndarray
    dense_ids: jnp.ndarray
    num_src: int
    num_dst: int
    k: int
    # symmetric=True: the graph satisfies A == A^T, and the SAME int8
    # hub block serves dense ROWS (dst in top) and dense COLUMNS (src in
    # top, dst not): out += A1 @ x scattered at top + masked A1^T @
    # x[top].  The tiled remainder holds only both-endpoints-non-hub
    # edges and is itself symmetric (tf_rev is tf_fwd), and the whole
    # VJP is the forward applied to dZ.
    symmetric: bool = False

    def tree_flatten(self):
        return ((self.tf_fwd, self.tf_rev, self.a_dense, self.dense_ids),
                (self.num_src, self.num_dst, self.k, self.symmetric))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _levels(tf):
    """Normalize single-format / multi-resolution tuple to a tuple."""
    return tf if isinstance(tf, tuple) else (tf,)


def _route_density(row, col, num_src, num_dst, tile, cap,
                   fill_min: float) -> np.ndarray:
    """Mask of edges whose (dst_tile, src_tile) pair at geometry
    ``(tile, cap)`` is dense enough (≥ fill_min·cap edges) to be worth the
    small-T cost.  Host-side, vectorized."""
    n_st = -(-num_src // tile)
    key = (col // tile) * n_st + (row // tile)
    cnt = np.bincount(key, minlength=n_st * (-(-num_dst // tile)))
    return cnt[key] >= fill_min * cap


def _load_levels(z, prefix):
    """Read tiled levels ``{prefix}{i}_*`` (or legacy ``{prefix}_*``)."""
    if any(k.startswith(prefix + "_") for k in z.files):
        return tiled_from_host({k[len(prefix) + 1:]: z[k] for k in z.files
                                if k.startswith(prefix + "_")}
                               ).with_src_first()
    out = []
    i = 0
    while any(k.startswith(f"{prefix}{i}_") for k in z.files):
        p = f"{prefix}{i}_"
        out.append(tiled_from_host({k[len(p):]: z[k] for k in z.files
                                    if k.startswith(p)}).with_src_first())
        i += 1
    return out[0] if len(out) == 1 else tuple(out)


def load_hybrid_format(path: str) -> Optional[HybridFormat]:
    """Rebuild a HybridFormat from an npz written by ``build_hybrid_format
    (cache_path=...)``; None if the file is absent/unreadable."""
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        sym = bool(z["symmetric"]) if "symmetric" in z.files else False
        tf_fwd = _load_levels(z, "fwd")
        tf_rev = tf_fwd if sym else _load_levels(z, "rev")
        return HybridFormat(
            tf_fwd=tf_fwd, tf_rev=tf_rev,
            a_dense=_device_block(z["a_wire"]),
            dense_ids=jnp.asarray(z["top"]),
            num_src=int(z["num_src"]), num_dst=int(z["num_dst"]),
            k=int(z["k"]), symmetric=sym)
    except Exception:
        return None


def build_hybrid_format(row: np.ndarray, col: np.ndarray, num_src: int,
                        num_dst: int, k_dense: int = 8192,
                        weights: Optional[np.ndarray] = None,
                        tile: int = 1024, cap: int = 512,
                        min_degree: int = 256,
                        cache_path: Optional[str] = None,
                        multires: Optional[tuple] = None,
                        fill_min: float = 0.7,
                        symmetric: bool = False) -> HybridFormat:
    """Split edges into hub-dst (dense rows) + remainder (tiled).

    ``k_dense`` caps the dense block's HBM (K·N·2 bytes); rows below
    ``min_degree`` never go dense (a sparse dense-row wastes the stream).

    ``multires``: optional tuple of (tile, cap) geometries for the tiled
    remainder — density-adaptive multi-resolution tiling.  Per-edge cost
    of the one-hot kernel is ∝ tile/fill, so edges in DENSE tile pairs
    (clustered/community mass) are cheapest under a SMALL tile, while
    sparse scattered edges need a large tile to reach fill.  Each level
    except the last takes the edges whose (dst,src) tile pair at that
    level's geometry holds ≥ fill_min·cap edges; the last level is the
    catch-all.  E.g. ``((256, 512), (1024, 256))``.

    ``cache_path``: optional npz path — if present it is loaded instead of
    building (the build at 100M+ edges takes tens of minutes on one core;
    the caller owns cache-key hygiene, i.e. the path must encode the graph
    identity + build params).
    """
    if cache_path is not None:
        hf = load_hybrid_format(cache_path)
        if hf is not None:
            return hf
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    deg = np.bincount(col, minlength=num_dst)
    k = min(k_dense, num_dst)
    top = np.argpartition(deg, num_dst - k)[num_dst - k:]
    top = top[deg[top] >= min_degree]
    k = len(top)
    if k == 0:
        raise ValueError("no dst row reaches min_degree; use the plain "
                         "tiled format")
    top = np.sort(top)
    dmap = np.full(num_dst, -1, np.int64)
    dmap[top] = np.arange(k)

    n_src_pad = max(128, -(-num_src // 128) * 128)
    dense_edge = dmap[col] >= 0
    w = (np.asarray(weights, np.float32) if weights is not None
         else None)
    if w is None:
        # multiplicity block built straight into int8 via sorted keys —
        # np.add.at into a (K, N) f32 would cost 4 bytes/element and
        # minutes at 100M hub edges
        key = (dmap[col[dense_edge]] * np.int64(n_src_pad)
               + row[dense_edge])
        uk, cnt = np.unique(key, return_counts=True)
        if cnt.max(initial=0) <= 127:
            a = np.zeros(k * n_src_pad, np.int8)
            a[uk] = cnt.astype(np.int8)
        else:
            a = np.zeros(k * n_src_pad, np.float16)
            a[uk] = cnt.astype(np.float16)
        a = a.reshape(k, n_src_pad)
    else:
        a = np.zeros((k, n_src_pad), np.float32)
        np.add.at(a, (dmap[col[dense_edge]], row[dense_edge]),
                  w[dense_edge])

    if symmetric:
        if num_src != num_dst:
            raise ValueError("symmetric hybrid needs a square adjacency")
        if w is not None:
            raise ValueError("symmetric hybrid: weights must also be "
                             "symmetric; unsupported, pass "
                             "symmetric=False")
        # remainder = both endpoints non-hub; src-hub edges ride the
        # SAME block transposed (A == A^T)
        rest = ~dense_edge & (dmap[row] < 0)
    else:
        rest = ~dense_edge
    r_row, r_col = row[rest], col[rest]

    def _build_levels(rr, cc, n_src, n_dst):
        """Route remainder edges across the multires geometries, build a
        TiledFormat per non-empty level; returns (formats, host_dicts)."""
        geoms = multires if multires is not None else ((tile, cap),)
        tfs, hosts = [], []
        for li, (T, C) in enumerate(geoms):
            if li < len(geoms) - 1:
                takem = _route_density(rr, cc, n_src, n_dst, T, C, fill_min)
                lr, lc = rr[takem], cc[takem]
                rr, cc = rr[~takem], cc[~takem]
            else:
                lr, lc = rr, cc
            if len(lr) == 0:
                continue
            h = {}
            tfs.append(build_tiled_format(lr, lc, n_src, n_dst, T, C,
                                          host_out=h).with_src_first())
            hosts.append(h)
        return (tfs[0] if len(tfs) == 1 else tuple(tfs)), hosts

    tf_fwd, h_fwd = _build_levels(r_row, r_col, num_src, num_dst)
    if symmetric:
        tf_rev, h_rev = tf_fwd, h_fwd
    else:
        tf_rev, h_rev = _build_levels(r_col, r_row, num_dst, num_src)
    # ship the dense block in the narrowest exact dtype — the (K, N)
    # matrix is the dominant host->device transfer (int8 halves f16)
    if a.dtype == np.int8:
        a_wire = a
    else:
        a_wire = a.astype(np.float16)
    if cache_path is not None and h_fwd and h_rev:
        tmp = cache_path + ".tmp"
        payload = dict(a_wire=a_wire, top=top.astype(np.int32),
                       num_src=num_src, num_dst=num_dst, k=k,
                       symmetric=symmetric)
        for i, h in enumerate(h_fwd):
            payload.update({f"fwd{i}_" + kk: vv for kk, vv in h.items()})
        if not symmetric:
            for i, h in enumerate(h_rev):
                payload.update({f"rev{i}_" + kk: vv
                                for kk, vv in h.items()})
        with open(tmp, "wb") as f:  # atomic publish; savez keeps the name
            np.savez(f, **payload)
        os.replace(tmp, cache_path)
    return HybridFormat(
        tf_fwd=tf_fwd, tf_rev=tf_rev,
        a_dense=_device_block(a_wire),
        dense_ids=jnp.asarray(top.astype(np.int32)),
        num_src=num_src, num_dst=num_dst, k=k, symmetric=symmetric)


@jax.custom_vjp
def hybrid_spmm(hf: HybridFormat, x):
    """out[d] = sum_{e: dst(e)=d} x[src(e)] — copy_u/sum over the hybrid
    format (unweighted / statically-weighted via ``weights`` at build)."""
    return _hybrid_fwd_impl(hf, x)


def _use_int8_stream(hf):
    return (hf.a_dense.dtype == jnp.int8
            and jax.default_backend() == "tpu")


def _dense_rows(hf, x):
    """(K, F) = A1 @ x — hub-dst rows."""
    if _use_int8_stream(hf):
        return int8_matmul(hf.a_dense, x)[: hf.k]
    a = hf.a_dense.astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    if xb.shape[0] < a.shape[1]:
        xb = jnp.zeros((a.shape[1], x.shape[1]),
                       jnp.bfloat16).at[: x.shape[0]].set(xb)
    return jax.lax.dot_general(a, xb,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)[: hf.k]


def _dense_cols_t(hf, zk):
    """(N_pad-ish, F) = A1^T @ zk — contract the K axis (zk: (K, F))."""
    if _use_int8_stream(hf):
        return int8_matmul(hf.a_dense, zk, contract_rows=True)
    zb = zk.astype(jnp.bfloat16)
    if zb.shape[0] < hf.a_dense.shape[0]:   # block-padded int8 rows
        zb = jnp.zeros((hf.a_dense.shape[0], zk.shape[1]),
                       jnp.bfloat16).at[: zk.shape[0]].set(zb)
    return jax.lax.dot_general(hf.a_dense.astype(jnp.bfloat16), zb,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _hybrid_fwd_impl(hf, x):
    lv = _levels(hf.tf_fwd)
    if len(lv):
        out = tiled_spmm(lv[0], x)
        for tf in lv[1:]:
            out = out + tiled_spmm(tf, x)
    else:                      # every edge touches a hub endpoint
        out = jnp.zeros((hf.num_dst, x.shape[1]), jnp.float32)
    out = out.at[hf.dense_ids].add(_dense_rows(hf, x))
    if hf.symmetric:
        # hub-SRC columns via the same block transposed (A == A^T);
        # rows with hub dst were already fully counted above
        od2 = _dense_cols_t(hf, jnp.take(x, hf.dense_ids, axis=0))
        out = out + od2[: out.shape[0]].at[hf.dense_ids].set(0.0)
    return out


def _hybrid_fwd(hf, x):
    return _hybrid_fwd_impl(hf, x), (hf,)


def _hybrid_bwd(res, dZ):
    (hf,) = res
    if hf.symmetric:
        # d/dx (A x) = A^T = A: the backward IS the forward
        return (None, _hybrid_fwd_impl(hf, dZ).astype(dZ.dtype))
    lv = _levels(hf.tf_rev)
    if len(lv):
        dX = tiled_spmm(lv[0], dZ)
        for tf in lv[1:]:
            dX = dX + tiled_spmm(tf, dZ)
    else:
        dX = jnp.zeros((hf.num_src, dZ.shape[1]), jnp.float32)
    # dX += A_denseᵀ @ dZ[top] — contract the K axis, no transpose copy
    dd = _dense_cols_t(hf, jnp.take(dZ, hf.dense_ids, axis=0))
    dX = dX + dd[: dX.shape[0]]
    return (None, dX.astype(dZ.dtype))


hybrid_spmm.defvjp(_hybrid_fwd, _hybrid_bwd)
