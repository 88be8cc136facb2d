"""Long-tail functional transforms (reference
``python/dgl/transforms/functional.py`` — the remaining ~14 of 47):
segmented knn, k-hop, adjacency algebra, tag sorting, radius graph,
dtype casts, DRNL labeling, SVD positional encoding.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph, EID
from ..graph.convert import graph as make_graph
from ..graph.unitgraph import UnitGraph


def segmented_knn_graph(x, k: int, segs) -> Graph:
    """kNN graph per segment (reference ``functional.py
    segmented_knn_graph``): points in different segments never connect."""
    x = np.asarray(x)
    segs = list(segs)
    offsets = np.concatenate([[0], np.cumsum(segs)])
    rows, cols = [], []
    for i, s in enumerate(segs):
        lo, hi = offsets[i], offsets[i + 1]
        xi = x[lo:hi]
        d = ((xi[:, None] - xi[None]) ** 2).sum(-1)
        kk = min(k, s)
        nbrs = np.argsort(d, axis=1)[:, :kk]
        rows.append((nbrs + lo).ravel())
        cols.append(np.repeat(np.arange(lo, hi), kk))
    return make_graph((np.concatenate(rows), np.concatenate(cols)),
                      num_nodes=int(offsets[-1]))


def khop_adj(g: Graph, k: int):
    """Dense A^k (reference ``functional.py khop_adj``); A[dst, src]."""
    A = np.asarray(g.adjacency_matrix()).astype(np.float32)
    out = np.linalg.matrix_power(A, k)
    return jnp.asarray(out)


def khop_graph(g: Graph, k: int) -> Graph:
    """Graph whose edges are k-hop paths with multiplicity (reference
    ``functional.py khop_graph``)."""
    import scipy.sparse as sp
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    A = sp.coo_matrix((np.ones(len(row)), (row, col)),
                      shape=(n, n)).tocsr()
    P = A ** k
    P = P.tocoo()
    src = np.repeat(P.row, P.data.astype(np.int64))
    dst = np.repeat(P.col, P.data.astype(np.int64))
    return make_graph((src, dst), num_nodes=n)


def laplacian_lambda_max(g: Graph):
    """Largest eigenvalue of the symmetric-normalized Laplacian per
    batched component (reference ``functional.py laplacian_lambda_max``)."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigsh
    out = []
    from ..batch import unbatch
    graphs = unbatch(g) if g.batch_size > 1 else [g]
    for gg in graphs:
        n = gg.num_nodes()
        row, col = (np.asarray(a) for a in gg.unit().coo())
        A = sp.coo_matrix((np.ones(len(row)), (row, col)),
                          shape=(n, n)).tocsr()
        A = ((A + A.T) > 0).astype(np.float64)
        d = np.maximum(np.asarray(A.sum(1)).ravel(), 1) ** -0.5
        L = sp.eye(n) - sp.diags(d) @ A @ sp.diags(d)
        if n <= 2:
            out.append(2.0)
            continue
        val = eigsh(L, k=1, which="LM", return_eigenvectors=False,
                    maxiter=5000, tol=1e-6)
        out.append(float(val[0]))
    return out


def _weighted_spmatrix(g: Graph, weight: str):
    import scipy.sparse as sp
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    w = np.asarray(g.edata[weight]).ravel()
    return sp.coo_matrix((w, (row, col)), shape=(n, n)).tocsr()


def _graph_from_spmatrix(M, weight: str) -> Graph:
    M = M.tocoo()
    gg = make_graph((M.row, M.col), num_nodes=M.shape[0])
    gg.edata[weight] = M.data.astype(np.float32)
    return gg


def adj_product_graph(A: Graph, B: Graph, weight_name: str) -> Graph:
    """SpGEMM of two weighted graphs (reference ``functional.py
    adj_product_graph`` → ``CSRMM``)."""
    return _graph_from_spmatrix(
        _weighted_spmatrix(A, weight_name) @ _weighted_spmatrix(
            B, weight_name), weight_name)


def adj_sum_graph(graphs, weight_name: str) -> Graph:
    """Weighted adjacency sum (reference ``adj_sum_graph`` → ``CSRSum``)."""
    M = _weighted_spmatrix(graphs[0], weight_name)
    for gg in graphs[1:]:
        M = M + _weighted_spmatrix(gg, weight_name)
    return _graph_from_spmatrix(M, weight_name)


def sort_csr_by_tag(g: Graph, tag, tag_offset_name: str = "_TAG_OFFSET"
                    ) -> Graph:
    """Reorder each row's edges so same-tag edges are contiguous
    (reference ``functional.py:2824``; enables the segment_mm fast path).
    Stores per-node tag offsets in ``ndata[tag_offset_name]``."""
    return _sort_by_tag(g, tag, tag_offset_name, by="row")


def sort_csc_by_tag(g: Graph, tag, tag_offset_name: str = "_TAG_OFFSET"
                    ) -> Graph:
    return _sort_by_tag(g, tag, tag_offset_name, by="col")


def _sort_by_tag(g: Graph, tag, tag_offset_name, by) -> Graph:
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    tag = np.asarray(tag).ravel()
    num_tags = int(tag.max()) + 1 if len(tag) else 1
    if tag.shape[0] == n:  # node tag -> tag of the "other" endpoint
        etag = tag[col] if by == "row" else tag[row]
    else:
        etag = tag
    key_node = row if by == "row" else col
    order = np.lexsort((etag, key_node))
    new_row, new_col = row[order], col[order]
    g2 = make_graph((new_row, new_col), num_nodes=n)
    for k, v in g._edge_frames[0].items():
        g2.edata[k] = np.asarray(v)[order]
    g2.edata[EID] = order.astype(np.int64)
    # per-node (num_tags+1) offsets into its edge segment
    offsets = np.zeros((n, num_tags + 1), np.int64)
    counts = np.zeros((n, num_tags), np.int64)
    np.add.at(counts, (key_node, etag.astype(np.int64)), 1)
    offsets[:, 1:] = np.cumsum(counts, axis=1)
    g2.ndata[tag_offset_name] = offsets
    return g2


def radius_graph(x, r: float, p: float = 2.0, self_loop: bool = False
                 ) -> Graph:
    """Connect all pairs within distance r (reference ``functional.py
    radius_graph``)."""
    x = np.asarray(x)
    if p == 2.0:
        d = np.sqrt(((x[:, None] - x[None]) ** 2).sum(-1))
    else:
        d = np.abs(x[:, None] - x[None]).__pow__(p).sum(-1) ** (1 / p)
    mask = d <= r
    if not self_loop:
        np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    return make_graph((src, dst), num_nodes=len(x))


def _cast_floats(g: Graph, dtype) -> Graph:
    for frames in (g._node_frames, g._edge_frames):
        for f in frames:
            for k in list(f.keys()):
                v = f[k]
                if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                    f[k] = jnp.asarray(v).astype(dtype)
    return g


def to_half(g: Graph) -> Graph:
    """Cast float features to float16 (reference ``to_half``)."""
    return _cast_floats(g, jnp.float16)


def to_double(g: Graph) -> Graph:
    """Cast float features to float64 (reference ``to_double``).  Note:
    requires ``jax_enable_x64``; otherwise jax truncates to float32."""
    return _cast_floats(g, jnp.float64)


def double_radius_node_labeling(g: Graph, src: int, dst: int):
    """DRNL labels for SEAL-style link prediction (reference
    ``functional.py double_radius_node_labeling``):
    label = 1 + min(d_u, d_v) + (d//2)*(d//2 + d%2 - 1) with
    d = d_u + d_v; src/dst get 1; unreachable gets 0."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import shortest_path
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    A = sp.coo_matrix((np.ones(len(row)), (row, col)), shape=(n, n))
    A = ((A + A.T) > 0).tocsr()
    # distance from src (excluding dst) and from dst (excluding src),
    # per the SEAL paper's DRNL definition
    keep_u = np.ones(n, bool); keep_u[dst] = False
    keep_v = np.ones(n, bool); keep_v[src] = False
    map_u = np.cumsum(keep_u) - 1
    map_v = np.cumsum(keep_v) - 1
    du_full = shortest_path(A[keep_u][:, keep_u], method="D",
                            unweighted=True, indices=map_u[src])
    dv_full = shortest_path(A[keep_v][:, keep_v], method="D",
                            unweighted=True, indices=map_v[dst])
    du = np.full(n, np.inf)
    dv = np.full(n, np.inf)
    du[keep_u] = du_full
    dv[keep_v] = dv_full
    d = du + dv
    with np.errstate(invalid="ignore"):
        dd = np.floor_divide(d, 2)
        label = 1 + np.minimum(du, dv) + dd * (dd + d % 2 - 1)
    label[src] = 1
    label[dst] = 1
    label[~np.isfinite(label)] = 0
    return jnp.asarray(label.astype(np.int64))


def svd_pe(g: Graph, k: int, padding: bool = False,
           random_flip: bool = True):
    """SVD-based positional encoding (reference ``functional.py:4012``):
    top-k singular vectors of the adjacency, concat(U_k, V_k) scaled by
    sqrt(S_k)."""
    n = g.num_nodes()
    A = np.asarray(g.adjacency_matrix()).astype(np.float64)
    if not padding and n < k:
        raise ValueError("graph smaller than k; use padding=True")
    U, S, Vh = np.linalg.svd(A)
    m = min(k, n)
    s = np.sqrt(S[:m])
    u = U[:, :m] * s
    v = Vh[:m].T * s
    if random_flip:
        flip = np.where(np.random.default_rng(0).random(m) < 0.5, -1.0,
                        1.0)
        u = u * flip
        v = v * flip
    pe = np.concatenate([u, v], axis=1)          # (n, 2m)
    if m < k:
        pe = np.pad(pe, ((0, 0), (0, 2 * (k - m))))
    return jnp.asarray(pe.astype(np.float32))
