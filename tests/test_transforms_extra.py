"""Tests for the long-tail transforms (functional + module), with dense
numpy oracles (reference test strategy for transforms)."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import dgl_tpu as dgl
from dgl_tpu import transforms as T
from dgl_tpu.graph.graph import EID
from conftest import random_graph


def _adj(g):
    n = g.num_nodes()
    row, col = (np.asarray(a) for a in g.unit().coo())
    return sp.coo_matrix((np.ones(len(row)), (row, col)),
                         shape=(n, n)).toarray()


def test_khop_adj_and_graph():
    g, row, col = random_graph(20, 60, seed=0)
    A = _adj(g)
    np.testing.assert_allclose(np.asarray(T.khop_adj(g, 2)).T, A @ A)
    g2 = T.khop_graph(g, 2)
    A2 = _adj(g2)
    np.testing.assert_allclose(A2, (A @ A).T.T)  # multiplicity preserved


def test_adj_algebra():
    ga, _, _ = random_graph(15, 40, seed=1)
    gb, _, _ = random_graph(15, 40, seed=2)
    rng = np.random.default_rng(0)
    ga.edata["w"] = rng.random(40).astype(np.float32)
    gb.edata["w"] = rng.random(40).astype(np.float32)

    def wadj(g):
        row, col = (np.asarray(a) for a in g.unit().coo())
        w = np.asarray(g.edata["w"]).ravel()
        return sp.coo_matrix((w, (row, col)), shape=(15, 15)).toarray()

    gp = T.adj_product_graph(ga, gb, "w")
    np.testing.assert_allclose(wadj(gp), wadj(ga) @ wadj(gb), rtol=1e-5)
    gs = T.adj_sum_graph([ga, gb], "w")
    np.testing.assert_allclose(wadj(gs), wadj(ga) + wadj(gb), rtol=1e-5)


def test_laplacian_lambda_max():
    g, _, _ = random_graph(30, 120, seed=3)
    lam = T.laplacian_lambda_max(g)
    assert len(lam) == 1 and 0 < lam[0] <= 2.0 + 1e-6


def test_sort_csr_by_tag():
    g, row, col = random_graph(25, 150, seed=4)
    rng = np.random.default_rng(0)
    tag = rng.integers(0, 3, 25)
    g2 = T.sort_csr_by_tag(g, tag)
    row2, col2 = (np.asarray(a) for a in g2.unit().coo())
    # same multiset of edges
    assert sorted(zip(row2.tolist(), col2.tolist())) == \
        sorted(zip(row.tolist(), col.tolist()))
    offsets = np.asarray(g2.ndata["_TAG_OFFSET"])
    assert offsets.shape == (25, 4)
    # per src node, edges are tag-sorted and offsets index the segments
    csr = g2.unit().csr()
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.indices)
    for u in range(25):
        seg_tags = tag[cols[indptr[u]:indptr[u + 1]]]
        assert (np.diff(seg_tags) >= 0).all()
        counts = offsets[u][1:] - offsets[u][:-1]
        np.testing.assert_array_equal(
            counts, np.bincount(seg_tags, minlength=3))


def test_radius_and_segmented_knn():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(30, 3)).astype(np.float32)
    g = T.radius_graph(x, 1.0)
    row, col = (np.asarray(a) for a in g.unit().coo())
    d = np.linalg.norm(x[row] - x[col], axis=1)
    assert (d <= 1.0 + 1e-6).all()
    g2 = T.segmented_knn_graph(x, 3, [10, 20])
    r2, c2 = (np.asarray(a) for a in g2.unit().coo())
    # no cross-segment edges
    assert (((r2 < 10) & (c2 < 10)) | ((r2 >= 10) & (c2 >= 10))).all()


def test_dtype_casts():
    g, _, _ = random_graph(10, 30, seed=5)
    g.ndata["x"] = np.ones((10, 4), np.float32)
    g16 = T.to_half(g)
    assert g16.ndata["x"].dtype == jnp.float16
    g64 = T.to_double(g16)
    # float64 only with jax_enable_x64; truncates to f32 otherwise
    import jax
    want = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    assert g64.ndata["x"].dtype == want


def test_drnl():
    # path graph 0-1-2-3-4
    u = np.array([0, 1, 1, 2, 2, 3, 3, 4])
    v = np.array([1, 0, 2, 1, 3, 2, 4, 3])
    g = dgl.graph((u, v), num_nodes=5)
    lab = np.asarray(T.double_radius_node_labeling(g, 0, 4))
    assert lab[0] == 1 and lab[4] == 1
    assert (lab[1:4] > 1).all()


def test_svd_pe():
    g, _, _ = random_graph(20, 80, seed=6)
    pe = T.svd_pe(g, 4)
    assert pe.shape == (20, 8)
    assert jnp.isfinite(pe).all()


# ---- module transforms ----

def test_ppr_heat_gdc():
    g, _, _ = random_graph(15, 60, seed=7)
    for t in (T.PPR(), T.HeatKernel(), T.GDC([0.5, 0.3, 0.2])):
        g2 = t(g)
        assert "w" in g2.edata
        assert g2.num_nodes() == 15
        assert (np.asarray(g2.edata["w"]) > 0).all()


def test_node_shuffle_preserves_structure():
    g, _, _ = random_graph(20, 70, seed=8)
    g.ndata["x"] = np.arange(20, dtype=np.float32)[:, None]
    g2 = T.NodeShuffle(seed=1)(g)
    # degree multiset preserved
    d1 = np.sort(np.asarray(g.unit().in_degrees()))
    d2 = np.sort(np.asarray(g2.unit().in_degrees()))
    np.testing.assert_array_equal(d1, d2)


def test_add_edge_and_sign():
    g, _, _ = random_graph(20, 50, seed=9)
    g2 = T.AddEdge(ratio=0.2, seed=0)(g)
    assert g2.num_edges() == 60
    g.ndata["feat"] = np.ones((20, 4), np.float32)
    g3 = T.SIGNDiffusion(k=2, diffuse_op="rw")(g)
    assert "out_1" in g3.ndata and "out_2" in g3.ndata


def test_to_levi():
    g, row, col = random_graph(10, 25, seed=10)
    g.edata["ef"] = np.ones((25, 2), np.float32)
    hg = T.ToLevi()(g)
    assert hg.num_nodes("edge") == 25
    assert hg.num_nodes("node") == 10
    assert hg.num_edges(("node", "n2e", "edge")) == 25
    assert "ef" in hg.nodes["edge"].data


def test_add_metapaths():
    import dgl_tpu as dgl
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([1, 2]), np.array([0, 1])),
    })
    out = T.AddMetaPaths({"fp": ["follows", "plays"]})(hg)
    assert ("user", "fp", "game") in out.canonical_etypes
    r, c = (np.asarray(a) for a in out.unit(("user", "fp", "game")).coo())
    assert set(zip(r.tolist(), c.tolist())) == {(0, 0), (1, 1)}


def test_khop_module_and_linegraph():
    g, _, _ = random_graph(12, 30, seed=11)
    g2 = T.KHopGraph(2)(g)
    assert g2.num_nodes() == 12
    lg = T.LineGraph()(g)
    assert lg.num_nodes() == 30
