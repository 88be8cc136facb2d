"""Graph core tests (mirrors reference tests/python/common graph tests)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
import dgl_tpu.function as fn


def test_graph_construction():
    g = dgl.graph(([0, 1, 2], [1, 2, 3]))
    assert g.num_nodes() == 4
    assert g.num_edges() == 3
    assert g.is_homogeneous
    u, v = g.all_edges()
    np.testing.assert_array_equal(np.asarray(u), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(v), [1, 2, 3])


def test_graph_num_nodes_explicit():
    g = dgl.graph(([0], [1]), num_nodes=10)
    assert g.num_nodes() == 10


def test_degrees():
    g = dgl.graph(([0, 0, 1, 2], [1, 2, 2, 0]))
    np.testing.assert_array_equal(np.asarray(g.in_degrees()), [1, 1, 2])
    np.testing.assert_array_equal(np.asarray(g.out_degrees()), [2, 1, 1])


def test_formats_roundtrip():
    rng = np.random.default_rng(0)
    row = rng.integers(0, 40, 200).astype(np.int32)
    col = rng.integers(0, 40, 200).astype(np.int32)
    g = dgl.graph((row, col), num_nodes=40)
    unit = g.unit()
    csr = unit.csr()
    csc = unit.csc()
    # csr: edges grouped by row
    r2, c2 = unit.coo()
    np.testing.assert_array_equal(np.asarray(r2), row)
    np.testing.assert_array_equal(np.asarray(c2), col)
    # eids map back to canonical order
    indptr = np.asarray(csr.indptr)
    for r in range(40):
        for pos in range(indptr[r], indptr[r + 1]):
            e = int(np.asarray(csr.eids)[pos])
            assert row[e] == r
            assert col[e] == int(np.asarray(csr.indices)[pos])
    indptr = np.asarray(csc.indptr)
    for c in range(40):
        for pos in range(indptr[c], indptr[c + 1]):
            e = int(np.asarray(csc.eids)[pos])
            assert col[e] == c
            assert row[e] == int(np.asarray(csc.indices)[pos])


def test_coo_reconstruction_from_csr():
    from dgl_tpu.graph.unitgraph import UnitGraph
    rng = np.random.default_rng(1)
    row = rng.integers(0, 20, 60).astype(np.int32)
    col = rng.integers(0, 20, 60).astype(np.int32)
    u = UnitGraph.from_coo(20, 20, row, col)
    csr = u.csr()
    u2 = UnitGraph(20, 20, 60, csr=csr)
    r2, c2 = u2.coo()
    np.testing.assert_array_equal(np.asarray(r2), row)
    np.testing.assert_array_equal(np.asarray(c2), col)


def test_reverse():
    g = dgl.graph(([0, 1], [1, 2]))
    r = g.unit().reverse()
    row, col = r.coo()
    np.testing.assert_array_equal(np.asarray(row), [1, 2])
    np.testing.assert_array_equal(np.asarray(col), [0, 1])


def test_heterograph():
    g = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
    })
    assert set(g.ntypes) == {"user", "game"}
    assert g.num_nodes("user") == 3
    assert g.num_nodes("game") == 2
    assert g.num_edges(("user", "plays", "game")) == 3
    assert g.to_canonical_etype("follows") == ("user", "follows", "user")


def test_hetero_data_views():
    g = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
    })
    g.nodes["user"].data["h"] = jnp.ones((3, 4))
    g.nodes["game"].data["h"] = jnp.zeros((2, 4))
    assert g.nodes["user"].data["h"].shape == (3, 4)
    g.edges["plays"].data["w"] = jnp.ones((3,))
    assert g.edges["plays"].data["w"].shape == (3,)


def test_graph_is_pytree():
    g = dgl.graph(([0, 1], [1, 2]))
    g.ndata["h"] = jnp.ones((3, 2))
    leaves = jax.tree_util.tree_leaves(g)
    assert any(l.shape == (3, 2) for l in leaves)
    g2 = jax.tree_util.tree_map(lambda x: x, g)
    assert g2.num_nodes() == 3
    assert "h" in g2.ndata


def test_graph_through_jit():
    g = dgl.graph(([0, 0, 1, 2], [1, 2, 2, 0]))
    g.create_formats_()
    x = jnp.array([[1.0], [2.0], [3.0]])

    @jax.jit
    def f(g, x):
        return dgl.ops.gspmm(g, "copy_lhs", "sum", x, None)

    out = f(g, x)
    np.testing.assert_allclose(np.asarray(out).ravel(), [3.0, 1.0, 3.0])


def test_local_scope():
    g = dgl.graph(([0], [1]))
    g.ndata["x"] = jnp.ones((2, 2))
    with g.local_scope():
        g.ndata["y"] = jnp.zeros((2, 2))
        assert "y" in g.ndata
    assert "y" not in g.ndata
    assert "x" in g.ndata


def test_edge_ids_and_has_edges():
    g = dgl.graph(([0, 1, 2], [1, 2, 0]))
    assert bool(g.has_edges_between(0, 1))
    assert not bool(g.has_edges_between(1, 0))
    assert g.edge_ids(1, 2) == 1
    u, v = g.find_edges(jnp.array([2]))
    assert int(u[0]) == 2 and int(v[0]) == 0


def test_in_out_edges():
    g = dgl.graph(([0, 0, 1, 2], [1, 2, 2, 0]))
    src, dst = g.in_edges(2)
    assert set(np.asarray(src).tolist()) == {0, 1}
    src, dst, eid = g.out_edges(0, form="all")
    assert set(np.asarray(dst).tolist()) == {1, 2}


def test_subgraph():
    g = dgl.graph(([0, 0, 1, 2, 3], [1, 2, 2, 0, 1]))
    g.ndata["h"] = jnp.arange(4.0).reshape(4, 1)
    sg = g.subgraph([0, 1, 2])
    assert sg.num_nodes() == 3
    assert sg.num_edges() == 4  # edges among {0,1,2}
    np.testing.assert_array_equal(np.asarray(sg.ndata[dgl.NID]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(sg.ndata["h"]).ravel(), [0, 1, 2])


def test_edge_subgraph():
    g = dgl.graph(([0, 0, 1, 2, 3], [1, 2, 2, 0, 1]))
    sg = dgl.edge_subgraph(g, [0, 3])
    assert sg.num_edges() == 2
    # touched nodes: {0,1,2}
    assert sg.num_nodes() == 3


def test_batch_unbatch():
    g1 = dgl.graph(([0, 1], [1, 2]))
    g1.ndata["h"] = jnp.ones((3, 2))
    g2 = dgl.graph(([0], [1]))
    g2.ndata["h"] = jnp.zeros((2, 2))
    bg = dgl.batch([g1, g2])
    assert bg.num_nodes() == 5
    assert bg.num_edges() == 3
    assert bg.batch_size == 2
    parts = dgl.unbatch(bg)
    assert parts[0].num_nodes() == 3
    assert parts[1].num_edges() == 1
    np.testing.assert_allclose(np.asarray(parts[1].ndata["h"]), 0.0)


def test_to_block():
    g = dgl.graph(([0, 1, 2, 3], [1, 1, 2, 2]))
    block = dgl.to_block(g, dst_nodes=np.array([1, 2]))
    assert block.is_block
    assert block.num_dst_nodes() == 2
    # src = seeds {1,2} + neighbors {0,3}
    assert block.num_src_nodes() == 4
    src_ids = np.asarray(block.srcdata[dgl.NID])
    np.testing.assert_array_equal(src_ids[:2], [1, 2])
    assert set(src_ids.tolist()) == {0, 1, 2, 3}
    dst_ids = np.asarray(block.dstdata[dgl.NID])
    np.testing.assert_array_equal(dst_ids, [1, 2])


def test_block_message_passing():
    g = dgl.graph(([0, 1, 2, 3], [1, 1, 2, 2]))
    g.ndata["h"] = jnp.arange(4.0).reshape(4, 1)
    block = dgl.to_block(g, dst_nodes=np.array([1, 2]))
    block.srcdata["h"] = g.ndata["h"][block.srcdata[dgl.NID]]
    block.update_all(fn.copy_u("h", "m"), fn.sum("m", "out"))
    out = np.asarray(block.dstdata["out"]).ravel()
    np.testing.assert_allclose(out, [1.0, 5.0])  # node1 <- 0+1, node2 <- 2+3


def test_scipy_networkx_converters():
    import numpy as np
    import scipy.sparse as sp
    import dgl_tpu as dgl

    rng = np.random.default_rng(0)
    A = sp.random(20, 20, density=0.1, random_state=0, format="coo")
    g = dgl.from_scipy(A, eweight_name="w")
    assert g.num_edges() == A.nnz
    B = dgl.to_scipy(g, "coo", eweight_name="w")
    np.testing.assert_allclose(
        B.toarray(), sp.coo_matrix((A.data, (A.row, A.col)),
                                   shape=(20, 20)).toarray())

    import networkx as nx
    nxg = nx.karate_club_graph()
    g2 = dgl.from_networkx(nxg)
    assert g2.num_nodes() == 34
    assert g2.num_edges() == 2 * nxg.number_of_edges()
    back = dgl.to_networkx(g2)
    assert back.number_of_nodes() == 34


def test_graph_method_surface():
    """Method-style API parity: delegating methods on Graph."""
    import numpy as np
    import jax.numpy as jnp
    import dgl_tpu as dgl

    g = dgl.graph((np.array([0, 1, 2, 2]), np.array([1, 2, 0, 0])),
                  num_nodes=4)
    g.ndata["x"] = np.arange(4, dtype=np.float32)[:, None]
    assert g.is_multigraph                    # duplicate 2->0
    g2 = g.to_simple()
    assert not g2.is_multigraph
    g3 = g.add_edges(np.array([3]), np.array([0]))
    assert g3.num_edges() == 5
    g4 = g3.remove_nodes(np.array([3]))
    assert g4.num_nodes() == 3
    sub = g.khop_in_subgraph(np.array([0]), 1)
    assert sub[0].num_nodes() >= 1 if isinstance(sub, tuple) else True
    # adjacency + incidence oracles
    A = np.asarray(g.adj())                   # (src, dst)
    assert A[0, 1] == 1 and A[2, 0] == 2
    B_in = np.asarray(g.inc("in"))
    assert B_in.shape == (4, 4)
    assert (B_in.sum(0) == 1).all()
    # filter
    ids = np.asarray(g.filter_nodes(lambda v: np.asarray(v.data["x"])
                                    .ravel() > 1.5))
    np.testing.assert_array_equal(ids, [2, 3])
    # metagraph on hetero
    hg = dgl.heterograph({
        ("a", "ab", "b"): (np.array([0]), np.array([0])),
        ("b", "ba", "a"): (np.array([0]), np.array([0])),
    })
    mg = hg.metagraph()
    assert set(mg.nodes()) == {"a", "b"}
    sub_h = hg.edge_type_subgraph(["ab"])
    assert sub_h.canonical_etypes == [("a", "ab", "b")]
    assert hg.node_type_subgraph(["a", "b"]).num_edges(("a", "ab", "b")) \
        == 1


def test_khop_out_and_merge():
    import numpy as np
    import dgl_tpu as dgl
    # path 0->1->2->3
    g = dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 3])), num_nodes=4)
    sg, inv = dgl.khop_out_subgraph(g, np.array([0]), 2)
    from dgl_tpu.graph.graph import NID
    nids = set(np.asarray(sg.ndata[NID]).tolist())
    assert nids == {0, 1, 2}
    g2 = dgl.graph((np.array([3]), np.array([0])), num_nodes=4)
    g2.edata["w"] = np.ones(1, np.float32)
    g.edata["w"] = np.full(3, 2.0, np.float32)
    m = dgl.merge([g, g2])
    assert m.num_edges() == 4
    np.testing.assert_array_equal(np.asarray(m.edata["w"]),
                                  [2, 2, 2, 1])


def test_apply_edges_builtin_subset():
    """Builtin apply_edges on an edge subset (reference heterograph
    apply_edges(edges=...)): computes only the selected edges and
    writes them in place."""
    import dgl_tpu as dgl
    import dgl_tpu.function as fn
    rng = np.random.default_rng(0)
    N, E = 50, 300
    row, col = rng.integers(0, N, E), rng.integers(0, N, E)
    g = dgl.graph((row, col), num_nodes=N)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    g.edata["w"] = jnp.asarray(rng.normal(size=(E, 4)).astype(np.float32))
    sel = np.asarray([3, 7, 19, 120, 250])
    # functional form returns only the subset rows
    out = dgl.apply_edges(g, fn.u_add_v("h", "h", "m"), edges=sel)
    h = np.asarray(g.ndata["h"])
    want = h[row[sel]] + h[col[sel]]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    # in-place form writes selected rows, keeps others
    g.edata["m"] = jnp.zeros((E, 4), jnp.float32)
    g.apply_edges(fn.u_mul_e("h", "w", "m"), edges=sel)
    got = np.asarray(g.edata["m"])
    np.testing.assert_allclose(got[sel],
                               h[row[sel]] * np.asarray(g.edata["w"])[sel],
                               rtol=1e-6)
    others = np.setdiff1d(np.arange(E), sel)
    assert np.all(got[others] == 0)
    # copy_u / dot variants
    out = dgl.apply_edges(g, fn.copy_u("h", "m"), edges=sel)
    np.testing.assert_allclose(np.asarray(out), h[row[sel]], rtol=1e-6)
    out = dgl.apply_edges(g, fn.u_dot_v("h", "h", "m"), edges=sel)
    np.testing.assert_allclose(
        np.asarray(out), (h[row[sel]] * h[col[sel]]).sum(-1, keepdims=True),
        rtol=1e-5)
