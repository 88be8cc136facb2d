"""Property-based structural invariants (hypothesis; ROADMAP item —
the reference has no fuzzing, SURVEY §4 'no sanitizers/fuzzing')."""
import numpy as np
from hypothesis import given, settings, strategies as st

import dgl_tpu as dgl
from dgl_tpu.graph.graph import EID


def graphs(max_n=30, max_e=120):
    @st.composite
    def _g(draw):
        n = draw(st.integers(2, max_n))
        e = draw(st.integers(1, max_e))
        seed = draw(st.integers(0, 2 ** 31 - 1))
        rng = np.random.default_rng(seed)
        return dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                         num_nodes=n)
    return _g()


@settings(max_examples=25, deadline=None)
@given(graphs())
def test_reverse_involution(g):
    rg = dgl.reverse(dgl.reverse(g))
    r0, c0 = (np.asarray(a) for a in g.unit().coo())
    r2, c2 = (np.asarray(a) for a in rg.unit().coo())
    np.testing.assert_array_equal(r0, r2)
    np.testing.assert_array_equal(c0, c2)


@settings(max_examples=25, deadline=None)
@given(graphs())
def test_add_remove_self_loop(g):
    g2 = dgl.remove_self_loop(dgl.add_self_loop(
        dgl.remove_self_loop(g)))
    row, col = (np.asarray(a) for a in g2.unit().coo())
    assert (row != col).all()
    base = dgl.remove_self_loop(g)
    assert g2.num_edges() == base.num_edges()


@settings(max_examples=25, deadline=None)
@given(graphs())
def test_to_simple_idempotent(g):
    s1 = dgl.to_simple(g)
    s2 = dgl.to_simple(s1)
    assert s1.num_edges() == s2.num_edges()
    r, c = (np.asarray(a) for a in s1.unit().coo())
    key = r.astype(np.int64) * (g.num_nodes() + 1) + c
    assert len(np.unique(key)) == len(key)


@settings(max_examples=25, deadline=None)
@given(graphs())
def test_degree_conservation(g):
    unit = g.unit()
    ind = np.asarray(unit.in_degrees())
    outd = np.asarray(unit.out_degrees())
    assert ind.sum() == g.num_edges() == outd.sum()
    rg = dgl.reverse(g)
    np.testing.assert_array_equal(np.asarray(rg.unit().in_degrees()),
                                  outd)


@settings(max_examples=20, deadline=None)
@given(graphs(), st.integers(0, 2 ** 31 - 1))
def test_edge_subgraph_roundtrip(g, seed):
    rng = np.random.default_rng(seed)
    k = rng.integers(1, g.num_edges() + 1)
    eids = np.sort(rng.choice(g.num_edges(), size=k, replace=False))
    sub = dgl.edge_subgraph(g, eids, relabel_nodes=False)
    row, col = (np.asarray(a) for a in g.unit().coo())
    sr, sc = (np.asarray(a) for a in sub.unit().coo())
    got = np.asarray(sub.edata[EID])
    np.testing.assert_array_equal(np.sort(got), eids)
    np.testing.assert_array_equal(sr, row[got])
    np.testing.assert_array_equal(sc, col[got])


@settings(max_examples=15, deadline=None)
@given(graphs())
def test_format_views_agree(g):
    """COO / CSR / CSC views describe the same edge multiset."""
    unit = g.unit()
    row, col = (np.asarray(a) for a in unit.coo())
    csr = unit.csr()
    indptr, indices, eids = (np.asarray(csr.indptr),
                             np.asarray(csr.indices),
                             np.asarray(csr.eids))
    for u in range(g.num_nodes()):
        nbrs = np.sort(indices[indptr[u]:indptr[u + 1]])
        np.testing.assert_array_equal(nbrs, np.sort(col[row == u]))
    csc = unit.csc()
    indptr2, indices2 = np.asarray(csc.indptr), np.asarray(csc.indices)
    for v in range(g.num_nodes()):
        np.testing.assert_array_equal(
            np.sort(indices2[indptr2[v]:indptr2[v + 1]]),
            np.sort(row[col == v]))


@settings(max_examples=15, deadline=None)
@given(graphs())
def test_spmm_matches_dense(g):
    """gspmm copy_lhs/sum equals the dense adjacency product for any
    random graph shape."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.num_nodes(), 3)).astype(np.float32)
    from dgl_tpu.ops import gspmm
    out = np.asarray(gspmm(g.unit(), "copy_lhs", "sum",
                           jnp.asarray(x), None))
    row, col = (np.asarray(a) for a in g.unit().coo())
    want = np.zeros_like(out)
    np.add.at(want, col, x[row])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


@settings(max_examples=10, deadline=None)
@given(graphs(max_n=20, max_e=60))
def test_serialization_roundtrip(g):
    import tempfile, os
    rng = np.random.default_rng(1)
    g.ndata["x"] = rng.normal(size=(g.num_nodes(), 2)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.bin")
        dgl.data.save_graphs(p, [g])
        g2 = dgl.data.load_graphs(p)[0][0]
    assert g2.num_nodes() == g.num_nodes()
    assert g2.num_edges() == g.num_edges()
    np.testing.assert_allclose(np.asarray(g2.ndata["x"]),
                               np.asarray(g.ndata["x"]))
