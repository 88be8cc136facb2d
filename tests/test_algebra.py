"""aten array-algebra parity tests (reference ``src/array/array.cc``,
``tests/cpp/test_aten.cc``): every op checked against a scipy/numpy
oracle on random + edge-case matrices."""
import importlib

import numpy as np
import pytest
import scipy.sparse as sp

alg = importlib.import_module("dgl_tpu.graph.algebra")
ug = importlib.import_module("dgl_tpu.graph.unitgraph")


def rand_coo(nr=13, nc=17, nnz=60, dup=False, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, nr, nnz).astype(np.int32)
    col = rng.integers(0, nc, nnz).astype(np.int32)
    if dup:
        row[::7] = row[0]
        col[::7] = col[0]
    return alg.COO(nr, nc, row, col, None)


def as_scipy(coo):
    return sp.coo_matrix(
        (np.ones(coo.nnz), (np.asarray(coo.row), np.asarray(coo.col))),
        shape=(coo.num_rows, coo.num_cols))


def to_csr(coo):
    return alg.coo_to_csr_matrix(coo)


def csr_dense_eids(csr, nr, nc):
    """dense matrix of eid+1 (0 == absent), first-match semantics."""
    out = np.zeros((nr, nc), np.int64)
    ip, ix, ed = (np.asarray(csr.indptr), np.asarray(csr.indices),
                  np.asarray(csr.eids))
    for r in range(nr):
        for p in range(ip[r], ip[r + 1]):
            if out[r, ix[p]] == 0:
                out[r, ix[p]] = ed[p] + 1
    return out


# -- generic helpers --------------------------------------------------------

def test_relabel():
    a = np.array([30, 10, 30, 20], np.int32)
    b = np.array([20, 40], np.int32)
    uniq, (ra, rb) = alg.relabel([a, b])
    assert uniq.tolist() == [30, 10, 20, 40]
    assert ra.tolist() == [0, 1, 0, 2]
    assert rb.tolist() == [2, 3]


def test_pack_concat_slices_cumsum():
    arr = np.array([[1, 2, -1], [3, -1, -1]], np.int64)
    packed, lengths, offsets = alg.pack(arr, -1)
    assert packed.tolist() == [1, 2, 3]
    assert lengths.tolist() == [2, 1]
    assert offsets.tolist() == [0, 2]
    flat, offs = alg.concat_slices(arr, lengths)
    assert flat.tolist() == [1, 2, 3] and offs.tolist() == [0, 2]
    assert alg.cumsum(np.array([1, 2, 3]), True).tolist() == [0, 1, 3, 6]


# -- CSR queries -------------------------------------------------------------

def test_csr_queries():
    coo = rand_coo()
    csr = to_csr(coo)
    dense = as_scipy(coo).toarray()
    for r in range(coo.num_rows):
        # nnz counts duplicate coordinates individually
        assert alg.csr_get_row_nnz(csr, r) == int(dense[r].sum())
        cols = np.sort(alg.csr_get_row_column_indices(csr, r))
        oracle = np.repeat(np.nonzero(dense[r])[0],
                           dense[r][dense[r] > 0].astype(int))
        assert cols.tolist() == oracle.tolist()
    rows = np.arange(coo.num_rows)
    assert alg.csr_get_row_nnz(csr, rows).tolist() == \
        dense.sum(1).astype(int).tolist()
    for r in range(3):
        for c in range(5):
            assert alg.csr_is_nonzero(csr, r, c) == bool(dense[r, c])
    assert not alg.csr_has_duplicate(to_csr(
        alg.coo_coalesce(coo)[0]))


def test_csr_has_duplicate():
    coo = rand_coo(dup=True)
    assert alg.csr_has_duplicate(to_csr(coo)) == \
        alg.coo_has_duplicate(coo)
    assert alg.coo_has_duplicate(coo)


def test_csr_get_data_and_sort():
    coo = rand_coo(seed=3)
    csr = alg.csr_sort(to_csr(coo))
    assert alg.csr_is_sorted(csr)
    eids = csr_dense_eids(csr, coo.num_rows, coo.num_cols)
    rows = np.array([0, 5, 12, 3])
    cols = np.array([0, 7, 16, 2])
    got = alg.csr_get_data(csr, rows, cols)
    want = eids[rows, cols] - 1
    assert got.tolist() == want.tolist()
    # all-matches variant covers duplicates
    dcoo = rand_coo(dup=True, seed=4)
    dcsr = to_csr(dcoo)
    r0, c0 = int(dcoo.row[0]), int(dcoo.col[0])
    rr, cc, ee = alg.csr_get_data_and_indices(dcsr, [r0], [c0])
    key = np.asarray(dcoo.row).astype(np.int64) * dcoo.num_cols + \
        np.asarray(dcoo.col)
    want_e = np.sort(np.nonzero(key == r0 * dcoo.num_cols + c0)[0])
    assert np.sort(ee).tolist() == want_e.tolist()
    assert (rr == r0).all() and (cc == c0).all()


def test_csr_transpose_and_to_coo():
    coo = rand_coo(seed=5)
    csr = to_csr(coo)
    t = alg.csr_transpose(csr, coo.num_cols)
    a = as_scipy(coo).toarray()
    # transpose pattern matches; eids land at transposed coords
    rows_t = np.repeat(np.arange(coo.num_cols),
                       np.diff(np.asarray(t.indptr)))
    back = np.zeros_like(a)
    np.add.at(back, (np.asarray(t.indices), rows_t), 1)
    assert (back == a).all()
    # round-trip through COO in canonical edge order
    rt = alg.csr_to_coo(csr, coo.num_cols, data_as_order=True)
    srt = alg.coo_sort(alg.COO(coo.num_rows, coo.num_cols, coo.row,
                               coo.col, None))
    assert alg.coo_sort(rt).row.tolist() == srt.row.tolist()
    assert alg.coo_sort(rt).col.tolist() == srt.col.tolist()


def test_csr_slice_rows_range_and_array():
    coo = rand_coo(seed=6)
    csr = to_csr(coo)
    dense = as_scipy(coo).toarray()
    sl = alg.csr_slice_rows(csr, 3, 9)
    assert np.diff(np.asarray(sl.indptr)).tolist() == \
        dense[3:9].sum(1).astype(int).tolist()
    rows = np.array([9, 2, 2, 11])
    ga = alg.csr_slice_rows(csr, rows)
    assert np.diff(np.asarray(ga.indptr)).tolist() == \
        dense[rows].sum(1).astype(int).tolist()
    # columns of each gathered row match the original row's columns
    s0 = alg.csr_sort(ga)
    ip = np.asarray(s0.indptr)
    for j, r in enumerate(rows):
        for c in np.asarray(s0.indices)[ip[j]:ip[j + 1]]:
            assert dense[r, c] > 0


def test_csr_slice_matrix():
    coo = rand_coo(seed=7)
    csr = to_csr(coo)
    rows = np.array([0, 4, 8])
    cols = np.array([1, 3, 5, 7])
    sub, nc = alg.csr_slice_matrix(csr, rows, cols, coo.num_cols)
    dense = as_scipy(coo).toarray()[np.ix_(rows, cols)]
    got = np.zeros_like(dense)
    rows_s = np.repeat(np.arange(len(rows)),
                       np.diff(np.asarray(sub.indptr)))
    np.add.at(got, (rows_s, np.asarray(sub.indices)), 1)
    assert (got == dense).all() and nc == len(cols)


def test_csr_remove_and_reorder():
    coo = rand_coo(seed=8)
    csr = to_csr(coo)
    drop = np.array([0, 5, 17], np.int32)
    red = alg.csr_remove(csr, drop)
    assert len(np.asarray(red.eids)) == coo.nnz - 3
    assert not np.isin(np.asarray(red.eids), drop).any()
    perm_r = np.random.default_rng(0).permutation(coo.num_rows)
    perm_c = np.random.default_rng(1).permutation(coo.num_cols)
    ro = alg.csr_reorder(csr, perm_r, perm_c)
    a = as_scipy(coo).toarray()
    b = np.zeros_like(a)
    rows_o = np.repeat(np.arange(coo.num_rows),
                       np.diff(np.asarray(ro.indptr)))
    np.add.at(b, (rows_o, np.asarray(ro.indices)), 1)
    want = np.zeros_like(a)
    want[perm_r[:, None], perm_c[None, :]] = a
    assert (b == want).all()


def test_csr_row_wise_topk():
    coo = rand_coo(seed=9)
    csr = to_csr(coo)
    w = np.random.default_rng(2).random(coo.nnz)
    out = alg.csr_row_wise_topk(csr, np.arange(coo.num_rows), 2, w)
    # every selected edge's weight >= any unselected same-row edge
    for r in range(coo.num_rows):
        sel = np.asarray(out.eids)[np.asarray(out.row) == r]
        all_e = np.nonzero(np.asarray(coo.row) == r)[0]
        rest = np.setdiff1d(all_e, sel)
        if len(sel) and len(rest):
            assert w[sel].min() >= w[rest].max() - 1e-12
        assert len(sel) == min(2, len(all_e))
    asc = alg.csr_row_wise_topk(csr, [0], 1, w, ascending=True)
    e0 = np.nonzero(np.asarray(coo.row) == 0)[0]
    if len(e0):
        assert w[np.asarray(asc.eids)[0]] == w[e0].min()


def test_union_csr_and_to_simple():
    a = rand_coo(seed=10, nnz=20)
    b = rand_coo(seed=11, nnz=30)
    ca, cb = to_csr(a), to_csr(b)
    u = alg.union_csr([ca, cb])
    da = as_scipy(a).toarray() + as_scipy(b).toarray()
    rows_u = np.repeat(np.arange(a.num_rows),
                       np.diff(np.asarray(u.indptr)))
    got = np.zeros_like(da)
    np.add.at(got, (rows_u, np.asarray(u.indices)), 1)
    assert (got == da).all()
    assert sorted(np.asarray(u.eids).tolist()) == list(range(50))
    dup = rand_coo(dup=True, seed=12)
    simple, cnt, emap = alg.csr_to_simple(to_csr(dup))
    assert cnt.sum() == dup.nnz
    assert alg.csr_is_sorted(simple) and not alg.csr_has_duplicate(simple)
    assert len(emap) == dup.nnz
    # every original edge maps to the simple edge at its coords
    sip, six = np.asarray(simple.indptr), np.asarray(simple.indices)
    srow = np.repeat(np.arange(dup.num_rows), np.diff(sip))
    for e in range(dup.nnz):
        ne = emap[e]
        assert srow[ne] == dup.row[e] and six[ne] == dup.col[e]


# -- COO family ---------------------------------------------------------------

def test_coo_queries_and_sort():
    coo = rand_coo(seed=13)
    dense = as_scipy(coo).toarray()
    assert alg.coo_get_row_nnz(coo, 4) == int(dense[4].sum())
    assert alg.coo_get_row_nnz(coo, np.array([1, 2])).tolist() == \
        dense[[1, 2]].sum(1).astype(int).tolist()
    cols, data = alg.coo_get_row_data_and_indices(coo, 3)
    assert len(cols) == int(dense[3].sum())
    assert alg.coo_is_nonzero(coo, 3, int(cols[0])) if len(cols) else True
    s = alg.coo_sort(coo)
    assert alg.coo_is_sorted(s) == (True, True)
    assert alg.coo_is_sorted(alg.coo_sort(coo, sort_column=False))[0]
    t = alg.coo_transpose(coo)
    assert (as_scipy(t).toarray() == dense.T).all()


def test_coo_slice_and_coalesce_and_remove():
    coo = rand_coo(seed=14, dup=True)
    dense = as_scipy(coo).toarray()
    sl = alg.coo_slice_rows(coo, 2, 7)
    assert (as_scipy(sl).toarray() == dense[2:7]).all()
    rows = np.array([6, 1, 9])
    ga = alg.coo_slice_rows(coo, rows)
    assert (as_scipy(ga).toarray() == dense[rows]).all()
    cols = np.array([0, 2, 8, 13])
    sub = alg.coo_slice_matrix(coo, rows, cols)
    assert (as_scipy(sub).toarray() == dense[np.ix_(rows, cols)]).all()
    simple, cnt = alg.coo_coalesce(coo)
    assert (as_scipy(simple).toarray() == (dense > 0)).all()
    assert cnt.sum() == coo.nnz
    red = alg.coo_remove(coo, np.array([0, 1]))
    assert red.nnz == coo.nnz - 2 and not np.isin(red.data(),
                                                  [0, 1]).any()


def test_coo_reorder_topk():
    coo = rand_coo(seed=15)
    pr = np.random.default_rng(3).permutation(coo.num_rows)
    pc = np.random.default_rng(4).permutation(coo.num_cols)
    ro = alg.coo_reorder(coo, pr, pc)
    a = as_scipy(coo).toarray()
    want = np.zeros_like(a)
    want[pr[:, None], pc[None, :]] = a
    assert (as_scipy(ro).toarray() == want).all()
    w = np.random.default_rng(5).random(coo.nnz)
    out = alg.coo_row_wise_topk(coo, np.arange(coo.num_rows), 1, w)
    for r in range(coo.num_rows):
        sel = np.asarray(out.eids)[np.asarray(out.row) == r]
        all_e = np.nonzero(np.asarray(coo.row) == r)[0]
        if len(all_e):
            assert len(sel) == 1 and w[sel[0]] == w[all_e].max()


def test_line_graph_matches_transform():
    import dgl_tpu
    coo = rand_coo(nr=8, nc=8, nnz=16, seed=16)
    g = dgl_tpu.graph((coo.row.astype(np.int64),
                       coo.col.astype(np.int64)), num_nodes=8)
    for bt in (True, False):
        lg = dgl_tpu.line_graph(g, backtracking=bt)
        out = alg.coo_line_graph(coo, backtracking=bt)
        lr, lc = (np.asarray(x) for x in lg.edges())
        key = lambda r, c: sorted(zip(r.tolist(), c.tolist()))
        assert key(out.row, out.col) == key(lr, lc)


def test_unions():
    a = rand_coo(seed=17, nnz=10)
    b = rand_coo(seed=18, nnz=12)
    u = alg.union_coo([a, b])
    assert (as_scipy(u).toarray() ==
            as_scipy(a).toarray() + as_scipy(b).toarray()).all()
    assert sorted(u.data().tolist()) == list(range(22))
    d = alg.disjoint_union_coo([a, b])
    assert d.num_rows == 26 and d.num_cols == 34
    dd = as_scipy(d).toarray()
    assert (dd[:13, :17] == as_scipy(a).toarray()).all()
    assert (dd[13:, 17:] == as_scipy(b).toarray()).all()
    assert dd[:13, 17:].sum() == 0 and dd[13:, :17].sum() == 0


def test_empty_and_edge_cases():
    empty = alg.COO(4, 5, np.zeros(0, np.int32), np.zeros(0, np.int32),
                    None)
    csr = to_csr(empty)
    assert alg.csr_get_row_nnz(csr, 2) == 0
    assert not alg.csr_has_duplicate(csr)
    assert alg.csr_is_sorted(csr)
    assert alg.coo_is_sorted(empty) == (True, True)
    assert alg.csr_get_data(csr, 1, 1) == -1
    s, cnt = alg.coo_coalesce(empty)
    assert s.nnz == 0 and len(cnt) == 0
    uniq, outs = alg.relabel([np.zeros(0, np.int32)])
    assert len(uniq) == 0 and len(outs[0]) == 0


def test_trailing_empty_rows():
    # rows 5..9 empty: reduceat-style counting would index out of bounds
    coo = alg.COO(10, 6, np.array([0, 0, 2, 4], np.int32),
                  np.array([1, 3, 2, 5], np.int32), None)
    csr = to_csr(coo)
    sub, nc = alg.csr_slice_matrix(csr, np.arange(10), np.arange(6), 6)
    assert np.diff(np.asarray(sub.indptr)).sum() == 4
    red = alg.csr_remove(csr, np.array([0], np.int32))
    assert len(np.asarray(red.eids)) == 3
    assert np.asarray(red.indptr)[-1] == 3
    assert alg.csr_get_row_nnz(red, 0) == 1
