"""dgl.sparse parity additions: module-level ops, matrix methods,
torch interop, and the csr/csc orientation fix."""
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu.sparse as S


def _A():
    return S.from_coo(np.array([0, 1, 1, 2]), np.array([0, 2, 4, 0]),
                      jnp.asarray([1., 2., 3., 4.]), shape=(3, 6))


def test_unary_and_scalar_ops():
    A = _A()
    assert S.is_scalar(3) and not S.is_scalar(A.val)
    D = S.diag(jnp.asarray([1., 2., 4.]))
    np.testing.assert_allclose(np.asarray(S.inv(D).val), [1, .5, .25])
    np.testing.assert_allclose(np.asarray(S.power(A, 2.).val),
                               [1, 4, 9, 16])
    np.testing.assert_allclose(np.asarray(S.neg(A).val), [-1, -2, -3, -4])


def test_broadcast_v():
    A = _A()
    np.testing.assert_allclose(
        np.asarray(S.sp_mul_v(A, jnp.arange(6.0)).val), [0, 4, 12, 0])
    np.testing.assert_allclose(
        np.asarray(S.sp_add_v(A, jnp.arange(3.0)[:, None]).val),
        [1, 3, 4, 6])
    np.testing.assert_allclose(
        np.asarray(S.sp_sub_v(A, jnp.zeros(6)).val), [1, 2, 3, 4])
    with pytest.raises(ValueError):
        S.sp_div_v(A, jnp.zeros(5))


def test_reductions():
    A = _A()
    np.testing.assert_allclose(np.asarray(S.sprod(A, dim=1)),
                               [1., 6., 4.], rtol=1e-4)
    assert float(S.sum(A)) == 10.0
    np.testing.assert_allclose(np.asarray(S.smax(A, dim=1)), [1., 3., 4.])


def test_matrix_methods():
    A = _A()
    assert A.indices().shape == (2, 4)
    assert A.t().shape == (6, 3)
    _ = A.cpu(), A.float(), A.device, A.long(), A.int().val.dtype
    sub = A.index_select(0, np.array([1, 2]))
    assert sub.shape == (2, 6) and sub.nnz == 3
    rs = A.range_select(1, slice(0, 3))
    assert rs.shape == (3, 3) and rs.nnz == 3
    np.testing.assert_allclose(np.asarray(rs.to_dense()),
                               np.asarray(A.to_dense())[:, :3])
    sam = A.sample(0, 1)
    assert sam.nnz == 3  # one per nonempty row
    sam_b = A.sample(0, 2, replace=True, bias=True)
    assert sam_b.nnz == 6


def test_compact():
    A = _A()
    comp, ids = A.compact(1)
    assert comp.shape == (3, 3)
    assert list(np.asarray(ids)) == [0, 2, 4]
    comp2, ids2 = A.compact(1, leading_indices=np.array([4]))
    assert list(np.asarray(ids2)) == [4, 0, 2]
    # relabeled matrix keeps the same dense content modulo column perm
    d = np.asarray(A.to_dense())
    d2 = np.asarray(comp2.to_dense())
    np.testing.assert_allclose(d2, d[:, [4, 0, 2]])


def test_csr_csc_orientation():
    A = _A()
    ip, ix, ei = A.csr()
    assert len(np.asarray(ip)) == A.shape[0] + 1  # rowptr over rows
    ip2, ix2, ei2 = A.csc()
    assert len(np.asarray(ip2)) == A.shape[1] + 1


def test_torch_interop_roundtrip():
    torch = pytest.importorskip("torch")
    A = _A()
    for conv in (S.to_torch_sparse_coo, S.to_torch_sparse_csr,
                 S.to_torch_sparse_csc):
        t = conv(A)
        back = S.from_torch_sparse(t) if t.layout in (
            torch.sparse_coo, torch.sparse_csr) else None
        np.testing.assert_allclose(np.asarray(t.to_dense()),
                                   np.asarray(A.to_dense()))
        if back is not None:
            np.testing.assert_allclose(np.asarray(back.to_dense()),
                                       np.asarray(A.to_dense()))


def test_bsddmm():
    A = _A()
    out = S.bsddmm(A, jnp.ones((3, 2, 2)), jnp.ones((2, 6, 2)))
    assert out.val.shape == (4, 2)


def test_spspmm_values_and_gradients():
    """spspmm values + dA/dB sampled-product gradients vs dense oracle
    (VERDICT r1 item 9; ref dgl_sparse/src/spspmm.cc)."""
    import numpy as np, jax, jax.numpy as jnp
    from dgl_tpu import sparse as dglsp
    rng = np.random.default_rng(0)
    m, n, k, nnz = 20, 15, 18, 60
    ar, ac = rng.integers(0, m, nnz), rng.integers(0, n, nnz)
    # dedupe A/B coords (from_coo keeps duplicates; simplify the oracle)
    au = np.unique(ar * n + ac); ar, ac = au // n, au % n
    br, bc = rng.integers(0, n, nnz), rng.integers(0, k, nnz)
    bu = np.unique(br * k + bc); br, bc = bu // k, bu % k
    av = jnp.asarray(rng.normal(size=len(ar)).astype(np.float32))
    bv = jnp.asarray(rng.normal(size=len(br)).astype(np.float32))
    A = dglsp.from_coo(ar, ac, av, (m, n))
    B = dglsp.from_coo(br, bc, bv, (n, k))

    C = dglsp.spspmm(A, B)
    dense = np.asarray(A.to_dense()) @ np.asarray(B.to_dense())
    np.testing.assert_allclose(np.asarray(C.to_dense()), dense,
                               rtol=1e-5, atol=1e-5)

    w = jnp.asarray(rng.normal(size=(len(np.asarray(C.row)),))
                    .astype(np.float32))

    def loss(av, bv):
        A2 = dglsp.from_coo(ar, ac, av, (m, n))
        B2 = dglsp.from_coo(br, bc, bv, (n, k))
        return (dglsp.spspmm(A2, B2).val * w).sum()

    ga, gb = jax.grad(loss, argnums=(0, 1))(av, bv)

    # dense oracle: dC scattered at C pattern; dA = dC @ B^T at A pattern
    dC = np.zeros((m, k), np.float32)
    dC[np.asarray(C.row), np.asarray(C.col)] = np.asarray(w)
    dA_dense = dC @ np.asarray(B.to_dense()).T
    dB_dense = np.asarray(A.to_dense()).T @ dC
    np.testing.assert_allclose(np.asarray(ga), dA_dense[ar, ac],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), dB_dense[br, bc],
                               rtol=1e-4, atol=1e-4)


def test_spspmm_bounded_jit_scan_grad():
    """spspmm_bounded (reference csr_mm.cc:137 as static-shape ESC):
    scipy parity, full jit/scan safety, AD through values, NaN
    poisoning on bound overflow, and the offline-guard error for the
    host spspmm under tracing."""
    import jax
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    m, k, n, nnz_a, nnz_b = 23, 17, 19, 60, 55
    ar, ac = rng.integers(0, m, nnz_a), rng.integers(0, k, nnz_a)
    br, bc = rng.integers(0, k, nnz_b), rng.integers(0, n, nnz_b)
    av = rng.normal(size=nnz_a).astype(np.float32)
    bv = rng.normal(size=nnz_b).astype(np.float32)
    A = S.from_coo(jnp.asarray(ar), jnp.asarray(ac), jnp.asarray(av),
                   (m, k))
    B = S.from_coo(jnp.asarray(br), jnp.asarray(bc), jnp.asarray(bv),
                   (k, n))
    Cs = (sp.coo_matrix((av, (ar, ac)), (m, k))
          @ sp.coo_matrix((bv, (br, bc)), (k, n))).tocoo()
    b_row_max = int(np.bincount(br, minlength=k).max())
    out_nnz = Cs.nnz + 25          # static bound above the true count

    @jax.jit
    def run(A, B):
        return S.spspmm_bounded(A, B, out_nnz, b_row_max)

    C, valid = run(A, B)
    dense = np.zeros((m, n), np.float32)
    np.add.at(dense, (np.asarray(C.row), np.asarray(C.col)),
              np.asarray(C.val) * np.asarray(valid))
    np.testing.assert_allclose(dense, Cs.toarray(), rtol=1e-5,
                               atol=1e-5)
    assert int(valid.sum()) == Cs.nnz

    # under lax.scan (the in-loop use the host spspmm cannot serve)
    def body(c, _):
        C2, v2 = S.spspmm_bounded(A, B, out_nnz, b_row_max)
        return c + (C2.val * v2).sum(), None
    tot, _ = jax.lax.scan(body, 0.0, None, length=3)
    np.testing.assert_allclose(float(tot), 3 * Cs.toarray().sum(),
                               rtol=1e-4)

    # gradients wrt A.val match dense oracle
    def loss(av):
        A2 = S.from_coo(A.row, A.col, av, (m, k))
        C2, v2 = S.spspmm_bounded(A2, B, out_nnz, b_row_max)
        return (C2.val * v2).sum()
    g = np.asarray(jax.grad(loss)(jnp.asarray(av)))
    # d/dav[p] sum(C) = sum_j B[ac[p], j]
    want = np.asarray(
        sp.coo_matrix((bv, (br, bc)), (k, n)).sum(1)).ravel()[ac]
    np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)

    # exceeding b_row_max poisons with NaN (never silent truncation);
    # the realized bound is over B rows A actually references
    realized = int(np.bincount(br, minlength=k)[ac].max())
    C3, _ = S.spspmm_bounded(A, B, out_nnz, max(realized - 1, 1))
    assert np.isnan(np.asarray(C3.val)).any()
    # exceeding out_nnz poisons too
    C4, _ = S.spspmm_bounded(A, B, max(Cs.nnz - 1, 1), b_row_max)
    assert np.isnan(np.asarray(C4.val)).any()

    # the host spspmm raises a CLEAR error under tracing
    with pytest.raises(TypeError, match="spspmm_bounded"):
        jax.jit(lambda a, b: S.spspmm(a, b))(A, B)
