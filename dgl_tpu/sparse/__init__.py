"""``dgl_tpu.sparse``: the SparseMatrix API (reference ``dgl_sparse``
extension + ``python/dgl/sparse/``: ``sparse_matrix.py:8``,
``matmul.py:12,88,132``, ``sddmm.py:10``).

A ``SparseMatrix`` wraps COO arrays (+ lazy CSR/CSC) with autograd-visible
values; dense compute goes through the framework's fused kernels, while
structure-producing ops (spspmm) run host-side via scipy (the reference
uses cuSPARSE SpGEMM — same role).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.unitgraph import UnitGraph
from ..ops import gspmm_unit, gsddmm_unit, edge_softmax_unit

__all__ = [
    "SparseMatrix", "spmatrix", "from_coo", "from_csr", "from_csc",
    "val_like", "diag", "identity", "spmm", "sddmm", "spspmm", "matmul",
    "softmax", "bspmm",
]


@jax.tree_util.register_pytree_node_class
class SparseMatrix:
    """Sparse matrix with values; shape (num_rows, num_cols).

    ``row``/``col``: (nnz,) int32; ``val``: (nnz,) or (nnz, d).
    """

    def __init__(self, row, col, val, shape: Tuple[int, int]):
        self._row = row
        self._col = col
        self._val = val
        self._shape = tuple(shape)
        self._unit = None

    # pytree
    def tree_flatten(self):
        return (self._row, self._col, self._val), self._shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    # -- basic props -------------------------------------------------------
    @property
    def shape(self):
        return self._shape

    @property
    def nnz(self):
        return int(self._row.shape[0])

    @property
    def row(self):
        return self._row

    @property
    def col(self):
        return self._col

    @property
    def val(self):
        return self._val

    @property
    def dtype(self):
        return self._val.dtype

    def coo(self):
        return self._row, self._col

    def csr(self):
        u = self._as_unit().csr()
        return u.indptr, u.indices, u.eids

    def csc(self):
        u = self._as_unit().csc()
        return u.indptr, u.indices, u.eids

    def _as_unit(self) -> UnitGraph:
        # unit graph convention: row=src, col=dst; SpMM A@X reduces over
        # columns per row -> dst=row side
        if self._unit is None:
            self._unit = UnitGraph.from_coo(
                self._shape[1], self._shape[0], self._col, self._row)
        return self._unit

    # -- value ops ---------------------------------------------------------
    def with_values(self, val) -> "SparseMatrix":
        return SparseMatrix(self._row, self._col, val, self._shape)

    def __neg__(self):
        return self.with_values(-self._val)

    def __mul__(self, other):
        if isinstance(other, SparseMatrix):
            return _elementwise(self, other, "mul")
        return self.with_values(self._val * other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, SparseMatrix):
            return _elementwise(self, other, "div")
        return self.with_values(self._val / other)

    def __add__(self, other):
        if isinstance(other, SparseMatrix):
            return _sp_add(self, other)
        raise TypeError("sparse + dense not supported; use to_dense()")

    def __sub__(self, other):
        if isinstance(other, SparseMatrix):
            return _sp_add(self, other.with_values(-other.val))
        raise TypeError

    def __matmul__(self, other):
        return matmul(self, other)

    # -- reductions --------------------------------------------------------
    def reduce(self, dim: Optional[int] = None, rtype: str = "sum"):
        if dim is None:
            red = {"sum": jnp.sum, "smax": jnp.max, "smin": jnp.min,
                   "smean": jnp.mean}[rtype]
            return red(self._val)
        seg = self._row if dim == 1 else self._col
        n = self._shape[0] if dim == 1 else self._shape[1]
        fn = {"sum": jax.ops.segment_sum, "smax": jax.ops.segment_max,
              "smin": jax.ops.segment_min}.get(rtype)
        if fn is None:  # smean
            s = jax.ops.segment_sum(self._val, seg, num_segments=n)
            c = jax.ops.segment_sum(jnp.ones_like(self._val), seg,
                                    num_segments=n)
            return s / jnp.maximum(c, 1)
        return fn(self._val, seg, num_segments=n)

    def sum(self, dim=None):
        return self.reduce(dim, "sum")

    def smax(self, dim=None):
        return self.reduce(dim, "smax")

    def smin(self, dim=None):
        return self.reduce(dim, "smin")

    def smean(self, dim=None):
        return self.reduce(dim, "smean")

    # -- conversions -------------------------------------------------------
    def to_dense(self):
        val = self._val
        if val.ndim == 1:
            out = jnp.zeros(self._shape, val.dtype)
            return out.at[self._row, self._col].add(val)
        out = jnp.zeros(self._shape + val.shape[1:], val.dtype)
        return out.at[self._row, self._col].add(val)

    @property
    def T(self):
        return SparseMatrix(self._col, self._row, self._val,
                            (self._shape[1], self._shape[0]))

    def transpose(self):
        return self.T

    def coalesce(self) -> "SparseMatrix":
        """Merge duplicate coordinates (sum values)."""
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r.astype(np.int64) * self._shape[1] + c
        uniq, inv = np.unique(key, return_inverse=True)
        val = jax.ops.segment_sum(self._val, jnp.asarray(inv),
                                  num_segments=len(uniq))
        return SparseMatrix(
            jnp.asarray((uniq // self._shape[1]).astype(np.int32)),
            jnp.asarray((uniq % self._shape[1]).astype(np.int32)),
            val, self._shape)

    def has_duplicate(self) -> bool:
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r.astype(np.int64) * self._shape[1] + c
        return len(np.unique(key)) != len(key)

    def is_diag(self) -> bool:
        return bool(np.all(np.asarray(self._row) == np.asarray(self._col)))

    def __repr__(self):
        return (f"SparseMatrix(indices=..., values=..., "
                f"shape={self._shape}, nnz={self.nnz})")


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------


def from_coo(row, col, val=None, shape=None) -> SparseMatrix:
    row = jnp.asarray(row, jnp.int32)
    col = jnp.asarray(col, jnp.int32)
    if shape is None:
        shape = (int(row.max()) + 1 if row.shape[0] else 0,
                 int(col.max()) + 1 if col.shape[0] else 0)
    if val is None:
        val = jnp.ones(row.shape[0], jnp.float32)
    return SparseMatrix(row, col, jnp.asarray(val), shape)


def spmatrix(indices, val=None, shape=None) -> SparseMatrix:
    return from_coo(indices[0], indices[1], val, shape)


def from_csr(indptr, indices, val=None, shape=None) -> SparseMatrix:
    indptr_np = np.asarray(indptr)
    nnz = int(indptr_np[-1])
    row = np.repeat(np.arange(len(indptr_np) - 1), np.diff(indptr_np))
    if shape is None:
        shape = (len(indptr_np) - 1,
                 int(np.asarray(indices).max()) + 1 if nnz else 0)
    return from_coo(row, indices, val, shape)


def from_csc(indptr, indices, val=None, shape=None) -> SparseMatrix:
    indptr_np = np.asarray(indptr)
    col = np.repeat(np.arange(len(indptr_np) - 1), np.diff(indptr_np))
    if shape is None:
        shape = (int(np.asarray(indices).max()) + 1,
                 len(indptr_np) - 1)
    return from_coo(indices, col, val, shape)


def val_like(mat: SparseMatrix, val) -> SparseMatrix:
    return mat.with_values(jnp.asarray(val))


def diag(val, shape=None) -> SparseMatrix:
    val = jnp.asarray(val)
    n = val.shape[0]
    shape = shape or (n, n)
    idx = jnp.arange(n, dtype=jnp.int32)
    return SparseMatrix(idx, idx, val, shape)


def identity(shape, d=None, dtype=jnp.float32) -> SparseMatrix:
    n = min(shape)
    return diag(jnp.ones((n,) if d is None else (n, d), dtype), shape)


# ---------------------------------------------------------------------------
# compute
# ---------------------------------------------------------------------------


def spmm(A: SparseMatrix, X) -> jnp.ndarray:
    """Dense = sparse @ dense (reference ``matmul.py:12``)."""
    unit = A._as_unit()   # src=col-space, dst=row-space
    if A.val.ndim == 1:
        w = A.val
    else:
        raise ValueError("spmm requires scalar values; use bspmm")
    # out[r] = sum_nnz val * X[c]  -> gspmm over unit (src=c, dst=r)
    return gspmm_unit(unit, "mul", "sum", X, w[:, None])


def bspmm(A: SparseMatrix, X) -> jnp.ndarray:
    """Batched spmm for (nnz, H) values against (n, H, F) dense."""
    unit = A._as_unit()
    return gspmm_unit(unit, "mul", "sum", X, A.val[..., None])


def sddmm(A: SparseMatrix, X1, X2) -> SparseMatrix:
    """A * (X1 @ X2) sampled at nnz (reference ``sddmm.py:10``)."""
    unit = A._as_unit()
    out = gsddmm_unit(unit, "dot", X1, jnp.swapaxes(X2, 0, 1),
                      lhs_target="v", rhs_target="u")
    out = out.reshape(-1)
    return A.with_values(A.val * out)


def spspmm(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Sparse @ sparse (reference cuSPARSE SpGEMM; here scipy host-side)."""
    import scipy.sparse as sp
    a = sp.coo_matrix((np.asarray(A.val), (np.asarray(A.row),
                                           np.asarray(A.col))),
                      shape=A.shape).tocsr()
    b = sp.coo_matrix((np.asarray(B.val), (np.asarray(B.row),
                                           np.asarray(B.col))),
                      shape=B.shape).tocsr()
    c = (a @ b).tocoo()
    return from_coo(c.row, c.col, jnp.asarray(c.data),
                    (A.shape[0], B.shape[1]))


def matmul(A, B):
    """Polymorphic matmul (reference ``matmul.py:132``)."""
    if isinstance(A, SparseMatrix) and isinstance(B, SparseMatrix):
        return spspmm(A, B)
    if isinstance(A, SparseMatrix):
        return spmm(A, B)
    if isinstance(B, SparseMatrix):
        return spmm(B.T, jnp.swapaxes(A, -1, -2)).swapaxes(-1, -2)
    return A @ B


def softmax(A: SparseMatrix, dim: int = 1) -> SparseMatrix:
    """Row-wise (dim=1) softmax over nonzeros (reference
    ``dgl_sparse/src/softmax.cc``)."""
    unit = A._as_unit()
    val = A.val if A.val.ndim > 1 else A.val[:, None]
    if dim == 1:
        out = edge_softmax_unit(unit, val, norm_by="dst")
    else:
        out = edge_softmax_unit(unit, val, norm_by="src")
    return A.with_values(out.reshape(A.val.shape))


def _elementwise(A: SparseMatrix, B: SparseMatrix, op: str) -> SparseMatrix:
    if A.shape != B.shape:
        raise ValueError("shape mismatch")
    # align coordinates (requires same sparsity or mul semantics = inner
    # join)
    ka = (np.asarray(A.row).astype(np.int64) * A.shape[1]
          + np.asarray(A.col))
    kb = (np.asarray(B.row).astype(np.int64) * B.shape[1]
          + np.asarray(B.col))
    if len(ka) == len(kb) and np.array_equal(ka, kb):
        if op == "mul":
            return A.with_values(A.val * B.val)
        return A.with_values(A.val / B.val)
    common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
    va = jnp.take(A.val, jnp.asarray(ia), axis=0)
    vb = jnp.take(B.val, jnp.asarray(ib), axis=0)
    v = va * vb if op == "mul" else va / vb
    return from_coo((common // A.shape[1]).astype(np.int32),
                    (common % A.shape[1]).astype(np.int32), v, A.shape)


def _sp_add(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    if A.shape != B.shape:
        raise ValueError("shape mismatch")
    row = jnp.concatenate([A.row, B.row])
    col = jnp.concatenate([A.col, B.col])
    val = jnp.concatenate([A.val, B.val])
    return SparseMatrix(row, col, val, A.shape).coalesce()
