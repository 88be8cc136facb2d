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
    "val_like", "diag", "identity", "spmm", "sddmm", "spspmm",
    "spspmm_bounded", "matmul",
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
        """(rowptr, col_indices, value_ids) — note the internal unit
        graph stores (col, row), so the matrix's CSR is the unit's
        CSC."""
        u = self._as_unit().csc()
        return u.indptr, u.indices, u.eids

    def csc(self):
        """(colptr, row_indices, value_ids)."""
        u = self._as_unit().csr()
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

    # -- reference-parity method surface -------------------------------
    def indices(self):
        """(2, nnz) stacked COO indices (reference ``indices``)."""
        return jnp.stack([jnp.asarray(self._row), jnp.asarray(self._col)])

    def t(self):
        return self.T

    def to(self, device=None):
        """Move values/indices to a device (reference ``to``)."""
        if device is None:
            return self
        return SparseMatrix(jax.device_put(jnp.asarray(self._row), device),
                            jax.device_put(jnp.asarray(self._col), device),
                            jax.device_put(self._val, device), self._shape)

    def cpu(self):
        return self.to(jax.devices("cpu")[0])

    def cuda(self):
        """Reference API; maps to the accelerator device here."""
        return self.to(jax.devices()[0])

    @property
    def device(self):
        v = jnp.asarray(self._val)
        return next(iter(v.devices())) if hasattr(v, "devices") else None

    def float(self):
        return self.with_values(jnp.asarray(self._val, jnp.float32))

    def double(self):
        return self.with_values(jnp.asarray(self._val, jnp.float64)
                                if jax.config.jax_enable_x64 else
                                jnp.asarray(self._val, jnp.float32))

    def int(self):
        return self.with_values(jnp.asarray(self._val, jnp.int32))

    def long(self):
        return self.with_values(self._val.astype(
            jnp.int64 if jax.config.jax_enable_x64 else jnp.int32))

    def index_select(self, dim: int, index):
        """Sub-matrix of the given row (dim=0) / column (dim=1) ids, in
        ``index`` order, duplicates allowed (reference
        ``sparse_matrix.py:482``).  No autograd."""
        index = np.asarray(index)
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r if dim == 0 else c
        parts_r, parts_c, parts_v = [], [], []
        for new_id, old_id in enumerate(index):
            sel = np.nonzero(key == old_id)[0]
            if dim == 0:
                parts_r.append(np.full(len(sel), new_id, r.dtype))
                parts_c.append(c[sel])
            else:
                parts_r.append(r[sel])
                parts_c.append(np.full(len(sel), new_id, c.dtype))
            parts_v.append(sel)
        sel_all = np.concatenate(parts_v) if parts_v else np.zeros(
            0, np.int64)
        val = jnp.take(self._val, jnp.asarray(sel_all.astype(np.int32)),
                       axis=0)
        shape = ((len(index), self._shape[1]) if dim == 0
                 else (self._shape[0], len(index)))
        return SparseMatrix(
            jnp.asarray(np.concatenate(parts_r).astype(np.int32)
                        if parts_r else np.zeros(0, np.int32)),
            jnp.asarray(np.concatenate(parts_c).astype(np.int32)
                        if parts_c else np.zeros(0, np.int32)),
            val, shape)

    def range_select(self, dim: int, index: slice):
        """Sub-matrix of a contiguous id range (reference
        ``sparse_matrix.py:533``)."""
        start = index.start or 0
        stop = index.stop if index.stop is not None else (
            self._shape[dim])
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r if dim == 0 else c
        sel = np.nonzero((key >= start) & (key < stop))[0]
        nr = r[sel] - (start if dim == 0 else 0)
        nc = c[sel] - (start if dim == 1 else 0)
        shape = ((stop - start, self._shape[1]) if dim == 0
                 else (self._shape[0], stop - start))
        return SparseMatrix(jnp.asarray(nr.astype(np.int32)),
                            jnp.asarray(nc.astype(np.int32)),
                            jnp.take(self._val,
                                     jnp.asarray(sel.astype(np.int32)),
                                     axis=0), shape)

    def sample(self, dim: int, fanout: int, ids=None, replace=False,
               bias=False):
        """Per-row/column fanout sampling of nonzeros (reference
        ``sparse_matrix.py:589``); ``bias=True`` weights picks by the
        values.  No autograd."""
        from ..utils import np_rng
        rng = np_rng()
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r if dim == 0 else c
        ids = np.arange(self._shape[dim]) if ids is None else \
            np.asarray(ids)
        v = np.asarray(self._val)
        picks = []
        for i in ids:
            sel = np.nonzero(key == i)[0]
            if len(sel) == 0:
                continue
            p = None
            if bias:
                w = np.abs(v[sel]).astype(np.float64).reshape(len(sel),
                                                              -1).sum(1)
                p = w / w.sum() if w.sum() > 0 else None
            if replace:
                picks.append(rng.choice(sel, size=fanout, replace=True,
                                        p=p))
            else:
                k = min(fanout, len(sel))
                picks.append(rng.choice(sel, size=k, replace=False, p=p))
        sel_all = (np.concatenate(picks) if picks
                   else np.zeros(0, np.int64))
        return SparseMatrix(
            jnp.asarray(r[sel_all].astype(np.int32)),
            jnp.asarray(c[sel_all].astype(np.int32)),
            jnp.take(self._val, jnp.asarray(sel_all.astype(np.int32)),
                     axis=0), self._shape)

    def compact(self, dim: int, leading_indices=None):
        """Drop empty rows/columns and relabel (reference
        ``sparse_matrix.py:683``; mimics ``dgl.to_block``).  Returns
        (matrix, original ids of the relabeled dimension)."""
        r = np.asarray(self._row)
        c = np.asarray(self._col)
        key = r if dim == 0 else c
        lead = (np.asarray(leading_indices)
                if leading_indices is not None else np.zeros(0, np.int64))
        nonzero_ids = np.unique(key)
        rest = nonzero_ids[~np.isin(nonzero_ids, lead)]
        order = np.concatenate([lead, rest]).astype(np.int64)
        remap = {int(o): i for i, o in enumerate(order)}
        new_key = np.asarray([remap[int(k)] for k in key], np.int32)
        shape = ((len(order), self._shape[1]) if dim == 0
                 else (self._shape[0], len(order)))
        if dim == 0:
            out = SparseMatrix(jnp.asarray(new_key), jnp.asarray(c),
                               self._val, shape)
        else:
            out = SparseMatrix(jnp.asarray(r), jnp.asarray(new_key),
                               self._val, shape)
        return out, jnp.asarray(order)

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


def spspmm_bounded(A: SparseMatrix, B: SparseMatrix, out_nnz: int,
                   b_row_max: int):
    """JIT-SAFE SpGEMM with static output bounds (reference
    ``src/array/cpu/csr_mm.cc:137`` — the two-pass nnz-count + fill,
    re-designed as a static-shape expand-sort-compress for XLA).

    Unlike :func:`spspmm` (host structural pass — offline use only),
    this runs entirely inside jit/scan: scalar-valued A (M, K) @ B
    (K, N) with caller-supplied static bounds:

    * ``b_row_max`` — max nnz of any row of B (expansion width);
    * ``out_nnz``  — max distinct coordinates of C.

    Returns ``(C, valid)``: a SparseMatrix with exactly ``out_nnz``
    stored entries sorted by (row, col) — padding entries carry
    coordinate (0, 0) with value 0 and ``valid`` False (duplicates with
    zero value are inert for every linear consumer: spmm/sddmm/dense) —
    and the (out_nnz,) validity mask.  If either bound is exceeded the
    VALUES COME BACK NaN (a detectable failure, never a silent
    truncation).  Differentiable in A.val/B.val (the sort permutation
    depends only on structure)."""
    ar = jnp.asarray(A.row, jnp.int32)
    ac = jnp.asarray(A.col, jnp.int32)
    ncols = B.shape[1]
    # B sorted by (row, col)
    bo = jnp.argsort(jnp.asarray(B.col, jnp.int32), stable=True)
    br1 = jnp.take(jnp.asarray(B.row, jnp.int32), bo)
    bo = jnp.take(bo, jnp.argsort(br1, stable=True))
    br_s = jnp.take(jnp.asarray(B.row, jnp.int32), bo)
    bc_s = jnp.take(jnp.asarray(B.col, jnp.int32), bo)
    bv_s = jnp.take(jnp.asarray(B.val), bo, axis=0)
    indptr = jnp.searchsorted(br_s, jnp.arange(B.shape[0] + 1,
                                               dtype=jnp.int32))
    start = jnp.take(indptr, ac)
    cnt = jnp.take(indptr, ac + 1) - start
    over_b = jnp.max(cnt, initial=0) > b_row_max
    j = jnp.arange(b_row_max, dtype=jnp.int32)
    pb = jnp.clip(start[:, None] + j[None], 0, br_s.shape[0] - 1)
    validp = j[None] < cnt[:, None]                   # (nnzA, bmax)
    prod = (jnp.asarray(A.val)[:, None] * bv_s[pb]) * validp
    ci = jnp.where(validp, jnp.broadcast_to(ar[:, None], pb.shape),
                   A.shape[0])                        # sentinel row
    cj = jnp.where(validp, bc_s[pb], 0)
    ci, cj, prod = ci.reshape(-1), cj.reshape(-1), prod.reshape(-1)
    # stable two-key sort: by col, then by row (sentinels sort last)
    o1 = jnp.argsort(cj, stable=True)
    order = jnp.take(o1, jnp.argsort(jnp.take(ci, o1), stable=True))
    ci_s = jnp.take(ci, order)
    cj_s = jnp.take(cj, order)
    v_s = jnp.take(prod, order)
    new = jnp.concatenate([
        jnp.ones(1, bool),
        (ci_s[1:] != ci_s[:-1]) | (cj_s[1:] != cj_s[:-1])])
    seg = jnp.cumsum(new) - 1
    sent = ci_s == A.shape[0]
    seg = jnp.where(sent, out_nnz, seg)              # drop sentinels
    over_n = jnp.max(jnp.where(sent, -1, seg), initial=-1) >= out_nnz
    vals = jax.ops.segment_sum(v_s, seg, num_segments=out_nnz)
    crow = jnp.zeros(out_nnz, jnp.int32).at[seg].set(ci_s, mode="drop")
    ccol = jnp.zeros(out_nnz, jnp.int32).at[seg].set(cj_s, mode="drop")
    valid = jnp.zeros(out_nnz, bool).at[seg].set(True, mode="drop")
    vals = vals + jnp.where(over_b | over_n, jnp.nan, 0.0)
    return (SparseMatrix(crow, ccol, vals, (A.shape[0], ncols)), valid)


def _spspmm_triples(A: SparseMatrix, B: SparseMatrix):
    """Host structural pass for SpGEMM: the (pa, pb, pc) contribution
    triples such that C.val[pc] += A.val[pa] * B.val[pb], plus C's
    coordinate pattern.  Structure-only (no values touched)."""
    if isinstance(jnp.asarray(A.row), jax.core.Tracer) or isinstance(
            jnp.asarray(B.row), jax.core.Tracer):
        raise TypeError(
            "spspmm's structural pass runs on the host and cannot trace "
            "under jit/scan/grad — it is an OFFLINE op (SURVEY §7). "
            "Inside jit use sparse.spspmm_bounded(A, B, out_nnz, "
            "b_row_max), the static-shape SpGEMM.")
    ar = np.asarray(A.row).astype(np.int64)
    ac = np.asarray(A.col).astype(np.int64)
    br = np.asarray(B.row).astype(np.int64)
    bc = np.asarray(B.col).astype(np.int64)
    # B in row-sorted order
    border = np.argsort(br, kind="stable")
    br_s, bc_s = br[border], bc[border]
    indptr = np.zeros(B.shape[0] + 1, np.int64)
    np.add.at(indptr, br_s + 1, 1)
    indptr = np.cumsum(indptr)
    # one triple per (A-nnz p, B-entry of row A.col[p])
    cnt = (indptr[ac + 1] - indptr[ac])
    pa = np.repeat(np.arange(len(ar)), cnt)
    starts = np.repeat(indptr[ac], cnt)
    offs = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    pb_sorted = starts + offs
    pb = border[pb_sorted]
    ci = ar[pa]
    cj = bc_s[pb_sorted]
    key = ci * B.shape[1] + cj
    uniq, pc = np.unique(key, return_inverse=True)
    return pa, pb, pc, uniq // B.shape[1], uniq % B.shape[1], len(uniq)


def spspmm(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """Sparse @ sparse with differentiable values (reference
    ``dgl_sparse/src/spspmm.cc`` / cuSPARSE SpGEMM).

    The structural pass (C's pattern + contribution triples) runs on the
    host once; the value computation is a pure segment-sum over static
    index arrays, so JAX AD produces the sampled-product gradients
    dA = (dC @ Bᵀ)|pattern(A) and dB = (Aᵀ @ dC)|pattern(B)
    automatically — no custom_vjp needed."""
    pa, pb, pc, crow, ccol, nnz_c = _spspmm_triples(A, B)
    if len(pa) == 0:
        return from_coo(np.zeros(0, np.int64), np.zeros(0, np.int64),
                        jnp.zeros(0, A.val.dtype),
                        (A.shape[0], B.shape[1]))
    vals = jax.ops.segment_sum(
        jnp.take(A.val, jnp.asarray(pa)) * jnp.take(B.val,
                                                    jnp.asarray(pb)),
        jnp.asarray(pc), num_segments=nnz_c)
    return from_coo(crow, ccol, vals, (A.shape[0], B.shape[1]))


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


# ---------------------------------------------------------------------------
# reference module-level API completion (python/dgl/sparse/*)
# ---------------------------------------------------------------------------

def is_scalar(x) -> bool:
    """True for python/np/jnp scalars (reference ``sparse/utils.py:8``)."""
    return np.isscalar(x) or (hasattr(x, "ndim") and x.ndim == 0)


def neg(A: SparseMatrix) -> SparseMatrix:
    return -A


def inv(A: SparseMatrix) -> SparseMatrix:
    """Inverse of a square DIAGONAL matrix (reference
    ``sparse/unary_op.py:29``)."""
    assert A.is_diag(), "inv requires a diagonal matrix"
    assert A.shape[0] == A.shape[1], "inv requires a square matrix"
    assert A.val.ndim == 1, "inv only supports 1-D values"
    return A.with_values(1.0 / A.val)


def power(A: SparseMatrix, scalar) -> SparseMatrix:
    """Elementwise power by a scalar (reference ``sp_power``)."""
    if not is_scalar(scalar):
        raise TypeError("power expects a scalar")
    return A.with_values(A.val ** scalar)


def add(A, B):
    return A + B


def sub(A, B):
    return A - B


def mul(A, B):
    return A * B


def div(A, B):
    return A / B


# sparse-vs-scalar / sparse-vs-sparse explicit names
sp_add = add
sp_sub = sub
sp_mul = mul
sp_div = div
sp_power = power
spsp_add = add
spsp_mul = mul
spsp_div = div


def _broadcast_v(A: SparseMatrix, v, op: str) -> SparseMatrix:
    """Broadcast a vector along rows or columns of ``A``'s nonzeros
    (reference ``sparse/broadcast.py sp_broadcast_v``): v of shape
    (1, ncols)/(ncols,) broadcasts along rows, (nrows, 1) along cols."""
    v = jnp.asarray(v)
    if v.ndim == 2 and v.shape[0] == 1:       # (1, N) -> per-column
        picked = jnp.take(v.reshape(-1), A.col, axis=0)
    elif v.ndim == 2 and v.shape[1] == 1:     # (M, 1) -> per-row
        picked = jnp.take(v.reshape(-1), A.row, axis=0)
    elif v.ndim == 1:
        if v.shape[0] == A.shape[1]:
            picked = jnp.take(v, A.col, axis=0)
        elif v.shape[0] == A.shape[0]:
            picked = jnp.take(v, A.row, axis=0)
        else:
            raise ValueError("vector length matches neither dim")
    else:
        raise ValueError(f"bad vector shape {v.shape}")
    if A.val.ndim > 1:
        picked = picked.reshape((-1,) + (1,) * (A.val.ndim - 1))
    if op == "add":
        return A.with_values(A.val + picked)
    if op == "sub":
        return A.with_values(A.val - picked)
    if op == "mul":
        return A.with_values(A.val * picked)
    if op == "div":
        return A.with_values(A.val / picked)
    raise ValueError(op)


def sp_broadcast_v(A: SparseMatrix, v, op: str) -> SparseMatrix:
    return _broadcast_v(A, v, op)


def sp_add_v(A, v):
    return _broadcast_v(A, v, "add")


def sp_sub_v(A, v):
    return _broadcast_v(A, v, "sub")


def sp_mul_v(A, v):
    return _broadcast_v(A, v, "mul")


def sp_div_v(A, v):
    return _broadcast_v(A, v, "div")


def reduce(A: SparseMatrix, dim=None, rtype: str = "sum"):
    return A.reduce(dim, rtype)


def sum(A: SparseMatrix, dim=None):  # noqa: A001 - reference name
    return A.sum(dim)


def smax(A: SparseMatrix, dim=None):
    return A.smax(dim)


def smin(A: SparseMatrix, dim=None):
    return A.smin(dim)


def smean(A: SparseMatrix, dim=None):
    return A.smean(dim)


def sprod(A: SparseMatrix, dim=None):
    """Product reduction over nonzeros (reference ``reduction.py``)."""
    val = A.val
    if dim is None:
        return jnp.prod(val, axis=0)
    seg = A.row if dim == 1 else A.col
    n = A.shape[0] if dim == 1 else A.shape[1]
    # no segment_prod primitive: log-space magnitude + sign parity
    logs = jax.ops.segment_sum(jnp.log(jnp.abs(val) + 1e-30),
                               jnp.asarray(seg), num_segments=n)
    neg = jax.ops.segment_sum((val < 0).astype(jnp.int32),
                              jnp.asarray(seg), num_segments=n)
    has = jax.ops.segment_sum(jnp.ones_like(val, jnp.int32),
                              jnp.asarray(seg), num_segments=n)
    out = jnp.exp(logs) * jnp.where(neg % 2 == 1, -1.0, 1.0)
    return jnp.where(has > 0, out, 1.0)


def bsddmm(A: SparseMatrix, X1, X2) -> SparseMatrix:
    """Batched SDDMM (reference ``sddmm.py bsddmm``): X1 (M, K, B),
    X2 (K, N, B) -> values (nnz, B)."""
    outs = [sddmm(A, X1[..., b], X2[..., b]).val
            for b in range(X1.shape[-1])]
    return A.with_values(jnp.stack(outs, axis=-1))


def from_torch_sparse(t) -> SparseMatrix:
    """Build from a torch sparse COO/CSR tensor (reference
    ``sparse_matrix.py from_torch_sparse``)."""
    if t.layout.__repr__().endswith("sparse_coo"):
        t = t.coalesce()
        idx = t.indices().numpy()
        return from_coo(idx[0], idx[1], jnp.asarray(t.values().numpy()),
                        tuple(t.shape))
    if t.layout.__repr__().endswith("sparse_csr"):
        return from_csr(t.crow_indices().numpy(),
                        t.col_indices().numpy(),
                        jnp.asarray(t.values().numpy()), tuple(t.shape))
    raise ValueError(f"unsupported torch layout {t.layout}")


def to_torch_sparse_coo(A: SparseMatrix):
    import torch
    idx = np.stack([np.asarray(A.row), np.asarray(A.col)])
    return torch.sparse_coo_tensor(torch.from_numpy(idx.astype(np.int64)),
                                   torch.from_numpy(np.asarray(A.val)),
                                   size=A.shape)


def to_torch_sparse_csr(A: SparseMatrix):
    import torch
    csr = A.csr()
    return torch.sparse_csr_tensor(
        torch.from_numpy(np.asarray(csr[0]).astype(np.int64)),
        torch.from_numpy(np.asarray(csr[1]).astype(np.int64)),
        torch.from_numpy(np.asarray(jnp.take(A.val, jnp.asarray(csr[2]),
                                             axis=0))),
        size=A.shape)


def to_torch_sparse_csc(A: SparseMatrix):
    import torch
    csc = A.csc()
    return torch.sparse_csc_tensor(
        torch.from_numpy(np.asarray(csc[0]).astype(np.int64)),
        torch.from_numpy(np.asarray(csc[1]).astype(np.int64)),
        torch.from_numpy(np.asarray(jnp.take(A.val, jnp.asarray(csc[2]),
                                             axis=0))),
        size=A.shape)


__all__ += [
    "is_scalar", "neg", "inv", "power", "add", "sub", "mul", "div",
    "sp_add", "sp_sub", "sp_mul", "sp_div", "sp_power", "spsp_add",
    "spsp_mul", "spsp_div", "sp_broadcast_v", "sp_add_v", "sp_sub_v",
    "sp_mul_v", "sp_div_v", "reduce", "sum", "smax", "smin", "smean",
    "sprod", "bsddmm", "from_torch_sparse", "to_torch_sparse_coo",
    "to_torch_sparse_csr", "to_torch_sparse_csc",
]
