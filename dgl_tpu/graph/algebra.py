"""aten-style sparse-array algebra (reference ``src/array/array.cc`` /
``src/array/array_op.h``): the raw COO/CSR op catalog underneath the
graph object.

Design stance (SURVEY §7): structure-producing ops (dynamic output
sizes) run on host numpy — they feed jit boundaries, never live inside
them; value math over a fixed structure is device-side JAX elsewhere
(``ops/gspmm.py``, ``sparse/``, ``graph/query.py`` hold the device
counterparts for SpMM/SDDMM/edge-id lookup).  ids are int32 (jit
truncates int64).

The aten surface maps as:

========================  =======================================
reference                 here
========================  =======================================
``array_op.h:21-78``      generic array helpers (this module + jnp)
``array_op.h:83-232``     ``csr_*`` / ``union_csr`` / ``csr_to_simple``
``array_op.h:237-331``    ``coo_*`` / ``disjoint_union_coo``
``CSRSpMM/SDDMM``         ``ops/gspmm.py`` / ``ops/gsddmm.py``
``CSRRowWiseSampling``    ``sampling/neighbor.py`` (+ csrc OpenMP)
``CSRLaborSampling``      ``sampling/labor.py``
``BFS/DFS/Topo``          ``traversal.py``
========================  =======================================
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .unitgraph import CSR, coo_to_csr

__all__ = [
    "COO", "relabel", "pack", "concat_slices", "cumsum",
    # CSR
    "csr_is_nonzero", "csr_has_duplicate", "csr_get_row_nnz",
    "csr_get_row_column_indices", "csr_get_row_data", "csr_is_sorted",
    "csr_sort", "csr_get_data", "csr_get_data_and_indices",
    "csr_transpose", "csr_to_coo", "csr_slice_rows", "csr_slice_matrix",
    "csr_remove", "csr_reorder", "csr_row_wise_topk", "union_csr",
    "csr_to_simple",
    # COO
    "coo_is_nonzero", "coo_has_duplicate", "coo_get_row_nnz",
    "coo_get_row_data_and_indices", "coo_get_data", "coo_transpose",
    "coo_to_csr_matrix", "coo_slice_rows", "coo_slice_matrix",
    "coo_coalesce", "coo_sort", "coo_is_sorted", "coo_remove",
    "coo_reorder", "coo_row_wise_topk", "coo_line_graph",
    "union_coo", "disjoint_union_coo",
]

_I = np.int32


def _np(x):
    return np.asarray(x)


@dataclasses.dataclass
class COO:
    """Raw COO triple (reference ``include/dgl/aten/coo.h`` COOMatrix):
    ``eids`` maps position -> canonical edge id (None == identity)."""

    num_rows: int
    num_cols: int
    row: np.ndarray
    col: np.ndarray
    eids: Optional[np.ndarray] = None

    @property
    def nnz(self) -> int:
        return len(self.row)

    def data(self) -> np.ndarray:
        if self.eids is None:
            return np.arange(self.nnz, dtype=_I)
        return self.eids


# ---------------------------------------------------------------------------
# generic array helpers
# ---------------------------------------------------------------------------

def relabel(arrays: Sequence[np.ndarray]) -> Tuple[np.ndarray,
                                                   List[np.ndarray]]:
    """Relabel ids to consecutive ids ordered by first appearance
    (reference ``array_op.h:66`` ``Relabel_`` / IdHashMap).  Returns
    (unique ids in appearance order, relabeled copies)."""
    flat = np.concatenate([_np(a).ravel() for a in arrays]) if arrays \
        else np.zeros(0, _I)
    uniq_sorted, first = np.unique(flat, return_index=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty(len(order), _I)
    rank[order] = np.arange(len(order), dtype=_I)
    out = [rank[np.searchsorted(uniq_sorted, _np(a))].astype(_I)
           for a in arrays]
    return uniq_sorted[order].astype(_I), out


def pack(array: np.ndarray, pad_value) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Drop the ``pad_value`` tail per row of a 2-D array (reference
    ``array_op.h:72`` / ``include/dgl/aten/array_ops.h:245`` ``Pack``):
    row length = number of elements before the FIRST pad occurrence
    (elements after an interior pad are dropped too, matching the
    reference).  Returns (flat packed values, per-row lengths, per-row
    offsets)."""
    array = _np(array)
    pad = array == pad_value
    ncol = array.shape[1]
    lengths = np.where(pad.any(axis=1), pad.argmax(axis=1),
                       ncol).astype(np.int64)
    keep = np.arange(ncol)[None, :] < lengths[:, None]
    packed = array[keep]
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return packed, lengths, offsets.astype(np.int64)


def concat_slices(array: np.ndarray,
                  lengths: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the first ``lengths[i]`` entries of each row (reference
    ``array_op.h:75`` ``ConcatSlices``)."""
    array = _np(array)
    lengths = _np(lengths)
    mask = np.arange(array.shape[1])[None, :] < lengths[:, None]
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return array[mask], offsets.astype(np.int64)


def cumsum(array: np.ndarray, prepend_zero: bool = False) -> np.ndarray:
    """reference ``array_op.h:78`` ``CumSum``."""
    out = np.cumsum(_np(array))
    if prepend_zero:
        out = np.concatenate([[0], out])
    return out.astype(_np(array).dtype)


# ---------------------------------------------------------------------------
# CSR queries (reference array_op.h:83-127)
# ---------------------------------------------------------------------------

def _rows_of(csr: CSR) -> int:
    return len(_np(csr.indptr)) - 1


def csr_is_nonzero(csr: CSR, row, col):
    """reference ``array_op.h:83,86`` ``CSRIsNonZero`` (scalar or
    vectorized, broadcasting like the reference's NDArray overload)."""
    return csr_get_data(csr, row, col) != -1 if np.ndim(row) or \
        np.ndim(col) else bool(csr_get_data(csr, row, col) != -1)


def csr_has_duplicate(csr: CSR) -> bool:
    """reference ``array_op.h:90`` ``CSRHasDuplicate``."""
    indptr, indices = _np(csr.indptr), _np(csr.indices)
    rows = np.repeat(np.arange(_rows_of(csr), dtype=np.int64),
                     np.diff(indptr))
    key = rows * (indices.max(initial=0) + 1) + indices
    return len(np.unique(key)) != len(key)


def csr_get_row_nnz(csr: CSR, row):
    """reference ``array_op.h:93,96`` ``CSRGetRowNNZ``."""
    indptr = _np(csr.indptr)
    row = _np(row)
    out = indptr[row + 1] - indptr[row]
    return int(out) if out.ndim == 0 else out.astype(np.int64)


def csr_get_row_column_indices(csr: CSR, row: int) -> np.ndarray:
    """reference ``array_op.h:99``."""
    indptr = _np(csr.indptr)
    return _np(csr.indices)[indptr[row]:indptr[row + 1]]


def csr_get_row_data(csr: CSR, row: int) -> np.ndarray:
    """reference ``array_op.h:102``."""
    indptr = _np(csr.indptr)
    return _np(csr.eids)[indptr[row]:indptr[row + 1]]


def csr_is_sorted(csr: CSR) -> bool:
    """Columns nondecreasing within every row (reference
    ``array_op.h:105`` ``CSRIsSorted``)."""
    indptr, indices = _np(csr.indptr), _np(csr.indices)
    if len(indices) == 0:
        return True
    diff_ok = indices[1:] >= indices[:-1]
    starts = indptr[1:-1]  # row boundaries may decrease
    diff_ok[starts[(starts > 0) & (starts < len(indices))] - 1] = True
    return bool(diff_ok.all())


def csr_sort(csr: CSR) -> CSR:
    """Sort columns within each row, eids permuted along (reference
    ``array_op.h:152`` ``CSRSort_``; pure-functional here)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    rows = np.repeat(np.arange(_rows_of(csr), dtype=np.int64),
                     np.diff(indptr))
    order = np.lexsort((indices, rows))
    return CSR(indptr=indptr, indices=indices[order], eids=eids[order])


def csr_get_data(csr: CSR, rows, cols, default=-1) -> np.ndarray:
    """Edge id of each (row, col) query, ``default`` when absent; first
    match on duplicates (reference ``array_op.h:108-121`` ``CSRGetData``).
    Device counterpart: ``graph/query.py edge_ids``."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    r, c = np.broadcast_arrays(_np(rows), _np(cols))
    scalar = r.ndim == 0
    r, c = np.atleast_1d(r), np.atleast_1d(c)
    out = np.full(len(r), default, eids.dtype if len(eids) else _I)
    for i, (ri, ci) in enumerate(zip(r, c)):
        seg = indices[indptr[ri]:indptr[ri + 1]]
        hit = np.nonzero(seg == ci)[0]
        if len(hit):
            out[i] = eids[indptr[ri] + hit[0]]
    return out[0] if scalar else out


def csr_get_data_and_indices(csr: CSR, rows, cols):
    """ALL matches of the (row, col) pairs — duplicates included
    (reference ``array_op.h:127`` ``CSRGetDataAndIndices``).  Returns
    [rows, cols, eids]."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    r, c = np.broadcast_arrays(np.atleast_1d(_np(rows)),
                               np.atleast_1d(_np(cols)))
    out_r, out_c, out_e = [], [], []
    for ri, ci in zip(r, c):
        seg = slice(indptr[ri], indptr[ri + 1])
        hit = np.nonzero(indices[seg] == ci)[0]
        out_r.append(np.full(len(hit), ri, _I))
        out_c.append(np.full(len(hit), ci, _I))
        out_e.append(eids[seg][hit])
    cat = lambda xs: (np.concatenate(xs) if xs else
                      np.zeros(0, _I)).astype(_I)
    return [cat(out_r), cat(out_c), cat(out_e)]


# ---------------------------------------------------------------------------
# CSR transforms (reference array_op.h:131-232)
# ---------------------------------------------------------------------------

def csr_transpose(csr: CSR, num_cols: int) -> CSR:
    """reference ``array_op.h:131`` ``CSRTranspose`` (counting sort on
    the column index; eids carried)."""
    coo = csr_to_coo(csr, num_cols)
    t = coo_to_csr(coo.col, coo.row, num_cols)
    # t.eids indexes positions of the flattened csr arrays; map through
    return CSR(indptr=t.indptr, indices=t.indices,
               eids=_np(csr.eids)[_np(t.eids)])


def csr_to_coo(csr: CSR, num_cols: int,
               data_as_order: bool = False) -> COO:
    """reference ``array_op.h:135,139`` ``CSRToCOO`` /
    ``CSRToCOODataAsOrder`` (the latter permutes entries into canonical
    edge-id order)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    rows = np.repeat(np.arange(_rows_of(csr), dtype=_I),
                     np.diff(indptr)).astype(_I)
    if data_as_order:
        inv = np.argsort(eids, kind="stable")
        return COO(_rows_of(csr), num_cols, rows[inv], indices[inv], None)
    return COO(_rows_of(csr), num_cols, rows, indices, eids)


def csr_slice_rows(csr: CSR, rows, end: Optional[int] = None) -> CSR:
    """Row slice — contiguous ``[rows, end)`` or gather by row-id array
    (reference ``array_op.h:142,145`` ``CSRSliceRows``)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    if end is not None:
        lo, hi = indptr[rows], indptr[end]
        return CSR(indptr=(indptr[rows:end + 1] - lo).astype(_I),
                   indices=indices[lo:hi], eids=eids[lo:hi])
    rows = _np(rows)
    counts = indptr[rows + 1] - indptr[rows]
    new_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(_I)
    take = np.concatenate([np.arange(indptr[r], indptr[r + 1])
                           for r in rows]) if len(rows) else \
        np.zeros(0, np.int64)
    return CSR(indptr=new_indptr, indices=indices[take],
               eids=eids[take])


def csr_slice_matrix(csr: CSR, rows, cols, num_cols: int) -> Tuple[CSR,
                                                                   int]:
    """Submatrix induced by (rows, cols), ids relabeled to the slice
    (reference ``array_op.h:148`` ``CSRSliceMatrix``).  Returns the
    sliced CSR (eids = original edge ids) and its num_cols."""
    sub = csr_slice_rows(csr, _np(rows))
    indptr, indices, eids = (_np(sub.indptr), _np(sub.indices),
                             _np(sub.eids))
    cols = _np(cols)
    lut = np.full(num_cols, -1, np.int64)
    lut[cols] = np.arange(len(cols))
    mapped = lut[indices]
    keep = mapped >= 0
    cs = np.concatenate([[0], np.cumsum(keep)])
    new_indptr = (cs[indptr] - cs[indptr[0]]).astype(_I)
    return (CSR(indptr=new_indptr, indices=mapped[keep].astype(_I),
                eids=eids[keep]), len(cols))


def csr_remove(csr: CSR, entries) -> CSR:
    """Drop the canonical edge ids in ``entries`` (reference
    ``array_op.h:167`` ``CSRRemove``)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    keep = ~np.isin(eids, _np(entries))
    cs = np.concatenate([[0], np.cumsum(keep)])
    return CSR(indptr=cs[indptr].astype(_I),
               indices=indices[keep], eids=eids[keep])


def csr_reorder(csr: CSR, new_row_ids, new_col_ids) -> CSR:
    """Permute rows and columns: new_row_ids[i] = new id of old row i
    (reference ``array_op.h:159`` ``CSRReorder``)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    new_row_ids, new_col_ids = _np(new_row_ids), _np(new_col_ids)
    n = _rows_of(csr)
    old_of_new = np.empty(n, np.int64)
    old_of_new[new_row_ids] = np.arange(n)
    counts = (indptr[1:] - indptr[:-1])[old_of_new]
    new_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(_I)
    take = np.concatenate([np.arange(indptr[r], indptr[r + 1])
                           for r in old_of_new]) if len(indices) else \
        np.zeros(0, np.int64)
    return CSR(indptr=new_indptr,
               indices=new_col_ids[indices[take]].astype(_I),
               eids=eids[take])


def csr_row_wise_topk(csr: CSR, rows, k: int, weight,
                      ascending: bool = False,
                      num_cols: Optional[int] = None) -> COO:
    """Per-row top-k by edge weight (reference ``array_op.h:214``
    ``CSRRowWiseTopk``); used by ``dgl.sampling.select_topk``.

    ``num_cols``: true matrix width of ``csr`` (CSR carries no width;
    without it the width is inferred from the selected indices and
    understates when trailing columns are empty)."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    weight = _np(weight)
    rows = np.atleast_1d(_np(rows))
    out_r, out_c, out_e = [], [], []
    for r in rows:
        seg = slice(indptr[r], indptr[r + 1])
        w = weight[eids[seg]]
        order = np.argsort(w, kind="stable")
        if not ascending:
            order = order[::-1]
        order = order[:k]
        out_r.append(np.full(len(order), r, _I))
        out_c.append(indices[seg][order])
        out_e.append(eids[seg][order])
    cat = lambda xs: np.concatenate(xs) if xs else np.zeros(0, _I)
    nr = _rows_of(csr)
    nc = (int(num_cols) if num_cols is not None
          else int(indices.max(initial=-1)) + 1)
    return COO(nr, nc, cat(out_r).astype(_I),
               cat(out_c).astype(_I), cat(out_e).astype(_I))


def union_csr(csrs: Sequence[CSR]) -> CSR:
    """Union of same-shape CSRs, duplicates kept, edge ids of matrix i
    shifted by sum(nnz of earlier matrices) (reference ``array_op.h:229``
    ``UnionCsr`` / ``array.cc UnionCsr``)."""
    indptrs = [_np(c.indptr).astype(np.int64) for c in csrs]
    n = len(indptrs[0]) - 1
    counts = sum(np.diff(p) for p in indptrs)
    new_indptr = np.concatenate([[0], np.cumsum(counts)])
    nnz_off = np.cumsum([0] + [len(_np(c.indices)) for c in csrs])
    indices = np.zeros(new_indptr[-1], _I)
    eids = np.zeros(new_indptr[-1], _I)
    pos = new_indptr[:-1].copy()
    for ci, c in enumerate(csrs):
        ip, idx, ed = indptrs[ci], _np(c.indices), _np(c.eids)
        for r in range(n):
            m = ip[r + 1] - ip[r]
            indices[pos[r]:pos[r] + m] = idx[ip[r]:ip[r + 1]]
            eids[pos[r]:pos[r] + m] = ed[ip[r]:ip[r + 1]] + nnz_off[ci]
            pos[r] += m
    return CSR(indptr=new_indptr.astype(_I), indices=indices, eids=eids)


def csr_to_simple(csr: CSR) -> Tuple[CSR, np.ndarray, np.ndarray]:
    """Deduplicate parallel edges (reference ``array_op.h:232``
    ``CSRToSimple``): returns (sorted simple CSR, per-kept-edge
    multiplicity, original-eid -> new-eid map).  The map is indexed by
    edge-id VALUE (length ``eids.max()+1``), so non-canonical eids —
    e.g. the output of ``csr_remove`` or a CSR slice — map correctly."""
    indptr, indices, eids = (_np(csr.indptr), _np(csr.indices),
                             _np(csr.eids))
    rows = np.repeat(np.arange(_rows_of(csr), dtype=np.int64),
                     np.diff(indptr))
    ncol = int(indices.max(initial=-1)) + 1
    key = rows * max(ncol, 1) + indices
    uniq, inv, cnt = np.unique(key, return_inverse=True,
                               return_counts=True)
    new_rows = (uniq // max(ncol, 1)).astype(_I)
    new_cols = (uniq % max(ncol, 1)).astype(_I)
    new_indptr = np.zeros(_rows_of(csr) + 1, np.int64)
    np.add.at(new_indptr, new_rows + 1, 1)
    edge_map = np.zeros(int(eids.max(initial=-1)) + 1, _I)
    edge_map[eids] = inv.astype(_I)
    return (CSR(indptr=np.cumsum(new_indptr).astype(_I),
                indices=new_cols,
                eids=np.arange(len(uniq), dtype=_I)),
            cnt.astype(np.int64), edge_map)


# ---------------------------------------------------------------------------
# COO family (reference array_op.h:237-331)
# ---------------------------------------------------------------------------

def _coo_csr(coo: COO) -> CSR:
    csr = coo_to_csr(_np(coo.row).astype(_I), _np(coo.col).astype(_I),
                     coo.num_rows)
    if coo.eids is not None:
        csr = CSR(indptr=csr.indptr, indices=csr.indices,
                  eids=_np(coo.eids)[_np(csr.eids)])
    return csr


def coo_is_nonzero(coo: COO, row, col):
    """reference ``array_op.h:237,240`` ``COOIsNonZero``."""
    return csr_is_nonzero(_coo_csr(coo), row, col)


def coo_has_duplicate(coo: COO) -> bool:
    """reference ``array_op.h:244``."""
    key = _np(coo.row).astype(np.int64) * coo.num_cols + _np(coo.col)
    return len(np.unique(key)) != len(key)


def coo_get_row_nnz(coo: COO, row):
    """reference ``array_op.h:247,250``."""
    rows = _np(coo.row)
    r = _np(row)
    if r.ndim == 0:
        return int((rows == r).sum())
    return (rows[None, :] == r[:, None]).sum(axis=1).astype(np.int64)


def coo_get_row_data_and_indices(coo: COO, row: int):
    """reference ``array_op.h:253``."""
    m = _np(coo.row) == row
    return _np(coo.col)[m], coo.data()[m]


def coo_get_data(coo: COO, rows, cols, default=-1):
    """reference ``array_op.h:261`` ``COOGetData``."""
    return csr_get_data(_coo_csr(coo), rows, cols, default)


def coo_transpose(coo: COO) -> COO:
    """reference ``array_op.h:265``."""
    return COO(coo.num_cols, coo.num_rows, coo.col, coo.row, coo.eids)


def coo_to_csr_matrix(coo: COO) -> CSR:
    """reference ``array_op.h:268`` ``COOToCSR`` (canonical eids
    carried)."""
    return _coo_csr(coo)


def coo_slice_rows(coo: COO, rows, end: Optional[int] = None) -> COO:
    """reference ``array_op.h:271,274`` ``COOSliceRows`` — row ids
    relabeled to the slice.  Duplicate query rows map each edge to the
    FIRST occurrence and do NOT duplicate edges (matching the
    reference's IdHashMap behavior, ``spmat_op_impl_coo.cc:800``;
    ``csr_slice_rows`` duplicates per occurrence instead)."""
    r, c, e = _np(coo.row), _np(coo.col), coo.data()
    if end is not None:
        m = (r >= rows) & (r < end)
        return COO(end - rows, coo.num_cols, (r[m] - rows).astype(_I),
                   c[m], e[m])
    rows = _np(rows)
    lut = np.full(coo.num_rows, -1, np.int64)
    # reversed fill => first occurrence wins on duplicate query rows
    lut[rows[::-1]] = np.arange(len(rows))[::-1]
    m = lut[r] >= 0
    return COO(len(rows), coo.num_cols, lut[r[m]].astype(_I), c[m], e[m])


def coo_slice_matrix(coo: COO, rows, cols) -> COO:
    """Induced submatrix, both axes relabeled (reference
    ``array_op.h:277`` ``COOSliceMatrix``)."""
    sub = coo_slice_rows(coo, rows)
    cols = _np(cols)
    lut = np.full(coo.num_cols, -1, np.int64)
    lut[cols] = np.arange(len(cols))
    m = lut[_np(sub.col)] >= 0
    return COO(sub.num_rows, len(cols), _np(sub.row)[m],
               lut[_np(sub.col)[m]].astype(_I), sub.data()[m])


def coo_coalesce(coo: COO) -> Tuple[COO, np.ndarray]:
    """Merge duplicate coordinates; returns (simple COO, multiplicity)
    (reference ``array_op.h:281`` ``COOCoalesce``)."""
    key = _np(coo.row).astype(np.int64) * coo.num_cols + _np(coo.col)
    uniq, cnt = np.unique(key, return_counts=True)
    return (COO(coo.num_rows, coo.num_cols,
                (uniq // coo.num_cols).astype(_I),
                (uniq % coo.num_cols).astype(_I), None),
            cnt.astype(np.int64))


def coo_sort(coo: COO, sort_column: bool = True) -> COO:
    """Row-major (optionally also column) sort (reference
    ``array_op.h:287`` ``COOSort_``; pure-functional)."""
    r, c = _np(coo.row), _np(coo.col)
    order = np.lexsort((c, r)) if sort_column else \
        np.argsort(r, kind="stable")
    return COO(coo.num_rows, coo.num_cols, r[order], c[order],
               coo.data()[order])


def coo_is_sorted(coo: COO) -> Tuple[bool, bool]:
    """(row_sorted, col_sorted_within_rows) (reference
    ``array_op.h:290`` ``COOIsSorted``)."""
    r, c = (_np(coo.row).astype(np.int64),
            _np(coo.col).astype(np.int64))
    if len(r) == 0:
        return True, True
    row_sorted = bool((r[1:] >= r[:-1]).all())
    key = r * (c.max(initial=0) + 1) + c
    return row_sorted, row_sorted and bool((key[1:] >= key[:-1]).all())


def coo_remove(coo: COO, entries) -> COO:
    """Drop canonical edge ids (reference ``array_op.h:293``
    ``COORemove``)."""
    keep = ~np.isin(coo.data(), _np(entries))
    return COO(coo.num_rows, coo.num_cols, _np(coo.row)[keep],
               _np(coo.col)[keep], coo.data()[keep])


def coo_reorder(coo: COO, new_row_ids, new_col_ids) -> COO:
    """reference ``array_op.h:163`` ``COOReorder``."""
    return COO(coo.num_rows, coo.num_cols,
               _np(new_row_ids)[_np(coo.row)].astype(_I),
               _np(new_col_ids)[_np(coo.col)].astype(_I), coo.eids)


def coo_row_wise_topk(coo: COO, rows, k: int, weight,
                      ascending: bool = False) -> COO:
    """reference ``array_op.h:325`` ``COORowWiseTopk``."""
    out = csr_row_wise_topk(_coo_csr(coo), rows, k, weight, ascending,
                            num_cols=coo.num_cols)
    return COO(coo.num_rows, coo.num_cols, out.row, out.col, out.eids)


def coo_line_graph(coo: COO, backtracking: bool = True) -> COO:
    """Edge-adjacency graph: line-graph edge (e1 -> e2) iff
    dst(e1) == src(e2), optionally excluding immediate backtracking
    (e2 == reverse of e1) (reference ``array.cc COOLineGraph`` /
    ``src/array/cpu/coo_line_graph.cc``).  Nodes of the result are the
    canonical edge ids of the input."""
    r, c, e = (_np(coo.row).astype(np.int64),
               _np(coo.col).astype(np.int64), coo.data())
    nmax = max(coo.num_rows, coo.num_cols)
    src_order = np.argsort(r, kind="stable")
    starts = np.searchsorted(r[src_order], np.arange(nmax + 1))
    # successors of edge e1=(u,v): every edge e2 with src(e2) == v
    counts = starts[c + 1] - starts[c]
    e1 = np.repeat(np.arange(len(r)), counts)
    begin = np.repeat(starts[c], counts)
    offs = np.arange(counts.sum()) - np.repeat(
        np.cumsum(counts) - counts, counts)
    e2 = src_order[begin + offs]
    if not backtracking:
        keep = ~((r[e2] == c[e1]) & (c[e2] == r[e1]))
        e1, e2 = e1[keep], e2[keep]
    ne = len(r)
    return COO(ne, ne, e[e1].astype(_I), e[e2].astype(_I), None)


def union_coo(coos: Sequence[COO]) -> COO:
    """Same-shape union, duplicates kept, eids shifted per matrix
    (reference ``array.cc UnionCoo``)."""
    off = np.cumsum([0] + [c.nnz for c in coos])
    return COO(coos[0].num_rows, coos[0].num_cols,
               np.concatenate([_np(c.row) for c in coos]).astype(_I),
               np.concatenate([_np(c.col) for c in coos]).astype(_I),
               np.concatenate([c.data() + off[i]
                               for i, c in enumerate(coos)]).astype(_I))


def disjoint_union_coo(coos: Sequence[COO]) -> COO:
    """Block-diagonal union — node AND edge ids shifted (reference
    ``array_op.h:284`` ``DisjointUnionCoo``; the kernel under
    ``dgl.batch``)."""
    row_off = np.cumsum([0] + [c.num_rows for c in coos])
    col_off = np.cumsum([0] + [c.num_cols for c in coos])
    nnz_off = np.cumsum([0] + [c.nnz for c in coos])
    return COO(int(row_off[-1]), int(col_off[-1]),
               np.concatenate([_np(c.row) + row_off[i]
                               for i, c in enumerate(coos)]).astype(_I),
               np.concatenate([_np(c.col) + col_off[i]
                               for i, c in enumerate(coos)]).astype(_I),
               np.concatenate([c.data() + nnz_off[i]
                               for i, c in enumerate(coos)]).astype(_I))
