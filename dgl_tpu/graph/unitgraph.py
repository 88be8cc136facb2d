"""Unit graph: a single-relation (bipartite) sparse structure as a JAX pytree.

TPU-native re-design of the reference's ``UnitGraph`` (a lazy triple of
{COO, in-CSR(CSC), out-CSR} with an allowed-format bitmask; see reference
``src/graph/unit_graph.h:41,393-401``).  Every format is a small pytree of
int32 arrays; formats are materialized lazily (on first request) via
sort/searchsorted instead of C++ pointer code.

Dual execution modes, dispatched on array type:
* **device (jnp) arrays** — format materialization is traceable XLA code and
  can happen inside ``jit``;
* **host (numpy) arrays** — materialization runs in numpy.  This is the
  sampling/dataloading path: host pipelines must never bounce through the
  accelerator (on a TPU-tunnel setup every stray device op is a network
  round trip).  A host-backed UnitGraph auto-converts when passed into
  ``jit`` (numpy leaves are valid pytree leaves), or explicitly via
  ``to_device()``.

Design notes
------------
* **COO is canonical**: edge id ``i`` is position ``i`` in ``(row, col)``.
  CSR/CSC store an ``eids`` permutation back to canonical order (mirrors the
  reference's ``COOMatrix.data`` / ``CSRMatrix.data`` convention,
  ``include/dgl/aten/coo.h:41``, ``csr.h:40``).
* **Static shapes**: node/edge counts are Python ints in the pytree's static
  aux data, so a ``UnitGraph`` passes through ``jit`` / ``pjit`` without
  retracing while sizes match.
* int32 ids throughout (TPUs have no fast int64 path).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ALL_FORMATS = ("coo", "csr", "csc")

INT32_MAX = 2_147_483_647


def check_id_capacity(num_src: int, num_dst: int, num_edges: int,
                      context: str = "UnitGraph"):
    """The int32 id contract (docs/capacity.md; int32 capacity audit).

    dgl_tpu is int32-everywhere by design (the reference defaults to
    int64 ids, ``python/dgl/convert.py:94-98``; TPUs have no fast int64
    path, and jit would silently truncate).  A SINGLE graph object is
    therefore bounded at 2^31-1 nodes per side and 2^31-1 edges —
    node/edge ids and eid arrays are int32.  Beyond that, shard: the
    sampled mesh plane (``parallel/mesh_minibatch.build_mesh_csc_edges``)
    carries graphs of unbounded TOTAL edge count as long as each
    shard's local edge count stays under 2^31 (per-shard LOCAL ids —
    papers100M symmetric, 3.2B directed edges, is ~400M/shard over 8).
    """
    for name, v in (("num_src", num_src), ("num_dst", num_dst),
                    ("num_edges", num_edges)):
        if v > INT32_MAX:
            raise ValueError(
                f"{context}: {name}={v} exceeds the int32 id capacity "
                f"(2^31-1). dgl_tpu ids are int32 by design; shard the "
                f"graph instead — the sampled mesh plane "
                f"(build_mesh_csc_edges) supports unbounded total edges "
                f"with < 2^31 edges per shard (see docs/capacity.md)")


def _as_idarray(x):
    """int32 id array, staying on host if input is host data."""
    if isinstance(x, np.ndarray) or np.isscalar(x) or isinstance(x, (list,
                                                                     tuple)):
        arr = np.asarray(x)
        if arr.dtype != np.int32:
            arr = arr.astype(np.int32)
        return arr
    arr = jnp.asarray(x)
    if arr.dtype != jnp.int32:
        arr = arr.astype(jnp.int32)
    return arr


def _is_host(x) -> bool:
    return isinstance(x, np.ndarray)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CSR:
    """Compressed sparse rows: ``indptr`` (n+1,), ``indices`` (nnz,), ``eids``
    (nnz,) mapping position -> canonical (COO-order) edge id."""

    indptr: jnp.ndarray
    indices: jnp.ndarray
    eids: jnp.ndarray

    def tree_flatten(self):
        return (self.indptr, self.indices, self.eids), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def coo_to_csr(row, col, num_rows: int) -> CSR:
    """COO -> CSR by stable sort on the row index (host or device)."""
    if _is_host(row):
        eids = np.argsort(row, kind="stable").astype(np.int32)
        sorted_rows = row[eids]
        indices = col[eids]
        indptr = np.searchsorted(
            sorted_rows, np.arange(num_rows + 1, dtype=np.int32),
            side="left").astype(np.int32)
        return CSR(indptr=indptr, indices=indices, eids=eids)
    eids = jnp.argsort(row, stable=True).astype(jnp.int32)
    sorted_rows = row[eids]
    indices = col[eids]
    indptr = jnp.searchsorted(
        sorted_rows, jnp.arange(num_rows + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return CSR(indptr=indptr, indices=indices, eids=eids)


def _auto_cap(num_edges: int, tiles2: int, default: int,
              bucket_budget: int = 120_000) -> int:
    """Slot capacity for the tiled format: DEFAULT_CAP measures fastest
    for the plain SpMM at every density tried (PERF_NOTES capacity
    sweeps — 466 vs 565 ms at full-Reddit density), so escalate to
    bigger caps ONLY when the estimated bucket count would overflow the
    fused attention kernels' SMEM scalar-prefetch budget (one packed i32
    per bucket, ~131k buckets max for the src-major backward; budget
    left at 120k for slack).  SpMM-only callers can pass cap explicitly.
    """
    c = default
    est = lambda c: num_edges // c + min(tiles2, num_edges)
    while c < 2048 and est(c) > bucket_budget:
        c *= 2
    return c


@jax.tree_util.register_pytree_node_class
class UnitGraph:
    """One (srctype, etype, dsttype) relation.

    Parameters are raw arrays; prefer :func:`from_coo`.  ``formats`` restricts
    which representations may be materialized (reference semantics of
    ``UnitGraph::formats_`` / ``SelectFormat``, ``src/graph/unit_graph.cc:771``).
    """

    def __init__(
        self,
        num_src: int,
        num_dst: int,
        num_edges: int,
        coo: Optional[Tuple] = None,
        csr: Optional[CSR] = None,
        csc: Optional[CSR] = None,
        formats: Tuple[str, ...] = ALL_FORMATS,
    ):
        check_id_capacity(int(num_src), int(num_dst), int(num_edges))
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self.num_edges = int(num_edges)
        self._coo = coo
        self._csr = csr
        self._csc = csc
        self._tiled = None       # Pallas tile-dense format (fwd)
        self._tiled_rev = None   # and the reverse graph's
        # {field: (w_slot_fwd (B,C), w_slot_rev (B,C))} — pre-permuted
        # static edge weights (see cache_edge_weights)
        self._slot_weights = {}
        self._hybrid = None      # degree-stratified hybrid format
        self._bits = None        # bit-packed full-dense format
        # builder opt-out from the Pallas SpMM fast paths (e.g. stacked
        # union graphs whose replicated dst domain explodes tile pairs);
        # rides pytree aux so it survives jit flattening
        self.prefer_xla = False
        self.formats = tuple(formats)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_coo(cls, num_src, num_dst, row, col, formats=ALL_FORMATS):
        row = _as_idarray(row)
        col = _as_idarray(col)
        assert row.shape == col.shape and row.ndim == 1
        return cls(int(num_src), int(num_dst), int(row.shape[0]),
                   coo=(row, col), formats=formats)

    @classmethod
    def from_csr(cls, num_src, num_dst, indptr, indices, eids=None,
                 formats=ALL_FORMATS):
        indptr = _as_idarray(indptr)
        indices = _as_idarray(indices)
        nnz = int(indices.shape[0])
        if eids is None:
            eids = (np.arange(nnz, dtype=np.int32) if _is_host(indices)
                    else jnp.arange(nnz, dtype=jnp.int32))
        return cls(int(num_src), int(num_dst), nnz,
                   csr=CSR(indptr, indices, _as_idarray(eids)),
                   formats=formats)

    @classmethod
    def from_csc(cls, num_src, num_dst, indptr, indices, eids=None,
                 formats=ALL_FORMATS):
        indptr = _as_idarray(indptr)
        indices = _as_idarray(indices)
        nnz = int(indices.shape[0])
        if eids is None:
            eids = (np.arange(nnz, dtype=np.int32) if _is_host(indices)
                    else jnp.arange(nnz, dtype=jnp.int32))
        return cls(int(num_src), int(num_dst), nnz,
                   csc=CSR(indptr, indices, _as_idarray(eids)),
                   formats=formats)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        children = (self._coo, self._csr, self._csc, self._tiled,
                    self._tiled_rev, self._slot_weights, self._hybrid,
                    self._bits)
        aux = (self.num_src, self.num_dst, self.num_edges, self.formats,
               self.prefer_xla)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (coo, csr, csc, tiled, tiled_rev, slot_weights, hybrid,
         bits) = children
        num_src, num_dst, num_edges, formats = aux[:4]
        out = cls(num_src, num_dst, num_edges, coo=coo, csr=csr, csc=csc,
                  formats=formats)
        if len(aux) > 4:
            out.prefer_xla = aux[4]
        out._tiled = tiled
        out._tiled_rev = tiled_rev
        out._slot_weights = slot_weights
        out._hybrid = hybrid
        out._bits = bits
        return out

    # -- host/device -------------------------------------------------------
    def is_host(self) -> bool:
        for arr in jax.tree_util.tree_leaves(
                (self._coo, self._csr, self._csc)):
            return isinstance(arr, np.ndarray)
        return False

    def to_device(self, device=None) -> "UnitGraph":
        def put(x):
            return jax.device_put(jnp.asarray(x), device)
        return jax.tree_util.tree_map(put, self)

    def to_host(self) -> "UnitGraph":
        return jax.tree_util.tree_map(lambda x: np.asarray(x), self)

    # -- format access (lazy, cached) --------------------------------------
    def coo(self) -> Tuple:
        """(row, col) in canonical edge order."""
        if self._coo is None:
            if "coo" not in self.formats:
                raise ValueError("COO format is restricted on this graph")
            if self._csr is not None:
                sp, swap = self._csr, False
            elif self._csc is not None:
                sp, swap = self._csc, True
            else:
                raise ValueError("graph has no materialized format")
            if _is_host(sp.indices):
                major = _expand_indptr_np(np.asarray(sp.indptr),
                                          self.num_edges)
                inv = np.zeros(self.num_edges, np.int32)
                inv[sp.eids] = np.arange(self.num_edges, dtype=np.int32)
            else:
                major = _expand_indptr(sp.indptr, self.num_edges)
                inv = jnp.zeros(self.num_edges, jnp.int32).at[sp.eids].set(
                    jnp.arange(self.num_edges, dtype=jnp.int32))
            row, col = (sp.indices, major) if swap else (major, sp.indices)
            self._coo = (row[inv], col[inv])
        return self._coo

    def csr(self) -> CSR:
        """Out-CSR: rows = src nodes, indices = dst nodes."""
        if self._csr is None:
            if "csr" not in self.formats:
                raise ValueError("CSR format is restricted on this graph")
            row, col = self.coo()
            self._csr = coo_to_csr(row, col, self.num_src)
        return self._csr

    def csc(self) -> CSR:
        """In-CSR (CSC): rows = dst nodes, indices = src nodes."""
        if self._csc is None:
            if "csc" not in self.formats:
                raise ValueError("CSC format is restricted on this graph")
            row, col = self.coo()
            self._csc = coo_to_csr(col, row, self.num_dst)
        return self._csc

    def device_csc(self):
        """(indptr, indices, eids) as device int32 arrays — the input
        contract of the on-device samplers (``sampling/device.py``,
        ``dataloading/device_loader.py``): ``indices[indptr[v]:
        indptr[v+1]]`` are v's in-neighbors and positions into
        ``indices`` are the samplers' edge ids (map to canonical edge
        ids via ``eids``)."""
        c = self.csc()
        return (jnp.asarray(c.indptr, jnp.int32),
                jnp.asarray(c.indices, jnp.int32),
                jnp.asarray(c.eids, jnp.int32))

    def tiled_format(self, tile: int = None, cap: int = None):
        """Build (and cache) the Pallas tile-dense format + its reverse
        (see ``dgl_tpu.ops.pallas.tiled_spmm``)."""
        from ..ops.pallas.tiled_spmm import (
            build_tiled_format, DEFAULT_TILE, DEFAULT_CAP)
        if self._tiled is None:
            row, col = (np.asarray(a) for a in self.coo())
            t = tile or DEFAULT_TILE
            if cap is None:
                tiles2 = (-(-self.num_src // t)) * (-(-self.num_dst // t))
                c = _auto_cap(len(row), tiles2, DEFAULT_CAP)
            else:
                c = cap
            self._tiled = build_tiled_format(
                row, col, self.num_src, self.num_dst, t,
                c).with_src_first()
            self._tiled_rev = build_tiled_format(
                col, row, self.num_dst, self.num_src, t,
                c).with_src_first()
        return self._tiled, self._tiled_rev

    def cache_edge_weights(self, field: str, edge_weights) -> None:
        """Pre-permute static per-edge scalar weights into the tiled
        format's slot layout (forward AND reverse, for the VJP).

        Weighted SpMM (``u_mul_e``/``u_div_e`` + sum) pays a
        canonical→slot gather per call (~0.7 s at 23M edges).  For
        weights that are fixed across training steps (GCN norms,
        ``EdgeWeightNorm`` outputs) this precomputes the permutation
        once; ``update_all(fn.u_mul_e('h', field), fn.sum(...))`` then
        hits the cached slots (see ``core.invoke_gspmm``).  Gradients do
        not flow to cached weights."""
        from ..ops.pallas.tiled_spmm import slot_edge_weights
        tf_fwd, tf_rev = self.tiled_format()
        import jax.numpy as jnp
        ew = jnp.asarray(edge_weights).reshape(-1)
        # the third element fingerprints the source array: dispatch only
        # takes the static path while edata[field] is still this object
        self._slot_weights[field] = (
            slot_edge_weights(tf_fwd, ew), slot_edge_weights(tf_rev, ew),
            edge_weights)

    def uncache_edge_weights(self, field: str) -> None:
        self._slot_weights.pop(field, None)

    def create_hybrid_format(self, k_dense: int = 8192,
                             min_degree: int = 256,
                             weights=None, tile: int = None,
                             cap: int = None, cache_path: str = None,
                             multires: tuple = None,
                             fill_min: float = 0.7,
                             symmetric: bool = False) -> None:
        """Build the degree-stratified hybrid SpMM format (hub dst rows
        as a dense (K, N) bf16 block, remainder tiled) — the fast path
        for heavy-tailed graphs.  See ``ops/pallas/hybrid.py``.

        ``cache_path``: optional npz disk cache (builds at 100M+ edges take
        tens of minutes single-core; the caller owns cache-key hygiene)."""
        from ..ops.pallas.hybrid import build_hybrid_format
        from ..ops.pallas import tiled_spmm as _ts
        row, col = self.coo()
        self._hybrid = build_hybrid_format(
            np.asarray(row), np.asarray(col), self.num_src, self.num_dst,
            k_dense=k_dense, min_degree=min_degree, weights=weights,
            tile=tile or _ts.DEFAULT_TILE, cap=cap or _ts.DEFAULT_CAP,
            cache_path=cache_path, multires=multires, fill_min=fill_min,
            symmetric=symmetric)

    def create_bitmask_format(self, symmetric: bool = False,
                              cache_path: str = None,
                              on_device: bool = False,
                              assume_simple: bool = False) -> None:
        """Build the bit-packed FULL-dense SpMM format: the whole boolean
        adjacency at 1 bit/entry (N^2/8 bytes of HBM — 6.8 GB at Reddit
        scale), streamed through one Pallas kernel with in-VMEM unpack.
        Fastest copy-sum path when the bitmask fits beside the features;
        see ``ops/pallas/bitmm.py``.  ``symmetric=True`` (A == A^T)
        shares one packed matrix between forward and VJP.

        ``on_device=True`` builds the bit planes with a jitted
        scatter-add from the COO instead of packing on the host — ships
        E*8 bytes to the device instead of N^2/8 (see
        ``bitmm.build_bit_format_device``); ``assume_simple=True``
        additionally skips the host duplicate-edge scan."""
        row, col = self.coo()
        if on_device:
            from ..ops.pallas.bitmm import build_bit_format_device
            self._bits = build_bit_format_device(
                np.asarray(row), np.asarray(col), self.num_src,
                self.num_dst, symmetric=symmetric,
                assume_simple=assume_simple)
            return
        from ..ops.pallas.bitmm import build_bit_format
        self._bits = build_bit_format(
            np.asarray(row), np.asarray(col), self.num_src, self.num_dst,
            symmetric=symmetric, cache_path=cache_path)

    def auto_format(self, hbm_budget_bytes: int = 12 << 30,
                    symmetric: bool = None, cache_path: str = None) -> str:
        """Pick + build the best Pallas SpMM format for this graph.

        The reference's per-op ``SelectFormat`` (``unit_graph.cc:771``)
        chooses between COO/CSR/CSC; on TPU the analogous decision is
        between the three gather-free kernel families, driven by density
        and the HBM budget (measured crossovers in PERF_NOTES.md):

        * **bitmask** — whole 1-bit adjacency streamed; wins whenever its
          N_src*N_dst/8 bytes fit in ``hbm_budget_bytes`` and the graph
          is big enough to beat the XLA path (cost is per-MATRIX, not
          per-edge: 16x over tile-dense at Reddit density);
        * **hybrid** — int8 hub block + tiled remainder for heavy-tailed
          graphs whose bitmask does not fit;
        * **tiled** — one-hot tile-dense buckets otherwise.

        ``symmetric=None`` auto-detects A == A^T (exact host check) for
        square graphs up to 50M edges; pass it explicitly beyond that.
        Returns the chosen family name.
        """
        row, col = (np.asarray(a) for a in self.coo())
        e = len(row)
        bits_bytes = (-(-max(self.num_dst, 1) // 1024) * 1024 *
                      (-(-max(self.num_src, 1) // 8192) * 8192) // 8)
        if symmetric is None:
            symmetric = False
            if self.num_src == self.num_dst and e <= 50_000_000:
                fwd = np.sort(col.astype(np.int64) * self.num_src + row)
                rev = np.sort(row.astype(np.int64) * self.num_src + col)
                symmetric = bool(np.array_equal(fwd, rev))
        if not symmetric:
            bits_bytes *= 2
        density = e / max(self.num_src * self.num_dst, 1)
        if (bits_bytes <= hbm_budget_bytes and e >= 1_000_000
                and density >= 1e-4):
            self.create_bitmask_format(symmetric=symmetric,
                                       cache_path=cache_path)
            return "bitmask"
        # heavy tail: top-8192 dst rows carrying >= 30% of edges
        deg = np.bincount(col, minlength=self.num_dst)
        top = np.sort(deg)[::-1][:8192].sum() if self.num_dst > 8192 else 0
        if e >= 1_000_000 and top >= 0.3 * e:
            self.create_hybrid_format(symmetric=symmetric,
                                      cache_path=cache_path)
            return "hybrid"
        self.tiled_format()
        return "tiled"

    def materialized_formats(self) -> Tuple[str, ...]:
        out = []
        if self._coo is not None:
            out.append("coo")
        if self._csr is not None:
            out.append("csr")
        if self._csc is not None:
            out.append("csc")
        return tuple(out)

    def select_format(self, preferred: str) -> str:
        """Reference ``SelectFormat`` logic (``unit_graph.cc:771-783``):
        preferred if allowed, else any materialized allowed format, else the
        first allowed one (materializing it)."""
        if preferred in self.formats:
            return preferred
        mat = [f for f in self.materialized_formats() if f in self.formats]
        if mat:
            return mat[0]
        return self.formats[0]

    # -- queries -----------------------------------------------------------
    def in_degrees(self, v=None):
        csc = self.csc()
        deg = csc.indptr[1:] - csc.indptr[:-1]
        return deg if v is None else deg[v]

    def out_degrees(self, u=None):
        csr = self.csr()
        deg = csr.indptr[1:] - csr.indptr[:-1]
        return deg if u is None else deg[u]

    def reverse(self) -> "UnitGraph":
        """Swap src/dst.  CSR<->CSC swap; COO swaps row/col.  O(1)."""
        coo = None if self._coo is None else (self._coo[1], self._coo[0])
        return UnitGraph(self.num_dst, self.num_src, self.num_edges,
                         coo=coo, csr=self._csc, csc=self._csr,
                         formats=self.formats)

    def with_formats(self, formats) -> "UnitGraph":
        if isinstance(formats, str):
            formats = (formats,)
        formats = tuple(formats)
        return UnitGraph(
            self.num_src, self.num_dst, self.num_edges,
            coo=self._coo if "coo" in formats else None,
            csr=self._csr if "csr" in formats else None,
            csc=self._csc if "csc" in formats else None,
            formats=formats)

    def __repr__(self):
        return (f"UnitGraph(num_src={self.num_src}, num_dst={self.num_dst}, "
                f"num_edges={self.num_edges}, formats={self.formats})")


def _expand_indptr(indptr, nnz: int):
    """Row index per nonzero from an indptr array (csr2coo; reference
    ``src/array/cuda/csr2coo.cu``).  ``nnz`` must be static."""
    if _is_host(indptr):
        return _expand_indptr_np(indptr, nnz)
    return (
        jnp.searchsorted(
            indptr, jnp.arange(nnz, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )


def _expand_indptr_np(indptr: np.ndarray, nnz: int) -> np.ndarray:
    out = np.zeros(nnz, np.int32)
    counts = np.diff(indptr)
    return np.repeat(np.arange(len(counts), dtype=np.int32), counts)
