"""Native C++ host kernels, loaded via ctypes with build-on-first-import.

Role of the reference's ``libdgl.so`` host paths: OpenMP rowwise sampling
pickers, id-compaction hashmap, and the tile-format counting sort.  Falls
back to the numpy implementations if the toolchain is unavailable
(``AVAILABLE`` tells callers which path is live).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdgltpu.so")
_SRC = os.path.join(_HERE, "kernels.cpp")
_LOCK = threading.Lock()

_lib = None
AVAILABLE = False


_SRC_PART = os.path.join(_HERE, "partition.cpp")
_SRC_GEOM = os.path.join(_HERE, "geometry.cpp")
_SOURCES = [_SRC, _SRC_PART, _SRC_GEOM]


def source_hash(sources, flags) -> str:
    """sha256 over source bytes + compile flags: the staleness key.

    Binaries are never committed (gitignored); a ``<so>.srchash`` sidecar
    written at build time records what the .so was built from, so a stale
    or foreign binary is detected regardless of filesystem mtimes."""
    h = hashlib.sha256()
    h.update(" ".join(flags).encode())
    for s in sources:
        with open(s, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def build_so(sources, so_path, flags, timeout=240) -> bool:
    """Compile ``sources`` -> ``so_path`` iff the srchash sidecar is
    missing/stale.  Generic -O3 (no -march=native: the .so must be safe
    to run on any x86-64 host the checkout lands on)."""
    want = source_hash(sources, flags)
    sidecar = so_path + ".srchash"
    if os.path.exists(so_path) and os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                if f.read().strip() == want:
                    return True
        except OSError:
            pass
    try:
        cmd = ["g++"] + list(flags) + list(sources) + ["-o", so_path]
        res = subprocess.run(cmd, capture_output=True, timeout=timeout)
        if res.returncode != 0:
            return False
        with open(sidecar, "w") as f:
            f.write(want)
        return True
    except Exception:
        return False


_FLAGS = ["-O3", "-fopenmp", "-shared", "-fPIC"]


def _load():
    global _lib, AVAILABLE
    with _LOCK:
        if _lib is not None:
            return _lib
        if not build_so(_SOURCES, _SO, _FLAGS):
            AVAILABLE = False
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            AVAILABLE = False
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.rowwise_sample_uniform.restype = ctypes.c_int64
        lib.rowwise_sample_uniform.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_uint64, i64p, i64p]
        lib.compact_ids.restype = ctypes.c_int64
        lib.compact_ids.argtypes = [i64p, ctypes.c_int64, i64p,
                                    ctypes.c_int64, ctypes.c_int64, i64p,
                                    i64p, i64p]
        lib.tiled_count.restype = ctypes.c_int64
        lib.tiled_count.argtypes = [i64p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64]
        lib.tiled_build.restype = ctypes.c_int64
        lib.tiled_build.argtypes = [i64p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    i32p, i32p, i32p, f32p, i32p, i32p,
                                    i64p, ctypes.c_int64]
        lib.coo_to_csr64.restype = None
        lib.coo_to_csr64.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                     i64p, i64p]
        lib.metis_kway.restype = ctypes.c_int64
        lib.metis_kway.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int,
                                   ctypes.c_double, ctypes.c_uint64, i32p]
        lib.libra_vertex_cut.restype = ctypes.c_int64
        lib.libra_vertex_cut.argtypes = [i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int, i32p]
        lib.gather_rows.restype = None
        lib.gather_rows.argtypes = [ctypes.c_char_p, i64p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_char_p]
        lib.kdtree_knn.restype = ctypes.c_int
        lib.kdtree_knn.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                   f32p, ctypes.c_int64, ctypes.c_int,
                                   i64p]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.madvise_hugepage.restype = None
        lib.madvise_hugepage.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.pack_bits32.restype = ctypes.c_int64
        lib.pack_bits32.argtypes = [i32p, i32p, ctypes.c_int64,
                                    ctypes.c_int64, u32p, ctypes.c_int64,
                                    i32p, i32p, ctypes.c_int64]
        _lib = lib
        AVAILABLE = True
        return lib


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pf32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rowwise_sample_uniform(indptr: np.ndarray, seeds: np.ndarray,
                           fanout: int, replace: bool, seed: int):
    """Returns flat positions array (into the CSC/CSR indices layout)."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = len(seeds)
    out_pos = np.empty(n * fanout, np.int64)
    out_counts = np.empty(n, np.int64)
    lib.rowwise_sample_uniform(_p64(indptr), _p64(seeds), n, fanout,
                               int(replace), seed & 0xFFFFFFFFFFFFFFFF,
                               _p64(out_pos), _p64(out_counts))
    # compact the ragged rows
    chunks = out_pos.reshape(n, fanout)
    mask = np.arange(fanout)[None, :] < out_counts[:, None]
    return chunks[mask]


def compact_ids(seeds: np.ndarray, src: np.ndarray, n_total: int):
    lib = _load()
    if lib is None:
        return None
    seeds = np.ascontiguousarray(seeds, np.int64)
    src = np.ascontiguousarray(src, np.int64)
    src_local = np.empty(len(src), np.int64)
    uniq = np.empty(len(seeds) + len(src), np.int64)
    scratch = np.empty(n_total, np.int64)
    n = lib.compact_ids(_p64(seeds), len(seeds), _p64(src), len(src),
                        n_total, _p64(src_local), _p64(uniq), _p64(scratch))
    return src_local, uniq[:n]


def tiled_build(row: np.ndarray, col: np.ndarray, num_src: int,
                num_dst: int, tile: int, cap: int):
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    E = len(row)
    B = lib.tiled_count(_p64(row), _p64(col), E, num_src, num_dst, tile,
                        cap)
    B = max(int(B), 1)
    n_src_tiles = -(-num_src // tile)
    n_dst_tiles = -(-num_dst // tile)
    n_pairs = n_src_tiles * n_dst_tiles
    src_local = np.zeros(B * cap, np.int32)
    dst_local = np.zeros(B * cap, np.int32)
    eid = np.zeros(B * cap, np.int32)
    valid = np.zeros(B * cap, np.float32)
    src_tile = np.zeros(B, np.int32)
    dst_tile = np.zeros(B, np.int32)
    pair_count = np.zeros(n_pairs + 1, np.int64)
    lib.tiled_build(_p64(row), _p64(col), E, num_src, num_dst, tile, cap,
                    _p32(src_local), _p32(dst_local), _p32(eid),
                    _pf32(valid), _p32(src_tile), _p32(dst_tile),
                    _p64(pair_count), n_pairs)
    return (src_local.reshape(B, cap), dst_local.reshape(B, cap),
            eid.reshape(B, cap), valid.reshape(B, cap), src_tile, dst_tile)


def coo_to_csr(row: np.ndarray, n_rows: int):
    """(indptr, eids) with eids = positions sorted stably by row."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    E = len(row)
    indptr = np.empty(n_rows + 1, np.int64)
    eids = np.empty(E, np.int64)
    lib.coo_to_csr64(_p64(row), E, n_rows, _p64(indptr), _p64(eids))
    return indptr, eids


def metis_kway(indptr: np.ndarray, indices: np.ndarray, nparts: int,
               imbalance: float = 1.05, seed: int = 1):
    """Multilevel k-way partition of a symmetric CSR graph.
    Returns (part ids int32, edgecut) or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    n = len(indptr) - 1
    out = np.empty(n, np.int32)
    cut = lib.metis_kway(_p64(indptr), _p64(indices), n, int(nparts),
                         float(imbalance), seed & 0xFFFFFFFFFFFFFFFF,
                         _p32(out))
    return out, int(cut)


def libra_vertex_cut(row: np.ndarray, col: np.ndarray, num_nodes: int,
                     nparts: int):
    """Edge-balanced vertex-cut. Returns (edge part ids, replication)."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    out = np.empty(len(row), np.int32)
    rep = lib.libra_vertex_cut(_p64(row), _p64(col), len(row),
                               int(num_nodes), int(nparts), _p32(out))
    return out, int(rep)


# eagerly try to load so AVAILABLE is accurate at import
_load()


def gather_rows(src: np.ndarray, idx: np.ndarray):
    """Parallel out[i] = src[idx[i]] for C-contiguous host arrays; None
    if the native lib is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    if not src.flags["C_CONTIGUOUS"]:
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    # bounds check before handing idx to native memcpy: an out-of-range
    # index must surface as a numpy IndexError (caller falls back), not an
    # OOB read/segfault in C
    if len(idx) and (idx.min() < 0 or idx.max() >= len(src)):
        return None
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    row_bytes = int(src.dtype.itemsize * np.prod(src.shape[1:], dtype=np.int64)) if src.ndim > 1 else src.dtype.itemsize
    lib.gather_rows(src.ctypes.data_as(ctypes.c_char_p), _p64(idx),
                    len(idx), row_bytes,
                    out.ctypes.data_as(ctypes.c_char_p))
    return out


def madvise_hugepage(arr: np.ndarray) -> None:
    """Advise THP for a large array's pages (madvise-only THP hosts pay
    ~45 s of 4 KB minor faults per 7 GB of fresh anonymous memory on
    first touch; 2 MB pages cut that to <1 s).  Call right after
    allocating a multi-GB np.empty, BEFORE first touch.  No-op when the
    native lib is unavailable."""
    lib = _load()
    if lib is None or arr.nbytes < (1 << 26):
        return
    lib.madvise_hugepage(ctypes.c_void_p(arr.ctypes.data), arr.nbytes)


def pack_bits32(row: np.ndarray, col: np.ndarray, k_pad: int, n32: int):
    """Bit-packed adjacency: returns (packed uint32 (k_pad, n32),
    rem_dst, rem_src int32) or None if the lib is unavailable.  Layout
    matches ``ops/pallas/bitmm.pack_bits`` (bit = src // n32,
    word = src % n32); extra duplicate occurrences land in the COO
    remainder, one entry each (weight 1)."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    packed = np.empty(k_pad * n32, np.uint32)  # zeroed inside the call
    cap = 1 << 20
    while True:
        rd = np.empty(cap, np.int32)
        rs = np.empty(cap, np.int32)
        found = lib.pack_bits32(
            _p32(row), _p32(col), len(row), n32,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(packed), _p32(rd), _p32(rs), cap)
        if found <= cap:
            return packed.reshape(k_pad, n32), rd[:found], rs[:found]
        cap = int(found) + 1024


def kdtree_knn(points: np.ndarray, queries: np.ndarray, k: int):
    """Exact L2 KNN via the native kd-tree; (m, k) int64 indices
    (nearest first) or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, d = points.shape
    m = len(queries)
    out = np.empty((m, k), np.int64)
    rc = lib.kdtree_knn(_pf32(points), n, d, _pf32(queries), m, k,
                        _p64(out))
    return out if rc == 0 else None
