// Native host kernels for dgl_tpu.
//
// TPU-native counterpart of the reference's C++ host paths:
//  * rowwise neighbor sampling   (ref: src/array/cpu/rowwise_pick.h,
//    rowwise_sampling.cc — OpenMP parallel pickers)
//  * id compaction for to_block  (ref: src/array/cpu/
//    concurrent_id_hash_map.cc)
//  * tile-bucket format builder  (feeds the Pallas tile-dense SpMM; the
//    counting-sort replaces an 18s numpy argsort at Reddit scale)
//
// Exposed as extern "C" and loaded via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC kernels.cpp -o
//        libdgltpu.so
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif
#ifdef __linux__
#include <sys/mman.h>
#endif

extern "C" {

// Ask the kernel for transparent huge pages on [ptr, ptr+len): this
// container runs THP in madvise-only mode, and first-touch minor faults
// on multi-GB anonymous buffers cost ~45 s per 7 GB at 4 KB granularity
// (Firecracker guest) vs <1 s at 2 MB.  Safe no-op on failure.
void madvise_hugepage(void* ptr, int64_t len) {
#ifdef __linux__
  const uintptr_t addr = reinterpret_cast<uintptr_t>(ptr);
  const uintptr_t start = addr & ~static_cast<uintptr_t>(4095);
  madvise(reinterpret_cast<void*>(start),
          static_cast<size_t>(len) + (addr - start), MADV_HUGEPAGE);
#endif
}

// ---------------------------------------------------------------------------
// Uniform rowwise sampling.
//   indptr: (n_rows+1,) int64 CSC/CSR offsets
//   seeds:  (n_seeds,) int64 row ids
//   fanout: k (>0); replace: 0/1
// Output:
//   out_pos: (n_seeds*k,) int64 — positions into the indices array; only the
//            first out_counts[i] entries of row i's slice are valid.
//   out_counts: (n_seeds,) int64
// Returns total picked.
int64_t rowwise_sample_uniform(const int64_t* indptr, const int64_t* seeds,
                               int64_t n_seeds, int64_t fanout, int replace,
                               uint64_t seed, int64_t* out_pos,
                               int64_t* out_counts) {
#pragma omp parallel
  {
#ifdef _OPENMP
    int tid = omp_get_thread_num();
#else
    int tid = 0;
#endif
    std::mt19937_64 rng(seed * 0x9e3779b97f4a7c15ULL + tid);
#pragma omp for schedule(dynamic, 64)
    for (int64_t i = 0; i < n_seeds; ++i) {
      const int64_t row = seeds[i];
      const int64_t lo = indptr[row], hi = indptr[row + 1];
      const int64_t deg = hi - lo;
      int64_t* out = out_pos + i * fanout;
      if (deg == 0) {
        out_counts[i] = 0;
        continue;
      }
      if (!replace && deg <= fanout) {
        for (int64_t j = 0; j < deg; ++j) out[j] = lo + j;
        out_counts[i] = deg;
      } else if (replace) {
        for (int64_t j = 0; j < fanout; ++j)
          out[j] = lo + (int64_t)(rng() % (uint64_t)deg);
        out_counts[i] = fanout;
      } else {
        // Floyd's algorithm: k distinct samples from [0, deg)
        // for small k relative to deg; fallback to reservoir for dense.
        if (fanout * 4 < deg) {
          // store chosen in small local set (linear probe over out[])
          int64_t cnt = 0;
          for (int64_t j = deg - fanout; j < deg; ++j) {
            int64_t t = (int64_t)(rng() % (uint64_t)(j + 1));
            bool dup = false;
            for (int64_t q = 0; q < cnt; ++q)
              if (out[q] == lo + t) { dup = true; break; }
            out[cnt++] = lo + (dup ? j : t);
          }
          out_counts[i] = fanout;
        } else {
          // partial Fisher-Yates over a scratch index array
          std::vector<int64_t> idx(deg);
          for (int64_t j = 0; j < deg; ++j) idx[j] = j;
          for (int64_t j = 0; j < fanout; ++j) {
            int64_t t = j + (int64_t)(rng() % (uint64_t)(deg - j));
            std::swap(idx[j], idx[t]);
            out[j] = lo + idx[j];
          }
          out_counts[i] = fanout;
        }
      }
    }
  }
  int64_t total = 0;
  for (int64_t i = 0; i < n_seeds; ++i) total += out_counts[i];
  return total;
}

// ---------------------------------------------------------------------------
// Id compaction (to_block): assign dense local ids, seeds first (prefix),
// then unseen sources in first-visit order.
//   seeds: (n_seeds,) int64 global ids (become local 0..n_seeds-1)
//   src:   (n_src,) int64 global ids of edge sources (visit order)
//   n_total: size of the global id space (for the position map)
// Output:
//   src_local: (n_src,) int64 — local id per source entry
//   uniq:      (cap >= n_seeds + n_src,) int64 — global id per local id
// Returns number of unique locals.
int64_t compact_ids(const int64_t* seeds, int64_t n_seeds,
                    const int64_t* src, int64_t n_src, int64_t n_total,
                    int64_t* src_local, int64_t* uniq, int64_t* scratch) {
  // scratch: (n_total,) int64 workspace, caller-provided, NOT initialized.
  // We use a generation-free approach: fill with -1 (memset not valid for
  // -1 via int64; use std::fill — O(n_total) but vectorized & cheap).
  std::fill(scratch, scratch + n_total, (int64_t)-1);
  int64_t next = 0;
  for (int64_t i = 0; i < n_seeds; ++i) {
    scratch[seeds[i]] = next;
    uniq[next] = seeds[i];
    ++next;
  }
  for (int64_t i = 0; i < n_src; ++i) {
    int64_t g = src[i];
    int64_t p = scratch[g];
    if (p < 0) {
      p = next;
      scratch[g] = p;
      uniq[next] = g;
      ++next;
    }
    src_local[i] = p;
  }
  return next;
}

// ---------------------------------------------------------------------------
// Tile-bucket format builder (counting sort by (dst_tile, src_tile) pair).
//   row/col: (E,) int64 edge endpoints
//   tile, cap: bucket geometry
// Phase 1 (count): returns number of buckets B given the pair histogram.
// Phase 2 (fill): caller allocates (B*cap) outputs; we fill them.
// Combined into one call with caller-provided scratch histogram.
int64_t tiled_build(const int64_t* row, const int64_t* col, int64_t E,
                    int64_t num_src, int64_t num_dst, int64_t tile,
                    int64_t cap,
                    // outputs (caller sized from tiled_count):
                    int32_t* src_local, int32_t* dst_local, int32_t* eid,
                    float* valid, int32_t* src_tile, int32_t* dst_tile,
                    // scratch: (n_pairs+1,) int64 zeroed by caller
                    int64_t* pair_count, int64_t n_pairs) {
  const int64_t n_src_tiles = (num_src + tile - 1) / tile;
  // count edges per pair
  for (int64_t e = 0; e < E; ++e) {
    int64_t key = (col[e] / tile) * n_src_tiles + (row[e] / tile);
    pair_count[key + 1]++;
  }
  // bucket ids per pair (prefix): pair p occupies ceil(count/cap) buckets
  int64_t B = 0;
  std::vector<int64_t> pair_bucket_start(n_pairs + 1);
  for (int64_t p = 0; p < n_pairs; ++p) {
    pair_bucket_start[p] = B;
    B += (pair_count[p + 1] + cap - 1) / cap;
  }
  pair_bucket_start[n_pairs] = B;
  // init outputs
  std::fill(eid, eid + B * cap, (int32_t)-1);
  std::memset(valid, 0, sizeof(float) * B * cap);
  std::memset(src_local, 0, sizeof(int32_t) * B * cap);
  std::memset(dst_local, 0, sizeof(int32_t) * B * cap);
  // fill cursor per pair
  std::vector<int64_t> cursor(n_pairs, 0);
  for (int64_t e = 0; e < E; ++e) {
    const int64_t dt = col[e] / tile, st = row[e] / tile;
    const int64_t key = dt * n_src_tiles + st;
    const int64_t c = cursor[key]++;
    const int64_t b = pair_bucket_start[key] + c / cap;
    const int64_t slot = c % cap;
    src_local[b * cap + slot] = (int32_t)(row[e] % tile);
    dst_local[b * cap + slot] = (int32_t)(col[e] % tile);
    eid[b * cap + slot] = (int32_t)e;
    valid[b * cap + slot] = 1.0f;
    src_tile[b] = (int32_t)st;
    dst_tile[b] = (int32_t)dt;
  }
  return B;
}

// count-only variant so the caller can size outputs
int64_t tiled_count(const int64_t* row, const int64_t* col, int64_t E,
                    int64_t num_src, int64_t num_dst, int64_t tile,
                    int64_t cap) {
  const int64_t n_src_tiles = (num_src + tile - 1) / tile;
  const int64_t n_dst_tiles = (num_dst + tile - 1) / tile;
  const int64_t n_pairs = n_src_tiles * n_dst_tiles;
  std::vector<int64_t> cnt(n_pairs, 0);
  for (int64_t e = 0; e < E; ++e)
    cnt[(col[e] / tile) * n_src_tiles + (row[e] / tile)]++;
  int64_t B = 0;
  for (int64_t p = 0; p < n_pairs; ++p) B += (cnt[p] + cap - 1) / cap;
  return B;
}

// ---------------------------------------------------------------------------
// COO -> CSR conversion (counting sort; ref src/array csr/coo algebra).
void coo_to_csr64(const int64_t* row, int64_t E, int64_t n_rows,
                  int64_t* indptr, int64_t* eids) {
  std::fill(indptr, indptr + n_rows + 1, 0);
  for (int64_t e = 0; e < E; ++e) indptr[row[e] + 1]++;
  for (int64_t r = 0; r < n_rows; ++r) indptr[r + 1] += indptr[r];
  std::vector<int64_t> cursor(indptr, indptr + n_rows);
  for (int64_t e = 0; e < E; ++e) eids[cursor[row[e]]++] = e;
}

// ---------------------------------------------------------------------------
// Parallel row gather: out[i] = src[idx[i]] (bytes-per-row generic).
// The dataloading hot path (block feature slicing) is a large strided
// memcpy — OpenMP across rows beats numpy's single-threaded fancy
// indexing ~3-4x on many-core hosts.
void gather_rows(const char* src, const int64_t* idx, int64_t n_rows,
                 int64_t row_bytes, char* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    std::memcpy(out + i * row_bytes, src + idx[i] * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

// ---------------------------------------------------------------------------
// Bit-packed adjacency builder (feeds ops/pallas/bitmm.py).
// Layout contract (must match bitmm.pack_bits): bit b of word
// packed[d, j] is set iff the edge (src = b*n32 + j) -> (dst = d)
// exists, i.e. word index = d*n32 + (s % n32), bit = s / n32.
// packed may arrive UNINITIALIZED (np.empty, words words_len =
// k_pad*n32): it is zeroed here with a sequential memset — faulting the
// multi-GB buffer in address order keeps transparent huge pages intact
// (random-order first touch from the packing loop costs ~10x more in
// minor faults).  Duplicate edge occurrences beyond the first are
// emitted to the COO remainder (rem_dst/rem_src, each extra occurrence
// once, weight 1 — numerically identical to the numpy builder's
// aggregated counts).  Returns the number of duplicates FOUND; only
// min(found, rem_cap) are written, so a caller seeing found > rem_cap
// must call again with bigger buffers.
// Replaces a ~213 s numpy sort/unique pipeline with one O(E) pass of
// atomic fetch-OR (the returned old word doubles as the dup test).
int64_t pack_bits32(const int32_t* row, const int32_t* col, int64_t E,
                    int64_t n32, uint32_t* packed, int64_t words_len,
                    int32_t* rem_dst, int32_t* rem_src, int64_t rem_cap) {
  madvise_hugepage(packed, words_len * 4);
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < words_len; c += (1 << 22)) {
    const int64_t n = std::min<int64_t>(1 << 22, words_len - c);
    std::memset(packed + c, 0, static_cast<size_t>(n) * 4);
  }
  std::atomic<int64_t> n_rem(0);
#pragma omp parallel for schedule(static)
  for (int64_t e = 0; e < E; ++e) {
    const int64_t s = row[e], d = col[e];
    const uint32_t bit = 1u << (s / n32);
    uint32_t* word = packed + d * n32 + (s % n32);
    const uint32_t old =
        __atomic_fetch_or(word, bit, __ATOMIC_RELAXED);
    if (old & bit) {
      const int64_t slot = n_rem.fetch_add(1, std::memory_order_relaxed);
      if (slot < rem_cap) {
        rem_dst[slot] = static_cast<int32_t>(d);
        rem_src[slot] = static_cast<int32_t>(s);
      }
    }
  }
  return n_rem.load();
}

}  // extern "C"
