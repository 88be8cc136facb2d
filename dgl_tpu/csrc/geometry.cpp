// Native geometry kernels: kd-tree KNN (host).
//
// Role of the reference's src/geometry/cpu (nanoflann kd-tree KNN +
// NN-descent): exact KNN queries in low/medium dimension without the
// O(N^2) distance matrix.  From-scratch median-split kd-tree (not
// nanoflann code): build O(N log N), query branch-and-bound, OpenMP
// over queries.  extern "C" + ctypes (no pybind11 in this image).
#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <queue>
#include <vector>

namespace {

struct KDTree {
  // implicit tree over a permutation of point indices: node = range
  // [lo, hi) split at the median along axis (depth % D)
  const float* pts;
  int64_t n;
  int d;
  std::vector<int64_t> perm;

  void build(int64_t lo, int64_t hi, int depth) {
    if (hi - lo <= 1) return;
    int ax = depth % d;
    int64_t mid = lo + (hi - lo) / 2;
    std::nth_element(perm.begin() + lo, perm.begin() + mid,
                     perm.begin() + hi, [&](int64_t a, int64_t b) {
                       return pts[a * d + ax] < pts[b * d + ax];
                     });
    build(lo, mid, depth + 1);
    build(mid + 1, hi, depth + 1);
  }

  // max-heap of (dist2, idx) holding the best k so far
  using Heap = std::priority_queue<std::pair<float, int64_t>>;

  void query(const float* q, int k, int64_t lo, int64_t hi, int depth,
             Heap* heap) const {
    if (hi <= lo) return;
    int ax = depth % d;
    int64_t mid = lo + (hi - lo) / 2;
    int64_t p = perm[mid];
    float dist2 = 0.f;
    for (int j = 0; j < d; ++j) {
      float t = q[j] - pts[p * d + j];
      dist2 += t * t;
    }
    if ((int64_t)heap->size() < k) {
      heap->emplace(dist2, p);
    } else if (dist2 < heap->top().first) {
      heap->pop();
      heap->emplace(dist2, p);
    }
    float delta = q[ax] - pts[p * d + ax];
    int64_t near_lo = delta < 0 ? lo : mid + 1;
    int64_t near_hi = delta < 0 ? mid : hi;
    int64_t far_lo = delta < 0 ? mid + 1 : lo;
    int64_t far_hi = delta < 0 ? hi : mid;
    query(q, k, near_lo, near_hi, depth + 1, heap);
    if ((int64_t)heap->size() < k ||
        delta * delta < heap->top().first) {
      query(q, k, far_lo, far_hi, depth + 1, heap);
    }
  }
};

}  // namespace

extern "C" {

// out_idx: (m, k) int64 — the k nearest points (by L2) per query,
// nearest first.  Returns 0 on success.
int kdtree_knn(const float* points, int64_t n, int d, const float* queries,
               int64_t m, int k, int64_t* out_idx) {
  if (n <= 0 || k <= 0 || k > n) return -1;
  KDTree tree;
  tree.pts = points;
  tree.n = n;
  tree.d = d;
  tree.perm.resize(n);
  std::iota(tree.perm.begin(), tree.perm.end(), 0);
  tree.build(0, n, 0);
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < m; ++i) {
    KDTree::Heap heap;
    tree.query(queries + i * d, k, 0, n, 0, &heap);
    int64_t cnt = (int64_t)heap.size();
    for (int64_t j = cnt - 1; j >= 0; --j) {
      out_idx[i * k + j] = heap.top().second;
      heap.pop();
    }
    for (int64_t j = cnt; j < k; ++j) out_idx[i * k + j] = out_idx[i * k];
  }
  return 0;
}

}  // extern "C"
