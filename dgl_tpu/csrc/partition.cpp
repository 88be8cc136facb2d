// Native multilevel k-way graph partitioner + Libra vertex-cut.
//
// TPU-native counterpart of the reference's partitioning natives:
//  * METIS k-way partitioning (ref: src/graph/transform/
//    metis_partition_hetero.cc:133, third_party/METIS) — re-implemented
//    from scratch as a classic multilevel scheme: heavy-edge-matching
//    coarsening, greedy graph-growing initial partition, and per-level
//    greedy boundary (FM-style) refinement under a balance constraint.
//  * Libra edge-balanced vertex-cut (ref: src/array/libra_partition.cc)
//    — greedy least-replication edge assignment with capacity.
//
// Exposed as extern "C" and loaded via ctypes.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

struct Level {
  std::vector<int64_t> indptr;
  std::vector<int64_t> indices;
  std::vector<int64_t> ewgt;   // edge weights (aggregated multiplicities)
  std::vector<int64_t> vwgt;   // vertex weights (aggregated fine vertices)
  std::vector<int64_t> cmap;   // fine vertex -> coarse vertex (next level)
  int64_t n = 0;
};

// Heavy-edge matching: returns number of coarse vertices, fills cmap.
int64_t hem_match(const Level& g, std::mt19937_64* rng,
                  std::vector<int64_t>* cmap) {
  const int64_t n = g.n;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::shuffle(order.begin(), order.end(), *rng);
  std::vector<int64_t> match(n, -1);
  cmap->assign(n, -1);
  int64_t nc = 0;
  for (int64_t v : order) {
    if (match[v] != -1) continue;
    int64_t best = -1, best_w = -1;
    for (int64_t p = g.indptr[v]; p < g.indptr[v + 1]; ++p) {
      const int64_t u = g.indices[p];
      if (u == v || match[u] != -1) continue;
      if (g.ewgt[p] > best_w) {
        best_w = g.ewgt[p];
        best = u;
      }
    }
    if (best >= 0) {
      match[v] = best;
      match[best] = v;
      (*cmap)[v] = (*cmap)[best] = nc++;
    } else {
      match[v] = v;
      (*cmap)[v] = nc++;
    }
  }
  return nc;
}

Level coarsen(const Level& g, int64_t nc, const std::vector<int64_t>& cmap) {
  Level c;
  c.n = nc;
  c.vwgt.assign(nc, 0);
  for (int64_t v = 0; v < g.n; ++v) c.vwgt[cmap[v]] += g.vwgt[v];
  // aggregate edges: bucket by coarse src
  std::vector<std::vector<std::pair<int64_t, int64_t>>> adj(nc);
  for (int64_t v = 0; v < g.n; ++v) {
    const int64_t cv = cmap[v];
    for (int64_t p = g.indptr[v]; p < g.indptr[v + 1]; ++p) {
      const int64_t cu = cmap[g.indices[p]];
      if (cu != cv) adj[cv].emplace_back(cu, g.ewgt[p]);
    }
  }
  c.indptr.assign(nc + 1, 0);
  for (int64_t v = 0; v < nc; ++v) {
    auto& a = adj[v];
    std::sort(a.begin(), a.end());
    // merge duplicates
    int64_t w = 0;
    for (size_t i = 0; i < a.size();) {
      size_t j = i;
      int64_t acc = 0;
      while (j < a.size() && a[j].first == a[i].first) acc += a[j++].second;
      a[w++] = {a[i].first, acc};
      i = j;
    }
    a.resize(w);
    c.indptr[v + 1] = c.indptr[v] + w;
  }
  c.indices.resize(c.indptr[nc]);
  c.ewgt.resize(c.indptr[nc]);
  for (int64_t v = 0; v < nc; ++v) {
    int64_t off = c.indptr[v];
    for (auto& e : adj[v]) {
      c.indices[off] = e.first;
      c.ewgt[off] = e.second;
      ++off;
    }
  }
  return c;
}

// Greedy graph-growing initial partition on the coarsest graph.
void initial_partition(const Level& g, int nparts, int64_t total_vwgt,
                       std::mt19937_64* rng, std::vector<int32_t>* part) {
  part->assign(g.n, -1);
  const int64_t target = (total_vwgt + nparts - 1) / nparts;
  std::vector<int64_t> order(g.n);
  std::iota(order.begin(), order.end(), 0);
  // grow from high-degree seeds for stability
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return g.indptr[a + 1] - g.indptr[a] > g.indptr[b + 1] - g.indptr[b];
  });
  int64_t cursor = 0;
  for (int p = 0; p < nparts - 1; ++p) {
    int64_t w = 0;
    std::queue<int64_t> q;
    while (w < target) {
      if (q.empty()) {
        while (cursor < g.n && (*part)[order[cursor]] != -1) ++cursor;
        if (cursor >= g.n) break;
        q.push(order[cursor]);
        (*part)[order[cursor]] = p;
        w += g.vwgt[order[cursor]];
      }
      const int64_t v = q.front();
      q.pop();
      for (int64_t e = g.indptr[v]; e < g.indptr[v + 1] && w < target; ++e) {
        const int64_t u = g.indices[e];
        if ((*part)[u] == -1) {
          (*part)[u] = p;
          w += g.vwgt[u];
          q.push(u);
        }
      }
    }
  }
  for (int64_t v = 0; v < g.n; ++v)
    if ((*part)[v] == -1) (*part)[v] = nparts - 1;
}

// Greedy boundary refinement (one level of k-way FM without rollback).
void refine(const Level& g, int nparts, double imbalance,
            std::vector<int32_t>* part) {
  const int64_t n = g.n;
  std::vector<int64_t> pw(nparts, 0);
  int64_t total = 0;
  for (int64_t v = 0; v < n; ++v) {
    pw[(*part)[v]] += g.vwgt[v];
    total += g.vwgt[v];
  }
  const int64_t maxw =
      static_cast<int64_t>(imbalance * (double(total) / nparts)) + 1;
  std::vector<int64_t> conn(nparts);
  for (int pass = 0; pass < 8; ++pass) {
    int64_t moves = 0;
    for (int64_t v = 0; v < n; ++v) {
      const int32_t a = (*part)[v];
      std::fill(conn.begin(), conn.end(), 0);
      bool boundary = false;
      for (int64_t e = g.indptr[v]; e < g.indptr[v + 1]; ++e) {
        const int32_t pb = (*part)[g.indices[e]];
        conn[pb] += g.ewgt[e];
        if (pb != a) boundary = true;
      }
      if (!boundary) continue;
      int32_t best = a;
      int64_t best_gain = 0;
      for (int32_t b = 0; b < nparts; ++b) {
        if (b == a || pw[b] + g.vwgt[v] > maxw) continue;
        const int64_t gain = conn[b] - conn[a];
        if (gain > best_gain ||
            (gain == best_gain && gain > 0 && pw[b] < pw[best])) {
          best_gain = gain;
          best = b;
        }
      }
      // also allow zero-gain balance moves away from overweight parts
      if (best == a && pw[a] > maxw) {
        int32_t lightest = a;
        for (int32_t b = 0; b < nparts; ++b)
          if (pw[b] < pw[lightest]) lightest = b;
        if (lightest != a && conn[lightest] >= 0) best = lightest;
      }
      if (best != a) {
        pw[a] -= g.vwgt[v];
        pw[best] += g.vwgt[v];
        (*part)[v] = best;
        ++moves;
      }
    }
    if (moves == 0) break;
  }
}

int64_t edgecut(const Level& g, const std::vector<int32_t>& part) {
  int64_t cut = 0;
  for (int64_t v = 0; v < g.n; ++v)
    for (int64_t e = g.indptr[v]; e < g.indptr[v + 1]; ++e)
      if (part[g.indices[e]] != part[v]) cut += g.ewgt[e];
  return cut / 2;
}

}  // namespace

extern "C" {

// Multilevel k-way partition of a symmetric graph in CSR.
// Returns the edge cut.  imbalance e.g. 1.05.
int64_t metis_kway(const int64_t* indptr, const int64_t* indices, int64_t n,
                   int nparts, double imbalance, uint64_t seed,
                   int32_t* out_part) {
  if (nparts <= 1 || n == 0) {
    std::fill(out_part, out_part + n, 0);
    return 0;
  }
  std::mt19937_64 rng(seed ? seed : 0x2545F4914F6CDD1DULL);
  std::vector<Level> levels;
  levels.emplace_back();
  Level& g0 = levels.back();
  g0.n = n;
  g0.indptr.assign(indptr, indptr + n + 1);
  g0.indices.assign(indices, indices + indptr[n]);
  g0.ewgt.assign(indptr[n], 1);
  g0.vwgt.assign(n, 1);
  int64_t total_vwgt = n;

  // coarsen until small or stuck
  const int64_t coarse_target =
      std::max<int64_t>(40 * nparts, 256);
  while (levels.back().n > coarse_target) {
    Level& g = levels.back();
    std::vector<int64_t> cmap;
    const int64_t nc = hem_match(g, &rng, &cmap);
    if (nc > g.n * 95 / 100) break;  // matching stalled
    g.cmap = std::move(cmap);
    Level c = coarsen(g, nc, g.cmap);
    levels.push_back(std::move(c));
  }

  std::vector<int32_t> part;
  initial_partition(levels.back(), nparts, total_vwgt, &rng, &part);
  refine(levels.back(), nparts, imbalance, &part);

  // uncoarsen + refine
  for (int64_t li = static_cast<int64_t>(levels.size()) - 2; li >= 0; --li) {
    Level& g = levels[li];
    std::vector<int32_t> fine(g.n);
    for (int64_t v = 0; v < g.n; ++v) fine[v] = part[g.cmap[v]];
    part = std::move(fine);
    refine(g, nparts, imbalance, &part);
  }
  std::copy(part.begin(), part.end(), out_part);
  return edgecut(levels[0], part);
}

// Libra-style vertex-cut: assign each edge to a partition, greedily
// minimizing vertex replication with an edge-count capacity per part.
// Returns the replication count (sum over vertices of #parts - 1).
int64_t libra_vertex_cut(const int64_t* row, const int64_t* col, int64_t E,
                         int64_t n, int nparts, int32_t* out_edge_part) {
  std::vector<uint64_t> mask(static_cast<size_t>(n) * ((nparts + 63) / 64),
                             0);
  const int words = (nparts + 63) / 64;
  auto has = [&](int64_t v, int p) {
    return (mask[v * words + p / 64] >> (p % 64)) & 1ULL;
  };
  auto set = [&](int64_t v, int p) {
    mask[v * words + p / 64] |= 1ULL << (p % 64);
  };
  std::vector<int64_t> load(nparts, 0);
  const int64_t cap = (E + nparts - 1) / nparts + 1;
  int64_t replication = 0;
  for (int64_t e = 0; e < E; ++e) {
    const int64_t u = row[e], v = col[e];
    int best = -1;
    int best_score = -1;
    for (int p = 0; p < nparts; ++p) {
      if (load[p] >= cap) continue;
      const int score = int(has(u, p)) + int(has(v, p));
      if (score > best_score ||
          (score == best_score && best >= 0 && load[p] < load[best])) {
        best_score = score;
        best = p;
      }
    }
    if (best < 0) {  // everything at capacity: least-loaded
      best = int(std::min_element(load.begin(), load.end()) - load.begin());
    }
    if (!has(u, best)) {
      set(u, best);
      ++replication;
    }
    if (!has(v, best)) {
      set(v, best);
      ++replication;
    }
    ++load[best];
    out_edge_part[e] = best;
  }
  // replication = total copies; subtract #distinct touched vertices
  int64_t touched = 0;
  for (int64_t v = 0; v < n; ++v) {
    bool any = false;
    for (int w = 0; w < words; ++w) any |= mask[v * words + w] != 0;
    touched += any;
  }
  return replication - touched;
}

}  // extern "C"
