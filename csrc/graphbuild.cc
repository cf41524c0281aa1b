// Host-side graph construction accelerators for pamnet_tpu.
//
// Native (C++) replacements for the neighbor-search / sparse-expansion work
// the reference delegates to the CUDA wheels torch_cluster and torch_sparse
// (reference: models.py:110,143 radius/knn; models.py:68-98 SparseTensor CSR
// triplet expansion).  On TPU systems this work lives on the host data path,
// so it is implemented as a plain shared library bound via ctypes
// (pamnet_tpu/data/native.py); the numpy implementations remain the
// always-available fallback and correctness oracle.
//
// Output convention (all functions): results are written into caller-supplied
// buffers using a two-region layout — first array at out[0..m), second at
// out[cap..cap+m) — and the row count m is returned (-1 on capacity
// overflow, so callers can retry with a larger buffer).
//
// Build: make -C csrc   (produces libgraphbuild.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Per-graph contiguous ranges from a sorted graph-indicator vector.
static std::vector<std::pair<int64_t, int64_t>> graph_ranges(
    const int64_t* batch, int64_t n) {
  std::vector<std::pair<int64_t, int64_t>> ranges;
  int64_t start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || batch[i] != batch[start]) {
      ranges.emplace_back(start, i);
      start = i;
    }
  }
  return ranges;
}

struct Cell {
  int32_t x, y, z;
};

}  // namespace

extern "C" {

// All (query, source) pairs within radius r inside each graph, self included,
// query-major order, at most max_nb sources per query (torch_cluster.radius
// semantics as used at reference models.py:110).
int64_t radius_graph(const float* pos, const int64_t* batch, int64_t n,
                     float r, int64_t max_nb, int32_t* out, int64_t cap) {
  const float r2 = r * r;
  int64_t m = 0;
  for (const auto& [lo, hi] : graph_ranges(batch, n)) {
    const int64_t gn = hi - lo;
    if (gn <= 0) continue;
    // Cell list with cell size r: neighbor candidates live in the 27
    // adjacent cells.  Falls back gracefully for small graphs.
    float mn[3] = {1e30f, 1e30f, 1e30f};
    for (int64_t i = lo; i < hi; ++i)
      for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], pos[i * 3 + d]);
    auto cell_of = [&](int64_t i) -> Cell {
      return Cell{(int32_t)((pos[i * 3 + 0] - mn[0]) / r),
                  (int32_t)((pos[i * 3 + 1] - mn[1]) / r),
                  (int32_t)((pos[i * 3 + 2] - mn[2]) / r)};
    };
    // Bucket points by cell key.
    std::vector<std::pair<uint64_t, int64_t>> keyed(gn);
    auto key_of = [](const Cell& c) -> uint64_t {
      return ((uint64_t)(uint32_t)c.x << 42) ^ ((uint64_t)(uint32_t)c.y << 21) ^
             (uint64_t)(uint32_t)c.z;
    };
    for (int64_t i = 0; i < gn; ++i) keyed[i] = {key_of(cell_of(lo + i)), lo + i};
    std::sort(keyed.begin(), keyed.end());
    auto bucket = [&](uint64_t key, int64_t& b_lo, int64_t& b_hi) {
      auto it = std::lower_bound(
          keyed.begin(), keyed.end(), std::make_pair(key, (int64_t)-1));
      b_lo = it - keyed.begin();
      auto it2 = std::upper_bound(
          keyed.begin(), keyed.end(), std::make_pair(key, (int64_t)1 << 62));
      b_hi = it2 - keyed.begin();
    };
    for (int64_t q = lo; q < hi; ++q) {
      const Cell c = cell_of(q);
      int64_t taken = 0;
      for (int dx = -1; dx <= 1 && taken < max_nb; ++dx)
        for (int dy = -1; dy <= 1 && taken < max_nb; ++dy)
          for (int dz = -1; dz <= 1 && taken < max_nb; ++dz) {
            Cell cc{c.x + dx, c.y + dy, c.z + dz};
            int64_t b_lo, b_hi;
            bucket(key_of(cc), b_lo, b_hi);
            for (int64_t bi = b_lo; bi < b_hi && taken < max_nb; ++bi) {
              const int64_t s = keyed[bi].second;
              const float ddx = pos[q * 3] - pos[s * 3];
              const float ddy = pos[q * 3 + 1] - pos[s * 3 + 1];
              const float ddz = pos[q * 3 + 2] - pos[s * 3 + 2];
              if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
                if (m >= cap) return -1;
                out[m] = (int32_t)q;
                out[cap + m] = (int32_t)s;
                ++m;
                ++taken;
              }
            }
          }
    }
  }
  return m;
}

// k nearest sources per query within each graph, self included, ties broken
// by index (torch_cluster.knn semantics as used at reference models.py:143).
int64_t knn_graph(const float* pos, const int64_t* batch, int64_t n, int64_t k,
                  int32_t* out, int64_t cap) {
  int64_t m = 0;
  std::vector<std::pair<float, int64_t>> d;
  for (const auto& [lo, hi] : graph_ranges(batch, n)) {
    const int64_t gn = hi - lo;
    const int64_t kk = std::min<int64_t>(k, gn);
    d.resize(gn);
    for (int64_t q = lo; q < hi; ++q) {
      for (int64_t s = lo; s < hi; ++s) {
        const float dx = pos[q * 3] - pos[s * 3];
        const float dy = pos[q * 3 + 1] - pos[s * 3 + 1];
        const float dz = pos[q * 3 + 2] - pos[s * 3 + 2];
        d[s - lo] = {dx * dx + dy * dy + dz * dz, s};
      }
      std::partial_sort(d.begin(), d.begin() + kk, d.end());
      for (int64_t j = 0; j < kk; ++j) {
        if (m >= cap) return -1;
        out[m] = (int32_t)q;
        out[cap + m] = (int32_t)d[j].second;
        ++m;
      }
    }
  }
  return m;
}

// For each edge e, enumerate all edge ids e' with dst[e'] == anchor[e]
// (anchor = src for two-hop triplets, dst for one-hop pairs — the CSR
// expansion behind reference models.py:74-97).  Returns pairs
// (outer=e, inner=e').
int64_t expand_incoming(const int32_t* src, int64_t e, int64_t n_nodes,
                        const int32_t* dst, const int32_t* anchor,
                        int32_t /*anchor_is_src*/, int32_t* out, int64_t cap) {
  // CSR of incoming edges per node (stable order like numpy argsort-stable).
  std::vector<int64_t> counts(n_nodes + 1, 0);
  for (int64_t i = 0; i < e; ++i) counts[dst[i] + 1]++;
  for (int64_t v = 0; v < n_nodes; ++v) counts[v + 1] += counts[v];
  std::vector<int32_t> in_edges(e);
  {
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < e; ++i) in_edges[cursor[dst[i]]++] = (int32_t)i;
  }
  int64_t m = 0;
  for (int64_t i = 0; i < e; ++i) {
    const int32_t a = anchor[i];
    for (int64_t p = counts[a]; p < counts[a + 1]; ++p) {
      if (m >= cap) return -1;
      out[m] = (int32_t)i;          // outer edge id
      out[cap + m] = in_edges[p];   // inner edge id
      ++m;
    }
  }
  return m;
}

// Batch collation fast path (one pass, writes directly into the padded
// output — the python path pays a concat copy plus a pad copy per field).
// Concatenate n_arr int32 arrays, adding offs[a] to every element of array
// a; zero-fill the padded tail.  Returns total valid rows, or -1 on
// overflow of out_len.
int64_t concat_offset_i32(const int32_t* const* srcs, const int64_t* lens,
                          const int32_t* offs, int64_t n_arr, int32_t* out,
                          int64_t out_len) {
  int64_t m = 0;
  for (int64_t a = 0; a < n_arr; ++a) {
    if (m + lens[a] > out_len) return -1;
    const int32_t o = offs[a];
    const int32_t* s = srcs[a];
    for (int64_t i = 0; i < lens[a]; ++i) out[m + i] = s[i] + o;
    m += lens[a];
  }
  std::fill(out + m, out + out_len, 0);
  return m;
}

// Concatenate n_arr float32 row blocks (lens[a] rows of row_w floats each);
// zero-fill the padded tail rows.  Returns total valid rows, or -1 on
// overflow of out_rows.
int64_t concat_rows_f32(const float* const* srcs, const int64_t* lens,
                        int64_t row_w, int64_t n_arr, float* out,
                        int64_t out_rows) {
  int64_t m = 0;
  for (int64_t a = 0; a < n_arr; ++a) {
    if (m + lens[a] > out_rows) return -1;
    std::copy(srcs[a], srcs[a] + lens[a] * row_w, out + m * row_w);
    m += lens[a];
  }
  std::fill(out + m * row_w, out + out_rows * row_w, 0.0f);
  return m;
}

// ELL aggregation-table construction (counting sort): group the first
// n_valid row ids by value into a fixed-width (num_groups, k) table + mask
// (the host-side builder behind pamnet_tpu/ops/ell.py; python fallback is
// build_ell_table_np).  Returns 0, or -1 if a group exceeds k.
int64_t ell_table(const int32_t* ids, int64_t n_valid, int64_t num_groups,
                  int64_t k, int32_t* table, float* mask) {
  std::fill(table, table + num_groups * k, 0);
  std::fill(mask, mask + num_groups * k, 0.0f);
  std::vector<int64_t> cursor(num_groups, 0);
  for (int64_t r = 0; r < n_valid; ++r) {
    const int32_t g = ids[r];
    if (g < 0 || g >= num_groups) return -2;
    const int64_t c = cursor[g]++;
    if (c >= k) return -1;
    table[g * k + c] = (int32_t)r;
    mask[g * k + c] = 1.0f;
  }
  return 0;
}

}  // extern "C"
