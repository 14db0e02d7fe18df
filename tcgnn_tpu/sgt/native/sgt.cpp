// Native SGT tiling pass: per-row-window sort + dedup + condensed-column
// ranking, fused with dense A-tile materialization.
//
// TPU-native counterpart of the reference's C++ preprocessing
// (/root/reference/TCGNN_conv/TCGNN.cpp:157-226: per 16-row window copy
// neighbor ids, thrust::sort, in-place dedup into a map, write
// blockPartition/edgeToColumn/edgeToRow, OpenMP over windows).  Same math,
// different geometry (MXU-sized windows) and different outputs: instead of
// per-edge row/col arrays consumed by a GPU shared-memory build, we emit
//   * col_ids   [B * blk_w]  — condensed-column -> global node gather table
//   * edge_pos  [E]          — flat dense-tile slot of each CSR edge
//   * a_tiles   [B*blk_h*blk_w] (optional) — structural tiles, built here so
//     Python never rescans the edge list.
// Windows own disjoint block ranges, so the OpenMP loop is race-free.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Pass 1: number of real TC blocks per window (ceil(unique/blk_w); 0 for
// empty windows — Python applies the max(1) padding rule).
void sgt_count(int64_t n_rows, int blk_h, int blk_w,
               const int64_t* row_ptr, const int32_t* col_idx,
               int32_t* blocks_per_window /* [ceil(n_rows/blk_h)] */) {
  const int64_t n_windows = (n_rows + blk_h - 1) / blk_h;
#pragma omp parallel
  {
    std::vector<int32_t> scratch;
#pragma omp for schedule(dynamic, 16)
    for (int64_t w = 0; w < n_windows; ++w) {
      const int64_t r0 = w * blk_h;
      const int64_t r1 = std::min(r0 + blk_h, n_rows);
      const int64_t lo = row_ptr[r0], hi = row_ptr[r1];
      scratch.assign(col_idx + lo, col_idx + hi);
      std::sort(scratch.begin(), scratch.end());
      const int64_t uniq =
          std::unique(scratch.begin(), scratch.end()) - scratch.begin();
      blocks_per_window[w] = (int32_t)((uniq + blk_w - 1) / blk_w);
    }
  }
}

// Pass 2: fill col_ids / edge_pos / (optionally) structural a_tiles.
// block_start[w] = first global block of window w (Python cumsum with the
// empty-window padding applied); col_ids and a_tiles must be zeroed.
//
// tile_mode: 0 = no tiles, 1 = float32 tiles, 2 = int8 tiles (the kernels'
// storage format — duplicate-edge counts saturate at 127 and set *overflow,
// in which case the caller rebuilds in float; writing int8 directly avoids
// a 4x-larger f32 materialization plus a Python-side convert pass).
void sgt_fill(int64_t n_rows, int blk_h, int blk_w,
              const int64_t* row_ptr, const int32_t* col_idx,
              const int64_t* block_start /* [n_windows+1] */,
              int32_t* col_ids /* [B*blk_w] */,
              int64_t* edge_pos /* [nnz] */,
              void* a_tiles /* [B*blk_h*blk_w] or nullptr */,
              int tile_mode, int32_t* overflow) {
  const int64_t n_windows = (n_rows + blk_h - 1) / blk_h;
  const int64_t tile = (int64_t)blk_h * blk_w;
  float* tiles_f32 = tile_mode == 1 ? (float*)a_tiles : nullptr;
  int8_t* tiles_i8 = tile_mode == 2 ? (int8_t*)a_tiles : nullptr;
#pragma omp parallel
  {
    std::vector<int32_t> uniq;
#pragma omp for schedule(dynamic, 16)
    for (int64_t w = 0; w < n_windows; ++w) {
      const int64_t r0 = w * blk_h;
      const int64_t r1 = std::min(r0 + blk_h, n_rows);
      const int64_t lo = row_ptr[r0], hi = row_ptr[r1];
      uniq.assign(col_idx + lo, col_idx + hi);
      std::sort(uniq.begin(), uniq.end());
      uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

      const int64_t b0 = block_start[w];
      for (size_t k = 0; k < uniq.size(); ++k)
        col_ids[(b0 + (int64_t)k / blk_w) * blk_w + (int64_t)(k % blk_w)] =
            uniq[k];

      for (int64_t r = r0; r < r1; ++r) {
        for (int64_t e = row_ptr[r]; e < row_ptr[r + 1]; ++e) {
          const int64_t rank =
              std::lower_bound(uniq.begin(), uniq.end(), col_idx[e]) -
              uniq.begin();
          const int64_t blk = b0 + rank / blk_w;
          const int64_t pos =
              blk * tile + (r - r0) * (int64_t)blk_w + rank % blk_w;
          edge_pos[e] = pos;
          if (tiles_f32) {
            tiles_f32[pos] += 1.0f;
          } else if (tiles_i8) {
            // Windows own disjoint block ranges, so writes are race-free;
            // overflow is a benign write-1-only flag.
            if (tiles_i8[pos] == 127) *overflow = 1;
            else ++tiles_i8[pos];
          }
        }
      }
    }
  }
}

// Analytics: naive sliding-window tile count (no column condensation) —
// the reference's Fig-7 comparison baseline (3_cnt_TC_blk_SpMM.py:73-84:
// greedy tiles of width blk_w over each window's sorted unique columns).
void sgt_naive_count(int64_t n_rows, int blk_h, int blk_w,
                     const int64_t* row_ptr, const int32_t* col_idx,
                     int64_t* naive_per_window) {
  const int64_t n_windows = (n_rows + blk_h - 1) / blk_h;
#pragma omp parallel
  {
    std::vector<int32_t> uniq;
#pragma omp for schedule(dynamic, 16)
    for (int64_t w = 0; w < n_windows; ++w) {
      const int64_t r0 = w * blk_h;
      const int64_t r1 = std::min(r0 + blk_h, n_rows);
      uniq.assign(col_idx + row_ptr[r0], col_idx + row_ptr[r1]);
      std::sort(uniq.begin(), uniq.end());
      uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
      int64_t cnt = 0;
      size_t i = 0;
      while (i < uniq.size()) {
        const int32_t end = uniq[i] + blk_w;
        i = std::lower_bound(uniq.begin() + i, uniq.end(), end) - uniq.begin();
        ++cnt;
      }
      naive_per_window[w] = cnt;
    }
  }
}

// Reverse Cuthill-McKee ordering over a *symmetric* CSR (caller passes
// A + A^T).  BFS from min-degree seeds, neighbors enqueued in degree order,
// final order reversed.  Replaces scipy's implementation, which takes ~70 s
// on 3M-edge graphs where this takes ~1 s.
void sgt_rcm(int64_t n, const int64_t* row_ptr, const int32_t* col_idx,
             int32_t* perm_out /* [n]: perm[new] = old */) {
  std::vector<int64_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = row_ptr[i + 1] - row_ptr[i];

  std::vector<int32_t> by_deg(n);
  for (int64_t i = 0; i < n; ++i) by_deg[i] = (int32_t)i;
  std::sort(by_deg.begin(), by_deg.end(),
            [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });

  std::vector<char> visited(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<std::pair<int64_t, int32_t>> nbrs;
  size_t seed_cursor = 0;

  while ((int64_t)order.size() < n) {
    while (seed_cursor < by_deg.size() && visited[by_deg[seed_cursor]])
      ++seed_cursor;
    int32_t seed = by_deg[seed_cursor];
    visited[seed] = 1;
    size_t head = order.size();
    order.push_back(seed);
    while (head < order.size()) {
      int32_t u = order[head++];
      nbrs.clear();
      for (int64_t e = row_ptr[u]; e < row_ptr[u + 1]; ++e) {
        int32_t v = col_idx[e];
        if (!visited[v]) {
          visited[v] = 1;
          nbrs.emplace_back(deg[v], v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end());
      for (auto& p : nbrs) order.push_back(p.second);
    }
  }
  for (int64_t i = 0; i < n; ++i) perm_out[i] = order[n - 1 - i];
}

}  // extern "C"
