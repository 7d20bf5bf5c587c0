// Native host runtime for decagon_tpu: the host-side hot loops behind
// graph construction — CSV edge parsing, rejection-sampled negative
// edges, degree normalization, and 2D edge tiling for the Pallas SpMM.
//
// The reference implementation had no native code (SURVEY.md §2.9); its
// host loops were O(E)-per-sample Python scans (e.g. the `_ismember`
// rejection sampler at decagon/deep/minibatch.py:95-99,190-216).  These
// are the C++ equivalents, exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC graphcore.cpp -o libgraphcore.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <numeric>
#include <unordered_set>
#include <vector>

namespace {

// splitmix64: deterministic, seedable, fast.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // Unbiased bounded draw (Lemire).
  uint64_t bounded(uint64_t n) {
    uint64_t x = next();
    __uint128_t m = (__uint128_t)x * n;
    uint64_t l = (uint64_t)m;
    if (l < n) {
      uint64_t t = -n % n;
      while (l < t) {
        x = next();
        m = (__uint128_t)x * n;
        l = (uint64_t)m;
      }
    }
    return (uint64_t)(m >> 64);
  }
};

struct TileState {
  std::vector<int64_t> src, dst;
  std::vector<float> vals;
  std::vector<int64_t> tile_start;   // per-tile first-edge index
  std::vector<int64_t> tile_window;  // per-tile source-window start row
  std::vector<int64_t> tile_dblock;  // per-tile dst block
  int64_t block_r = 0, block_s = 0, tile_c = 0;
  int64_t num_dst_blocks = 0;
  int64_t num_tiles = 0;
};

thread_local TileState g_tiles;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Rejection-sampled false edges.
// Returns the number of edges written (== count on success).
int64_t dt_sample_false_edges(
    const int64_t* pos_rows, const int64_t* pos_cols, int64_t n_pos,
    int64_t n_rows, int64_t n_cols, int64_t count, uint64_t seed,
    int64_t* out_rows, int64_t* out_cols) {
  if (n_rows <= 0 || n_cols <= 0) return 0;
  std::unordered_set<uint64_t> forbidden;
  forbidden.reserve(static_cast<size_t>(n_pos) * 2 + 16);
  const uint64_t ncols = static_cast<uint64_t>(n_cols);
  for (int64_t i = 0; i < n_pos; ++i) {
    forbidden.insert(static_cast<uint64_t>(pos_rows[i]) * ncols +
                     static_cast<uint64_t>(pos_cols[i]));
  }
  const __uint128_t total_cells =
      (__uint128_t)n_rows * (__uint128_t)n_cols;
  if (total_cells - forbidden.size() < (__uint128_t)count) return -1;

  Rng rng(seed);
  int64_t filled = 0;
  while (filled < count) {
    const uint64_t r = rng.bounded(static_cast<uint64_t>(n_rows));
    const uint64_t c = rng.bounded(ncols);
    const uint64_t key = r * ncols + c;
    if (forbidden.count(key)) continue;
    forbidden.insert(key);  // also dedups sampled negatives
    out_rows[filled] = static_cast<int64_t>(r);
    out_cols[filled] = static_cast<int64_t>(c);
    ++filled;
  }
  return filled;
}

// ---------------------------------------------------------------------
// Degree normalization (square case includes +I and the reference's
// transpose; see decagon_tpu/graph/normalize.py for the math).
// Caller passes edges of A (no self loops assumed for square);
// out arrays must have capacity n_edges (+ n for square).
int64_t dt_normalize_square(
    const int64_t* rows, const int64_t* cols, int64_t n_edges, int64_t n,
    int64_t* out_rows, int64_t* out_cols, float* out_vals) {
  std::vector<double> deg(n, 0.0);
  for (int64_t i = 0; i < n_edges; ++i) deg[rows[i]] += 1.0;
  for (int64_t i = 0; i < n; ++i) deg[i] += 1.0;  // +I
  std::vector<double> dinv(n);
  for (int64_t i = 0; i < n; ++i)
    dinv[i] = deg[i] > 0 ? 1.0 / std::sqrt(deg[i]) : 0.0;
  int64_t m = 0;
  for (int64_t i = 0; i < n_edges; ++i) {  // transposed positions
    out_rows[m] = cols[i];
    out_cols[m] = rows[i];
    out_vals[m] = static_cast<float>(dinv[rows[i]] * dinv[cols[i]]);
    ++m;
  }
  for (int64_t i = 0; i < n; ++i) {  // identity entries
    out_rows[m] = i;
    out_cols[m] = i;
    out_vals[m] = static_cast<float>(dinv[i] * dinv[i]);
    ++m;
  }
  return m;
}

int64_t dt_normalize_rect(
    const int64_t* rows, const int64_t* cols, int64_t n_edges,
    int64_t n_rows, int64_t n_cols,
    int64_t* out_rows, int64_t* out_cols, float* out_vals) {
  std::vector<double> rdeg(n_rows, 0.0), cdeg(n_cols, 0.0);
  for (int64_t i = 0; i < n_edges; ++i) {
    rdeg[rows[i]] += 1.0;
    cdeg[cols[i]] += 1.0;
  }
  for (int64_t i = 0; i < n_rows; ++i)
    rdeg[i] = rdeg[i] > 0 ? 1.0 / std::sqrt(rdeg[i]) : 0.0;
  for (int64_t i = 0; i < n_cols; ++i)
    cdeg[i] = cdeg[i] > 0 ? 1.0 / std::sqrt(cdeg[i]) : 0.0;
  for (int64_t i = 0; i < n_edges; ++i) {
    out_rows[i] = rows[i];
    out_cols[i] = cols[i];
    out_vals[i] = static_cast<float>(rdeg[rows[i]] * cdeg[cols[i]]);
  }
  return n_edges;
}

// ---------------------------------------------------------------------
// Windowed 2D edge tiling (two-call protocol).
// Call dt_tiles_prepare first: sorts edges by (dst_block, src), greedily
// packs tiles of <= tile_c edges whose sources fit one block_s-row
// window (start 8-aligned, clamped to n_src_pad - block_s), and returns
// the tile count.  Then dt_tiles_fill writes the packed tile array
// [T, 2, C] (row 0: (dst_local << 16) | src_local; row 1: f32-bitcast
// vals), per-tile window starts [T], and row_ptr [num_dst_blocks + 1].
// Layout matches the Python fallback in decagon_tpu/ops/tiling.py bit
// for bit.
int64_t dt_tiles_prepare(
    const int64_t* src, const int64_t* dst, const float* vals,
    int64_t n_edges, int64_t block_r, int64_t block_s, int64_t tile_c,
    int64_t num_dst_blocks, int64_t n_src_pad) {
  TileState& st = g_tiles;
  st.block_r = block_r;
  st.block_s = block_s;
  st.tile_c = tile_c;
  st.num_dst_blocks = num_dst_blocks;

  std::vector<int64_t> order;
  order.reserve(n_edges);
  for (int64_t i = 0; i < n_edges; ++i)
    if (vals[i] != 0.0f) order.push_back(i);

  // stable_sort keeps original order on (dst_block, src) ties, matching
  // the Python path's np.lexsort exactly (tile contents are
  // order-invariant for the kernel, but bitwise-identical tilings
  // simplify testing).
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    const int64_t ka = dst[a] / block_r;
    const int64_t kb = dst[b] / block_r;
    if (ka != kb) return ka < kb;
    return src[a] < src[b];
  });

  const int64_t m = static_cast<int64_t>(order.size());
  st.src.resize(m);
  st.dst.resize(m);
  st.vals.resize(m);
  for (int64_t i = 0; i < m; ++i) {
    st.src[i] = src[order[i]];
    st.dst[i] = dst[order[i]];
    st.vals[i] = vals[order[i]];
  }

  st.tile_start.clear();
  st.tile_window.clear();
  st.tile_dblock.clear();
  const int64_t max_ws = n_src_pad - block_s;
  int64_t i = 0;
  while (i < m) {
    const int64_t db = st.dst[i] / block_r;
    const int64_t ws = std::min(st.src[i] & ~int64_t(7), max_ws);
    st.tile_start.push_back(i);
    st.tile_window.push_back(ws);
    st.tile_dblock.push_back(db);
    int64_t j = i;
    const int64_t cap = std::min(i + tile_c, m);
    while (j < cap && st.dst[j] / block_r == db &&
           st.src[j] < ws + block_s)
      ++j;
    i = j;
  }
  st.tile_start.push_back(m);  // sentinel
  st.num_tiles = static_cast<int64_t>(st.tile_window.size());
  return st.num_tiles;
}

int64_t dt_tiles_fill(
    int32_t* out_packed, int32_t* out_src_start, int32_t* out_row_ptr) {
  TileState& st = g_tiles;
  const int64_t c = st.tile_c;
  std::vector<int64_t> db_counts(st.num_dst_blocks, 0);

  for (int64_t t = 0; t < st.num_tiles; ++t) {
    const int64_t begin = st.tile_start[t];
    const int64_t end = st.tile_start[t + 1];
    const int64_t ws = st.tile_window[t];
    const int64_t db = st.tile_dblock[t];
    int32_t* p = out_packed + t * 2 * c;
    std::memset(p, 0, sizeof(int32_t) * 2 * c);
    for (int64_t i = begin; i < end; ++i) {
      const int64_t off = i - begin;
      const int32_t src_local = static_cast<int32_t>(st.src[i] - ws);
      const int32_t dst_local =
          static_cast<int32_t>(st.dst[i] - db * st.block_r);
      p[off] = (dst_local << 16) | src_local;
      std::memcpy(&p[c + off], &st.vals[i], sizeof(float));
    }
    out_src_start[t] = static_cast<int32_t>(ws);
    db_counts[db] += 1;
  }
  out_row_ptr[0] = 0;
  for (int64_t b = 0; b < st.num_dst_blocks; ++b)
    out_row_ptr[b + 1] = out_row_ptr[b] + static_cast<int32_t>(db_counts[b]);

  // Release memory.
  TileState empty;
  std::swap(g_tiles, empty);
  return 0;
}

// ---------------------------------------------------------------------
// CSV edge parsing: STITCH-style rows "CID000X,CID000Y,C000Z,...".
// Extracts up to 3 integer fields per line (non-digits stripped per
// field, matching the NodeIds codec).  Returns number of rows parsed;
// lines whose first field has no digits (headers) are skipped.
int64_t dt_parse_edge_csv(
    const char* data, int64_t length, int64_t n_fields,
    int64_t* out_a, int64_t* out_b, int64_t* out_c, int64_t max_rows) {
  int64_t row = 0;
  int64_t i = 0;
  while (i < length && row < max_rows) {
    int64_t fields[3] = {-1, -1, -1};
    bool field_ok[3] = {false, false, false};
    int field = 0;
    uint64_t acc = 0;
    bool any_digit = false;
    bool clean = true;  // header fields contain spaces ("STITCH 1")
    for (; i < length; ++i) {
      const char ch = data[i];
      if (ch == '\n' || ch == '\r') {
        break;
      }
      if (ch == ',') {
        if (field < 3) {
          fields[field] = static_cast<int64_t>(acc);
          field_ok[field] = any_digit && clean;
        }
        ++field;
        acc = 0;
        any_digit = false;
        clean = true;
        continue;
      }
      if (field < 3) {
        if (ch >= '0' && ch <= '9') {
          acc = acc * 10 + static_cast<uint64_t>(ch - '0');
          any_digit = true;
        } else if (!((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z'))) {
          clean = false;  // spaces/punct mark a header/label field
        }
      }
    }
    if (field < 3) {
      fields[field] = static_cast<int64_t>(acc);
      field_ok[field] = any_digit && clean;
    }
    // Skip EOL characters.
    while (i < length && (data[i] == '\n' || data[i] == '\r')) ++i;

    const int needed = static_cast<int>(n_fields);
    bool valid = true;
    for (int f = 0; f < needed; ++f) valid = valid && field_ok[f];
    if (valid) {
      out_a[row] = fields[0];
      out_b[row] = fields[1];
      if (needed > 2 && out_c) out_c[row] = fields[2];
      ++row;
    }
  }
  return row;
}

}  // extern "C"
