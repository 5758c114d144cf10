// SIMD host aligner: 8 jobs per core in lockstep.
//
// The scalar engine (align_host.cpp) runs one DP per thread; its inner
// recurrence is a sequential dependency chain along the read, so SIMD must
// go ACROSS jobs instead: this engine packs 8 similar-length jobs into the
// lanes of an 8 x int32 vector (GCC vector extensions; compiles to AVX2
// where available, SSE pairs otherwise) — the same lane-vectorization as
// the TPU engine, at width 8.  Per-lane lengths are handled exactly like
// the TPU kernel: rows past a lane's adapter freeze, and the scout reads
// each lane's own final column / last row.
//
// Semantics: identical trace bits and scout election as
// porechop_tpu/ops/engine_v2.py (see ops/spec.py for the SeqAn derivation);
// statistics come from the shared walker in traceback.cpp.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" void traceback_stats(const uint8_t*, const int8_t*, const int8_t*,
                                const int32_t*, const int32_t*,
                                const uint8_t*, const uint8_t*,
                                const int32_t*, const int32_t*, int64_t,
                                int64_t, int64_t, int64_t*);

namespace {

typedef int32_t v8 __attribute__((vector_size(32)));

constexpr int G = 8;                  // lanes per group
constexpr int32_t NEG = -(1 << 30);

inline v8 vmax(v8 a, v8 b) { return (a > b) ? a : b; }  // ternary = blend
inline v8 vsplat(int32_t x) { return v8{x, x, x, x, x, x, x, x}; }

struct Group {
  int64_t jobs[G];      // job indices (or -1 for padding lanes)
  int64_t lr_max, la_max;
};

// Scratch per worker thread, reused across groups.
struct Scratch {
  std::vector<v8> m, v, h;            // (L1max) vectors
  std::vector<uint8_t> bits;          // (A, G, L1) walker layout
  std::vector<int8_t> reads, adapters;  // (G, L) / (G, A) padded copies
};

void run_group(const Group& g, const int8_t* rbuf, const int64_t* roff,
               const int8_t* abuf, const int64_t* aoff,
               const int64_t* pair_read, const int64_t* pair_adapter,
               int match, int mismatch, int open_, int ext, Scratch& s,
               int64_t* out) {
  const int64_t L = g.lr_max, A = g.la_max, L1 = L + 1;
  s.m.assign(L1, vsplat(0));
  s.v.assign(L1, vsplat(NEG));
  s.h.assign(L1, vsplat(NEG));
  if ((int64_t)s.bits.size() < A * G * L1) s.bits.resize(A * G * L1);
  s.reads.assign(G * L, 4);
  s.adapters.assign(G * A, 4);

  int32_t lr[G], la[G];
  for (int l = 0; l < G; ++l) {
    const int64_t k = g.jobs[l];
    if (k < 0) { lr[l] = 1; la[l] = 1; continue; }   // pad lane: 1x1 dummy
    const int64_t ri = pair_read[k], ai = pair_adapter[k];
    lr[l] = (int32_t)(roff[ri + 1] - roff[ri]);
    la[l] = (int32_t)(aoff[ai + 1] - aoff[ai]);
    std::memcpy(&s.reads[l * L], rbuf + roff[ri], lr[l]);
    std::memcpy(&s.adapters[l * A], abuf + aoff[ai], la[l]);
  }

  v8* m = s.m.data();
  v8* v = s.v.data();
  v8* h = s.h.data();
  const v8 vmatch = vsplat(match), vmismatch = vsplat(mismatch);
  const v8 vopen = vsplat(open_), vext = vsplat(ext);

  int32_t col_best[G], col_i[G];
  uint8_t col_vf[G], col_hf[G];
  for (int l = 0; l < G; ++l) {
    col_best[l] = 0; col_i[l] = 0; col_vf[l] = 0; col_hf[l] = 0;
  }

  for (int64_t i = 1; i <= A; ++i) {
    uint8_t* brow = s.bits.data() + (i - 1) * G * L1;
    v8 ac;
    for (int l = 0; l < G; ++l) ac[l] = s.adapters[l * A + (i - 1)];
    // Per-lane freeze mask: lanes whose adapter already ended keep state.
    v8 active;
    for (int l = 0; l < G; ++l) active[l] = (i <= la[l]) ? -1 : 0;

    v8 diag_prev = m[0];
    // boundary col 0 (M stays 0, bits row col 0 = 0)
    v8 h_prev = vsplat(NEG);
    for (int l = 0; l < G; ++l) brow[l * L1] = 0;

    for (int64_t j = 1; j <= L; ++j) {
      v8 rc;
      for (int l = 0; l < G; ++l) rc[l] = s.reads[l * L + (j - 1)];
      const v8 sub = (rc == ac) ? vmatch : vmismatch;
      const v8 v_ext = v[j] + vext;
      const v8 v_open = m[j] + vopen;
      const v8 vbit = (v_ext >= v_open);
      const v8 nv = vbit ? v_ext : v_open;
      const v8 h_ext = h_prev + vext;
      const v8 h_open = m[j - 1] + vopen;     // M(i, j-1), already updated
      const v8 hbit = (h_ext >= h_open);
      const v8 nh = hbit ? h_ext : h_open;
      const v8 d = diag_prev + sub;
      const v8 mvbit = (nv >= nh);
      const v8 gap = mvbit ? nv : nh;
      const v8 dbit = (d >= gap);
      const v8 nm = dbit ? d : gap;
      const v8 bits = (hbit & vsplat(1)) | (vbit & vsplat(2)) |
                      (dbit & vsplat(4)) | (mvbit & vsplat(8));
      for (int l = 0; l < G; ++l) brow[l * L1 + j] = (uint8_t)bits[l];
      diag_prev = m[j];
      m[j] = active ? nm : m[j];
      v[j] = active ? nv : v[j];
      h[j] = active ? nh : h[j];
      h_prev = nh;
    }
    // Final-column scout candidate at each lane's own j = lr[l].
    for (int l = 0; l < G; ++l) {
      if (i > la[l]) continue;
      const int32_t mm = m[lr[l]][l];
      if (mm > col_best[l]) {
        col_best[l] = mm; col_i[l] = (int32_t)i;
        col_vf[l] = (v[lr[l]][l] == mm);
        col_hf[l] = (!col_vf[l] && h[lr[l]][l] == mm);
      }
    }
  }

  // Last-row scout per lane (first max over j in [0, lr)).
  int32_t ci[G], cj[G], best[G];
  uint8_t vf[G], hf[G];
  for (int l = 0; l < G; ++l) {
    int32_t row_best = m[0][l];
    int64_t j_star = 0;
    for (int64_t j = 1; j < lr[l]; ++j)
      if (m[j][l] > row_best) { row_best = m[j][l]; j_star = j; }
    const uint8_t row_vf = (v[j_star][l] == row_best);
    const uint8_t row_hf = (!row_vf && h[j_star][l] == row_best);
    if (col_best[l] > row_best) {
      best[l] = col_best[l]; ci[l] = col_i[l]; cj[l] = lr[l];
      vf[l] = col_vf[l]; hf[l] = col_hf[l];
    } else {
      best[l] = row_best; ci[l] = la[l]; cj[l] = (int32_t)j_star;
      vf[l] = row_vf; hf[l] = row_hf;
    }
  }

  int64_t stats[G * 8];
  traceback_stats(s.bits.data(), s.reads.data(), s.adapters.data(), ci, cj,
                  vf, hf, lr, la, G, L, A, stats);
  for (int l = 0; l < G; ++l) {
    const int64_t k = g.jobs[l];
    if (k < 0) continue;
    int64_t* o = out + k * 9;
    const int64_t* st = stats + l * 8;
    o[0] = st[0]; o[1] = st[1]; o[2] = st[2]; o[3] = st[3];
    o[4] = best[l]; o[5] = st[4]; o[6] = st[5]; o[7] = st[6]; o[8] = 0;
  }
}

}  // namespace

extern "C" {

// Same interface as align_host_batch (align_host.cpp).
void align_simd_batch(const int8_t* reads, const int64_t* read_off,
                      const int8_t* adapters, const int64_t* adapter_off,
                      const int64_t* pair_read, const int64_t* pair_adapter,
                      int64_t P, int match, int mismatch, int open_, int ext,
                      int64_t n_threads, int64_t* out) {
  // Sort jobs by read length so groups pad minimally.
  std::vector<int64_t> order(P);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    const int64_t la_ = read_off[pair_read[a] + 1] - read_off[pair_read[a]];
    const int64_t lb_ = read_off[pair_read[b] + 1] - read_off[pair_read[b]];
    return la_ < lb_;
  });
  const int64_t n_groups = (P + G - 1) / G;
  std::vector<Group> groups(n_groups);
  for (int64_t gi = 0; gi < n_groups; ++gi) {
    Group& g = groups[gi];
    g.lr_max = 1; g.la_max = 1;
    for (int l = 0; l < G; ++l) {
      const int64_t idx = gi * G + l;
      if (idx < P) {
        const int64_t k = order[idx];
        g.jobs[l] = k;
        g.lr_max = std::max<int64_t>(
            g.lr_max, read_off[pair_read[k] + 1] - read_off[pair_read[k]]);
        g.la_max = std::max<int64_t>(
            g.la_max,
            adapter_off[pair_adapter[k] + 1] - adapter_off[pair_adapter[k]]);
      } else {
        g.jobs[l] = -1;
      }
    }
  }

  n_threads = std::max<int64_t>(1, n_threads);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    Scratch s;
    for (;;) {
      const int64_t gi = next.fetch_add(1);
      if (gi >= n_groups) break;
      run_group(groups[gi], reads, read_off, adapters, adapter_off,
                pair_read, pair_adapter, match, mismatch, open_, ext, s, out);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }

  // Degenerate jobs (empty read or adapter) are the caller's concern, but
  // guard anyway: mark them failed.
  for (int64_t k = 0; k < P; ++k) {
    const int64_t lr = read_off[pair_read[k] + 1] - read_off[pair_read[k]];
    const int64_t la = adapter_off[pair_adapter[k] + 1]
                       - adapter_off[pair_adapter[k]];
    if (lr == 0 || la == 0) {
      int64_t* o = out + k * 9;
      o[0] = -1; o[1] = -1; o[2] = -1; o[3] = -1;
      o[4] = INT32_MIN; o[5] = 0; o[6] = 0; o[7] = 0; o[8] = 0;
    }
  }
}

}  // extern "C"
