// Native synthetic Criteo batch generator.
//
// Host-side analog of data.SyntheticCriteo.batches(): lognormal dense
// features, Walker-alias Zipf categorical indices, and labels drawn from the
// same hidden ground-truth model (per-row logits + dense linear weights) so
// AUC stays learnable. The alias tables and the label model are built once
// in Python (data.SyntheticCriteo) and passed in flattened; this file only
// does the per-example sampling — the O(B*T) hot loop that kept the Python
// pipeline at ~8 ms/batch single-threaded.
//
// Parallelism: std::thread over example ranges. Determinism: a counter-based
// RNG — every example derives its own xoshiro256** state from
// splitmix64(stream_seed, batch_index, example_index) — so results are
// independent of thread count and identical across runs.
//
// The reference has no data layer (it is a kernel library); this generator
// exists so large-batch training demos are device-bound, not host-bound.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t &x) {
  uint64_t z = (x += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

struct Xoshiro {
  uint64_t s[4];
  explicit Xoshiro(uint64_t seed) {
    for (int i = 0; i < 4; i++) s[i] = splitmix64(seed);
  }
  static inline uint64_t rotl(uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
  }
  inline uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // Uniform in [0, 1) with 53-bit resolution.
  inline double uniform() { return (next() >> 11) * 0x1.0p-53; }
  // Standard normal via Box-Muller, caching the pair's twin (halves the
  // log/sqrt/trig cost — the dense-feature hot path).
  double cached = 0.0;
  bool has_cached = false;
  inline double normal() {
    if (has_cached) {
      has_cached = false;
      return cached;
    }
    double u1 = uniform(), u2 = uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    const double r = std::sqrt(-2.0 * std::log(u1));
    const double th = 6.283185307179586 * u2;
    cached = r * std::sin(th);
    has_cached = true;
    return r * std::cos(th);
  }
};

// Packed alias-table cell: the rank permutation is pre-applied to both
// outcomes at build time, so one draw costs ONE random memory access
// (vs three gathers — prob, alias, perm — in the naive layout; at
// V=100k the tables blow L2, so gathers are the cat-draw bottleneck).
struct AliasCell {
  float prob;  // acceptance probability for staying at rank k
  int keep;    // perm[k]
  int alias;   // perm[alias[k]]
};

struct Args {
  long b, nd, t, bag;  // bag == 0 -> one-hot (T, B); else (T, B, bag)
  const long *vocabs;  // (t)
  const long *offs;    // (t+1) cumulative vocab offsets into the flat arrays
  const AliasCell *cells;  // (sumV) packed alias tables
  const float *row_logit;  // (sumV) hidden label model
  const float *w_dense;    // (nd)
  double bias, inv_sqrt_nd, inv_sqrt_t;
  uint64_t stream_seed, batch_index;
  float *dense;  // (b, nd)
  int *cat;      // (t, b) or (t, b, bag)
  float *label;  // (b)
};

inline int sample_zipf(Xoshiro &rng, long vocab, const AliasCell *cells) {
  // One RNG call per draw: the top 32 bits pick the slot (multiply-shift
  // range reduction), the bottom 24 feed the acceptance test — independent
  // bit fields of one xoshiro output.
  const uint64_t u = rng.next();
  const long k = (long)(((u >> 32) * (uint64_t)vocab) >> 32);
  const float frac = (float)(u & 0xFFFFFF) * 0x1.0p-24f;
  const AliasCell &c = cells[k];
  return (frac >= c.prob) ? c.alias : c.keep;
}

void fill_range(const Args &a, long i0, long i1) {
  const long width = a.bag ? a.bag : 1;
  for (long i = i0; i < i1; i++) {
    uint64_t seed = a.stream_seed;
    seed = splitmix64(seed) ^ (a.batch_index * 0x9E3779B97F4A7C15ULL);
    seed = splitmix64(seed) ^ (uint64_t)i;
    Xoshiro rng(splitmix64(seed));

    double dlogit = 0.0;
    for (long j = 0; j < a.nd; j++) {
      // lognormal(0,1) raw feature, stored log1p-normalized.
      const double raw = std::exp(rng.normal());
      const float v = (float)std::log1p(raw);
      a.dense[i * a.nd + j] = v;
      dlogit += (double)a.w_dense[j] * (double)v;
    }
    double rlogit = 0.0;
    for (long tab = 0; tab < a.t; tab++) {
      const long off = a.offs[tab];
      const long vocab = a.vocabs[tab];
      double contrib = 0.0;
      for (long j = 0; j < width; j++) {
        const int id = sample_zipf(rng, vocab, a.cells + off);
        a.cat[(tab * a.b + i) * width + j] = id;
        contrib += (double)a.row_logit[off + id];
      }
      rlogit += contrib / (double)width;
    }
    const double logit =
        dlogit * a.inv_sqrt_nd + rlogit * a.inv_sqrt_t + a.bias;
    const double p = 1.0 / (1.0 + std::exp(-logit));
    a.label[i] = (rng.uniform() < p) ? 1.0f : 0.0f;
  }
}

}  // namespace

extern "C" void synth_generate(long b, long nd, long t, long bag,
                               const long *vocabs, const long *offs,
                               const AliasCell *cells,
                               const float *row_logit,
                               const float *w_dense, double bias,
                               double inv_sqrt_nd, double inv_sqrt_t,
                               uint64_t stream_seed, uint64_t batch_index,
                               long nthreads, float *dense, int *cat,
                               float *label) {
  static_assert(sizeof(AliasCell) == 12, "AliasCell must pack to 12 bytes");
  Args a{b,     nd,  t,   bag, vocabs, offs, cells, row_logit, w_dense,
         bias,  inv_sqrt_nd, inv_sqrt_t, stream_seed, batch_index,
         dense, cat, label};
  if (nthreads <= 1 || b < 2 * nthreads) {
    fill_range(a, 0, b);
    return;
  }
  std::vector<std::thread> threads;
  const long chunk = (b + nthreads - 1) / nthreads;
  for (long w = 0; w < nthreads; w++) {
    const long i0 = w * chunk;
    const long i1 = std::min(b, i0 + chunk);
    if (i0 >= i1) break;
    threads.emplace_back([&a, i0, i1] { fill_range(a, i0, i1); });
  }
  for (auto &th : threads) th.join();
}
