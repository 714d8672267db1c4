// Native Criteo TSV batch parser.
//
// The embedding engine's host-side hot path is turning click-log text into
// device-ready arrays: 40 fields per row (label, 13 dense ints, 26 hex
// categorical tokens), FNV-1a hashing of categoricals into per-table vocab,
// log1p of dense. In Python this parses ~50k rows/s — far below what one TPU
// chip consumes; this translation unit does the same work at memory speed
// and is exposed to Python via ctypes (embeddingtables_tpu/io/loader.py),
// with the pure-Python parser in data.py kept as the fallback/oracle.
//
// Format (Criteo Kaggle display-advertising train.txt):
//   label \t I1..I13 \t C1..C26 \n      (fields may be empty)
//
// Contract matches data.criteo_kaggle_batches exactly: missing dense -> 0,
// negative dense clamped to 0, dense = log1p(x); missing categorical -> row 0,
// else FNV-1a(token bytes) % vocab[t]. Output layouts: dense (B, 13) f32
// row-major, cat (26, B) i32 (table-major, feeding maplookup directly),
// label (B,) f32.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kNumDense = 13;
constexpr int kNumSparse = 26;

inline uint64_t fnv1a(const char* s, size_t n) {
  uint64_t h = 0xCBF29CE484222325ULL;
  for (size_t i = 0; i < n; ++i) {
    h ^= static_cast<unsigned char>(s[i]);
    h *= 0x100000001B3ULL;
  }
  return h;
}

inline double parse_number(const char* s, size_t n, bool* ok) {
  // Criteo dense fields are small integers (occasionally negative); a
  // hand-rolled parser avoids strtod locale/allocation overhead.
  // Accepted grammar (matching Python float() on realistic inputs):
  // [+|-]digits[.digits][(e|E)[+|-]digits]. Known divergence from float():
  // inf/nan/hex/underscore/whitespace forms are rejected here — absent
  // from real click logs, and a row carrying them differs between the
  // oracle and this parser (documented, not silently identical).
  if (n == 0) {
    *ok = false;
    return 0.0;
  }
  bool neg = false;
  size_t i = 0;
  if (s[0] == '-' || s[0] == '+') {
    neg = s[0] == '-';
    i = 1;
  }
  double v = 0.0;
  bool any_digit = false;
  double frac_scale = 0.0;  // 0 = before the decimal point
  long expo = 0;
  for (; i < n; ++i) {
    char c = s[i];
    if (c == '.' && frac_scale == 0.0 && expo == 0) {
      frac_scale = 0.1;
      continue;
    }
    if ((c == 'e' || c == 'E') && any_digit) {
      // Exponent suffix (Python float() accepts it; parity requires it).
      ++i;
      bool eneg = false;
      if (i < n && (s[i] == '-' || s[i] == '+')) {
        eneg = s[i] == '-';
        ++i;
      }
      bool edig = false;
      long e = 0;
      for (; i < n; ++i) {
        if (s[i] < '0' || s[i] > '9') {
          *ok = false;
          return 0.0;
        }
        edig = true;
        if (e < 10000) e = e * 10 + (s[i] - '0');
      }
      if (!edig) {
        *ok = false;
        return 0.0;
      }
      expo = eneg ? -e : e;
      break;
    }
    if (c < '0' || c > '9') {
      *ok = false;
      return 0.0;
    }
    any_digit = true;
    if (frac_scale == 0.0) {
      v = v * 10.0 + (c - '0');
    } else {
      v += frac_scale * (c - '0');
      frac_scale *= 0.1;
    }
  }
  if (!any_digit) {
    *ok = false;
    return 0.0;
  }
  if (expo != 0) v *= pow(10.0, static_cast<double>(expo));
  *ok = true;
  return neg ? -v : v;
}

}  // namespace

extern "C" {

// Parse up to `max_rows` lines from buf[0:len).
//
// Outputs (caller-allocated):
//   dense:  max_rows * 13 f32
//   cat:    26 * max_rows i32   (cat[t * max_rows + r])
//   label:  max_rows f32
//   consumed: bytes of buf consumed (ends on a line boundary)
// Returns the number of complete rows parsed. Malformed lines are skipped
// (counted into *skipped) — same policy as the Python parser.
long criteo_parse(const char* buf, long len, long max_rows,
                  const long* vocab_sizes, float* dense, int32_t* cat,
                  float* label, long* consumed, long* skipped) {
  long rows = 0;
  long pos = 0;
  *skipped = 0;
  while (rows < max_rows && pos < len) {
    // Find the line end.
    const char* nl = static_cast<const char*>(
        memchr(buf + pos, '\n', static_cast<size_t>(len - pos)));
    if (nl == nullptr) break;  // partial line: leave for the next chunk
    long line_end = nl - buf;

    // Walk tab-separated fields.
    long fstart = pos;
    int field = 0;
    bool bad = false;
    float* drow = dense + rows * kNumDense;
    for (long i = pos; i <= line_end && field < 1 + kNumDense + kNumSparse;
         ++i) {
      if (i == line_end || buf[i] == '\t') {
        const char* f = buf + fstart;
        size_t flen = static_cast<size_t>(i - fstart);
        if (field == 0) {
          bool ok;
          double v = parse_number(f, flen, &ok);
          if (!ok) bad = true;
          label[rows] = static_cast<float>(v);
        } else if (field <= kNumDense) {
          bool ok;
          double v = parse_number(f, flen, &ok);
          if (!ok || v < 0) v = 0.0;
          drow[field - 1] = static_cast<float>(log1p(v));
        } else {
          int t = field - 1 - kNumDense;
          int32_t id = 0;
          if (flen > 0) {
            id = static_cast<int32_t>(fnv1a(f, flen) %
                                      static_cast<uint64_t>(vocab_sizes[t]));
          }
          cat[static_cast<long>(t) * max_rows + rows] = id;
        }
        ++field;
        fstart = i + 1;
      }
    }
    // A valid line consumes exactly 40 fields AND the whole line: if the
    // field walk hit its cap with unconsumed bytes left (fstart <= line_end),
    // the line has extra fields and is skipped — matching the Python oracle's
    // `len(parts) != 40 -> skip` policy.
    if (bad || field != 1 + kNumDense + kNumSparse || fstart <= line_end) {
      ++*skipped;
    } else {
      ++rows;
    }
    pos = line_end + 1;
  }
  *consumed = pos;
  return rows;
}

// FNV-1a helper exported for parity tests against the Python implementation.
uint64_t criteo_fnv1a(const char* s, long n) {
  return fnv1a(s, static_cast<size_t>(n));
}

}  // extern "C"
