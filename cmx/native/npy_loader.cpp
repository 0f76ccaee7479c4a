// cmx native data runtime: threaded .npy corpus loader.
//
// The reference's data path is Python: np.load + PIL resize inside
// DataLoader worker processes, re-done every epoch (Finetuning/dataset.py:
// 39-47, Spark/utils/dataset.py:24-27). Here the whole corpus is decoded,
// resized (bicubic, PIL-compatible coefficients) and intensity-passed in a
// C++ thread pool ONCE into a contiguous float32 cache the JAX host feeds to
// the device; steady-state batches are pure pointer math.
//
// Exposed C ABI (ctypes):
//   int cmx_load_corpus(const char** paths, int n, int out_size,
//                       float* out, int n_threads);
//     - each paths[i] is a .npy of a 2-D array (float32/float64/uint8)
//     - out must hold n * out_size * out_size floats
//     - returns 0 on success, negative error code otherwise
//   int cmx_npy_info(const char* path, long* shape_out /*2*/, int* dtype_out);

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyArray {
  std::vector<float> data;
  long rows = 0, cols = 0;
};

// Minimal .npy v1/v2 parser for 2-D C-order arrays.
bool parse_npy(const char* path, NpyArray* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }
  // descr
  auto dpos = header.find("'descr':");
  auto spos = header.find("'shape':");
  if (dpos == std::string::npos || spos == std::string::npos) {
    std::fclose(f);
    return false;
  }
  auto q0 = header.find('\'', dpos + 8);
  auto q1 = header.find('\'', q0 + 1);
  std::string descr = header.substr(q0 + 1, q1 - q0 - 1);
  auto p0 = header.find('(', spos);
  auto p1 = header.find(')', p0);
  std::string shape = header.substr(p0 + 1, p1 - p0 - 1);
  long rows = 0, cols = 1;
  if (std::sscanf(shape.c_str(), "%ld , %ld", &rows, &cols) < 1) {
    if (std::sscanf(shape.c_str(), "%ld ,", &rows) < 1) {
      std::fclose(f);
      return false;
    }
  }
  bool fortran = header.find("'fortran_order': True") != std::string::npos;
  if (fortran) { std::fclose(f); return false; }

  long n = rows * cols;
  out->rows = rows;
  out->cols = cols;
  out->data.resize(n);
  bool ok = true;
  if (descr == "<f4" || descr == "|f4") {
    ok = std::fread(out->data.data(), 4, n, f) == size_t(n);
  } else if (descr == "<f8") {
    std::vector<double> tmp(n);
    ok = std::fread(tmp.data(), 8, n, f) == size_t(n);
    for (long i = 0; i < n; i++) out->data[i] = float(tmp[i]);
  } else if (descr == "|u1") {
    std::vector<uint8_t> tmp(n);
    ok = std::fread(tmp.data(), 1, n, f) == size_t(n);
    for (long i = 0; i < n; i++) out->data[i] = float(tmp[i]);
  } else if (descr == "|i1") {
    std::vector<int8_t> tmp(n);
    ok = std::fread(tmp.data(), 1, n, f) == size_t(n);
    for (long i = 0; i < n; i++) out->data[i] = float(tmp[i]);
  } else if (descr == "<i4") {
    std::vector<int32_t> tmp(n);
    ok = std::fread(tmp.data(), 4, n, f) == size_t(n);
    for (long i = 0; i < n; i++) out->data[i] = float(tmp[i]);
  } else {
    ok = false;
  }
  std::fclose(f);
  return ok;
}

// Catmull-Rom-free bicubic (a = -0.5), matching PIL's cubic kernel shape.
inline float cubic_w(float x) {
  const float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// Per-axis resampling coefficients, PIL-style: when downscaling the kernel
// support is scaled by the factor (antialias), so a 475->256 resize averages
// ~8 taps per axis instead of sampling 4 — matching Image.resize(BICUBIC),
// which always antialiases. (The previous fixed-4-tap version aliased on
// downscale and diverged from the Python/PIL fallback path.)
struct AxisCoeffs {
  std::vector<long> first;    // first source index per output position
  std::vector<int> count;     // tap count per output position
  std::vector<float> weight;  // taps, normalized, ksize per output position
  int ksize = 0;
};

AxisCoeffs make_coeffs(long in_size, int out_size) {
  AxisCoeffs c;
  const float scale = float(in_size) / out_size;
  const float support_scale = scale > 1.0f ? scale : 1.0f;
  const float support = 2.0f * support_scale;  // cubic kernel radius 2
  c.ksize = int(std::ceil(support)) * 2 + 1;
  c.first.resize(out_size);
  c.count.resize(out_size);
  c.weight.assign(size_t(out_size) * c.ksize, 0.0f);
  for (int o = 0; o < out_size; o++) {
    const float center = (o + 0.5f) * scale - 0.5f;
    long x0 = long(std::floor(center - support)) + 1;
    long x1 = long(std::floor(center + support));
    if (x0 < 0) x0 = 0;
    if (x1 > in_size - 1) x1 = in_size - 1;
    float* wp = &c.weight[size_t(o) * c.ksize];
    float wsum = 0.0f;
    int k = 0;
    for (long x = x0; x <= x1; x++, k++) {
      float wgt = cubic_w((float(x) - center) / support_scale);
      wp[k] = wgt;
      wsum += wgt;
    }
    if (wsum != 0.0f)
      for (int i = 0; i < k; i++) wp[i] /= wsum;
    c.first[o] = x0;
    c.count[o] = k;
  }
  return c;
}

void resize_bicubic(const NpyArray& src, int out_size, float* dst) {
  const long h = src.rows, w = src.cols;
  const AxisCoeffs cx = make_coeffs(w, out_size);
  const AxisCoeffs cy = make_coeffs(h, out_size);
  // separable two-pass (horizontal then vertical), like PIL
  std::vector<float> tmp(size_t(h) * out_size);
  for (long y = 0; y < h; y++) {
    const float* row = &src.data[y * w];
    float* trow = &tmp[y * out_size];
    for (int ox = 0; ox < out_size; ox++) {
      const float* wp = &cx.weight[size_t(ox) * cx.ksize];
      const long x0 = cx.first[ox];
      float acc = 0.0f;
      for (int k = 0; k < cx.count[ox]; k++) acc += wp[k] * row[x0 + k];
      trow[ox] = acc;
    }
  }
  for (int oy = 0; oy < out_size; oy++) {
    const float* wp = &cy.weight[size_t(oy) * cy.ksize];
    const long y0 = cy.first[oy];
    for (int ox = 0; ox < out_size; ox++) {
      float acc = 0.0f;
      for (int k = 0; k < cy.count[oy]; k++)
        acc += wp[k] * tmp[(y0 + k) * out_size + ox];
      dst[oy * long(out_size) + ox] = acc;
    }
  }
}

void resize_nearest(const NpyArray& src, int out_size, float* dst) {
  const long h = src.rows, w = src.cols;
  for (int oy = 0; oy < out_size; oy++) {
    long yy = long((oy + 0.5f) * h / out_size);
    if (yy >= h) yy = h - 1;
    for (int ox = 0; ox < out_size; ox++) {
      long xx = long((ox + 0.5f) * w / out_size);
      if (xx >= w) xx = w - 1;
      dst[oy * long(out_size) + ox] = src.data[yy * w + xx];
    }
  }
}

}  // namespace

extern "C" {

int cmx_npy_info(const char* path, long* shape_out, int* dtype_out) {
  NpyArray arr;
  if (!parse_npy(path, &arr)) return -1;
  shape_out[0] = arr.rows;
  shape_out[1] = arr.cols;
  *dtype_out = 0;  // float after decode
  return 0;
}

// mode: 0 = bicubic (images), 1 = nearest (masks)
int cmx_load_corpus(const char** paths, int n, int out_size, float* out,
                    int n_threads, int mode) {
  if (n <= 0 || out_size <= 0) return -2;
  std::atomic<int> next(0);
  std::atomic<int> failed(-1);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      NpyArray arr;
      if (!parse_npy(paths[i], &arr) || arr.rows <= 0 || arr.cols <= 0) {
        failed.store(i);
        return;
      }
      float* dst = out + long(i) * out_size * out_size;
      if (arr.rows == out_size && arr.cols == out_size) {
        std::memcpy(dst, arr.data.data(),
                    sizeof(float) * out_size * out_size);
      } else if (mode == 1) {
        resize_nearest(arr, out_size, dst);
      } else {
        resize_bicubic(arr, out_size, dst);
      }
    }
  };
  int t = n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency());
  if (t < 1) t = 1;
  std::vector<std::thread> pool;
  for (int i = 0; i < t; i++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load() >= 0 ? -3 : 0;
}

}  // extern "C"
