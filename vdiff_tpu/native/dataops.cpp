// Native data-pipeline ops for vdiff-tpu.
//
// The TPU ingests batches prepared on host; with Python/PIL the prepare path
// (uint8 → f32 [-1,1] normalize, random horizontal flip, crop+bilinear
// resize) dominates host time on small-core VMs. These C++ kernels replace the
// reference's torchvision C++ transform backend (SURVEY.md §2: the reference's
// only native code is torch's own) with a dependency-free library bound via
// ctypes (vdiff_tpu/native/__init__.py). All buffers are caller-allocated
// numpy arrays; layout is NHWC uint8 in, NHWC float32 out.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// uint8 (N,H,W,C) -> float32 (N,H,W,C) in [-1,1]; flip[i] != 0 mirrors W.
void normalize_flip_u8_f32(const uint8_t* src, float* dst,
                           const uint8_t* flip,
                           int64_t n, int64_t h, int64_t w, int64_t c) {
  // 256-entry LUT with exact f32 division semantics (x/127.5f - 1.0f),
  // bit-matching the numpy reference path (255 → exactly 1.0f).
  float lut[256];
  for (int v = 0; v < 256; ++v) lut[v] = (float)v / 127.5f - 1.0f;
  const int64_t row = w * c;
  const int64_t img = h * row;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * img;
    float* d = dst + i * img;
    const bool f = flip && flip[i];
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t* sr = s + y * row;
      float* dr = d + y * row;
      if (!f) {
        for (int64_t j = 0; j < row; ++j) dr[j] = lut[sr[j]];
      } else {
        for (int64_t x = 0; x < w; ++x) {
          const uint8_t* sp = sr + (w - 1 - x) * c;
          float* dp = dr + x * c;
          for (int64_t k = 0; k < c; ++k) dp[k] = lut[sp[k]];
        }
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PIL-compatible antialiased bilinear resampling.
//
// The reference pipelines resize through PIL (torchvision transforms), whose
// "BILINEAR" is an ANTIALIASED triangle filter: for downscales the kernel
// support grows with the scale factor (classic 4-tap bilinear diverges badly
// at celeba's 148→64). This reimplements PIL's separable fixed-point scheme
// (triangle filter, PRECISION_BITS accumulators, horizontal-then-vertical
// passes with a uint8 intermediate) so `im.crop(box).resize(size, BILINEAR)`
// is reproduced bit-exactly — the product path can then use these kernels
// with a PIL-parity gate in tests.
// ---------------------------------------------------------------------------

#include <cmath>
#include <cstdlib>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // PIL Resample.c

inline uint8_t clip8(int32_t in) {
  if (in >= (1 << kPrecisionBits << 8)) return 255;
  if (in <= 0) return 0;
  return (uint8_t)(in >> kPrecisionBits);
}

inline double triangle_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Per-output-pixel (xmin, count) bounds + normalized fixed-point weights.
// in0/in1 select a sub-range of the input axis (the crop box edge-to-edge).
int64_t precompute_coeffs(int64_t in_size, double in0, double in1,
                          int64_t out_size, int64_t** bounds_p, int32_t** kk_p) {
  const double scale = (in1 - in0) / (double)out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle support
  const int64_t ksize = (int64_t)std::ceil(support) * 2 + 1;
  int64_t* bounds = (int64_t*)std::malloc(out_size * 2 * sizeof(int64_t));
  int32_t* kk = (int32_t*)std::malloc(out_size * ksize * sizeof(int32_t));
  double* prek = (double*)std::malloc(ksize * sizeof(double));
  const double ss = 1.0 / filterscale;
  for (int64_t xx = 0; xx < out_size; ++xx) {
    const double center = in0 + (xx + 0.5) * scale;
    int64_t xmin = (int64_t)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int64_t xmax = (int64_t)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    int64_t x;
    for (x = 0; x < xmax; ++x) {
      const double w = triangle_filter((x + xmin - center + 0.5) * ss);
      prek[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x) {
      const double w = ww == 0.0 ? 0.0 : prek[x] / ww;
      kk[xx * ksize + x] =
          w < 0 ? (int32_t)(-0.5 + w * (1 << kPrecisionBits))
                : (int32_t)(0.5 + w * (1 << kPrecisionBits));
    }
    for (; x < ksize; ++x) kk[xx * ksize + x] = 0;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  std::free(prek);
  *bounds_p = bounds;
  *kk_p = kk;
  return ksize;
}

}  // namespace

extern "C" {

// Fused crop (top,left,ch,cw) + PIL-BILINEAR resize to (oh,ow), uint8 NHWC.
void crop_resize_bilinear_u8(const uint8_t* src, uint8_t* dst,
                             int64_t n, int64_t h, int64_t w, int64_t c,
                             int64_t top, int64_t left, int64_t ch, int64_t cw,
                             int64_t oh, int64_t ow) {
  int64_t *bounds_h, *bounds_v;
  int32_t *kk_h, *kk_v;
  const int64_t ksize_h =
      precompute_coeffs(cw, 0.0, (double)cw, ow, &bounds_h, &kk_h);
  const int64_t ksize_v =
      precompute_coeffs(ch, 0.0, (double)ch, oh, &bounds_v, &kk_v);

  // only source rows [ybox0, ybox1) feed the vertical pass
  const int64_t ybox0 = bounds_v[0];
  const int64_t ybox1 = bounds_v[(oh - 1) * 2] + bounds_v[(oh - 1) * 2 + 1];
  const int64_t yspan = ybox1 - ybox0;
  uint8_t* temp = (uint8_t*)std::malloc(yspan * ow * c);

  const int64_t irow = w * c, iimg = h * irow;
  const int64_t trow = ow * c;
  const int64_t orow = ow * c, oimg = oh * orow;

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * iimg;
    // horizontal pass into temp (uint8 intermediate, as PIL)
    for (int64_t yy = 0; yy < yspan; ++yy) {
      const uint8_t* srow = s + (top + ybox0 + yy) * irow + left * c;
      uint8_t* trow_p = temp + yy * trow;
      for (int64_t xx = 0; xx < ow; ++xx) {
        const int64_t xmin = bounds_h[xx * 2];
        const int64_t xmax = bounds_h[xx * 2 + 1];
        const int32_t* k = kk_h + xx * ksize_h;
        for (int64_t ki = 0; ki < c; ++ki) {
          int32_t acc = 1 << (kPrecisionBits - 1);
          for (int64_t x = 0; x < xmax; ++x)
            acc += srow[(xmin + x) * c + ki] * k[x];
          trow_p[xx * c + ki] = clip8(acc);
        }
      }
    }
    // vertical pass into dst
    uint8_t* d = dst + i * oimg;
    for (int64_t y = 0; y < oh; ++y) {
      const int64_t ymin = bounds_v[y * 2] - ybox0;
      const int64_t ymax = bounds_v[y * 2 + 1];
      const int32_t* k = kk_v + y * ksize_v;
      uint8_t* drow = d + y * orow;
      for (int64_t xx = 0; xx < ow * c; ++xx) {
        int32_t acc = 1 << (kPrecisionBits - 1);
        for (int64_t x = 0; x < ymax; ++x)
          acc += temp[(ymin + x) * trow + xx] * k[x];
        drow[xx] = clip8(acc);
      }
    }
  }

  std::free(temp);
  std::free(bounds_h);
  std::free(bounds_v);
  std::free(kk_h);
  std::free(kk_v);
}

// PIL-BILINEAR resize uint8 (N,H,W,C) -> uint8 (N,OH,OW,C).
void resize_bilinear_u8(const uint8_t* src, uint8_t* dst,
                        int64_t n, int64_t h, int64_t w, int64_t c,
                        int64_t oh, int64_t ow) {
  crop_resize_bilinear_u8(src, dst, n, h, w, c, 0, 0, h, w, oh, ow);
}

}  // extern "C"
