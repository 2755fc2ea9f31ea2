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

// Bilinear resize uint8 (N,H,W,C) -> uint8 (N,OH,OW,C), half-pixel centers
// (PIL/torchvision-compatible convention, no antialias).
void resize_bilinear_u8(const uint8_t* src, uint8_t* dst,
                        int64_t n, int64_t h, int64_t w, int64_t c,
                        int64_t oh, int64_t ow) {
  const float sy = (float)h / (float)oh;
  const float sx = (float)w / (float)ow;
  const int64_t irow = w * c, iimg = h * irow;
  const int64_t orow = ow * c, oimg = oh * orow;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * iimg;
    uint8_t* d = dst + i * oimg;
    for (int64_t y = 0; y < oh; ++y) {
      float fy = (y + 0.5f) * sy - 0.5f;
      int64_t y0 = (int64_t)fy;
      if (fy < 0) { fy = 0; y0 = 0; }
      int64_t y1 = std::min(y0 + 1, h - 1);
      const float wy = fy - y0;
      for (int64_t x = 0; x < ow; ++x) {
        float fx = (x + 0.5f) * sx - 0.5f;
        int64_t x0 = (int64_t)fx;
        if (fx < 0) { fx = 0; x0 = 0; }
        int64_t x1 = std::min(x0 + 1, w - 1);
        const float wx = fx - x0;
        const uint8_t* p00 = s + y0 * irow + x0 * c;
        const uint8_t* p01 = s + y0 * irow + x1 * c;
        const uint8_t* p10 = s + y1 * irow + x0 * c;
        const uint8_t* p11 = s + y1 * irow + x1 * c;
        uint8_t* o = d + y * orow + x * c;
        for (int64_t k = 0; k < c; ++k) {
          const float top = p00[k] + (p01[k] - p00[k]) * wx;
          const float bot = p10[k] + (p11[k] - p10[k]) * wx;
          const float v = top + (bot - top) * wy;
          o[k] = (uint8_t)std::min(255.0f, std::max(0.0f, v + 0.5f));
        }
      }
    }
  }
}

// Fused crop (top,left,ch,cw) + bilinear resize to (oh,ow), uint8 NHWC.
void crop_resize_bilinear_u8(const uint8_t* src, uint8_t* dst,
                             int64_t n, int64_t h, int64_t w, int64_t c,
                             int64_t top, int64_t left, int64_t ch, int64_t cw,
                             int64_t oh, int64_t ow) {
  const float sy = (float)ch / (float)oh;
  const float sx = (float)cw / (float)ow;
  const int64_t irow = w * c, iimg = h * irow;
  const int64_t orow = ow * c, oimg = oh * orow;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = src + i * iimg;
    uint8_t* d = dst + i * oimg;
    for (int64_t y = 0; y < oh; ++y) {
      float fy = (y + 0.5f) * sy - 0.5f;
      int64_t y0 = (int64_t)fy;
      if (fy < 0) { fy = 0; y0 = 0; }
      int64_t y1 = std::min(y0 + 1, ch - 1);
      const float wy = fy - y0;
      const int64_t gy0 = std::min(top + y0, h - 1);
      const int64_t gy1 = std::min(top + y1, h - 1);
      for (int64_t x = 0; x < ow; ++x) {
        float fx = (x + 0.5f) * sx - 0.5f;
        int64_t x0 = (int64_t)fx;
        if (fx < 0) { fx = 0; x0 = 0; }
        int64_t x1 = std::min(x0 + 1, cw - 1);
        const float wx = fx - x0;
        const int64_t gx0 = std::min(left + x0, w - 1);
        const int64_t gx1 = std::min(left + x1, w - 1);
        const uint8_t* p00 = s + gy0 * irow + gx0 * c;
        const uint8_t* p01 = s + gy0 * irow + gx1 * c;
        const uint8_t* p10 = s + gy1 * irow + gx0 * c;
        const uint8_t* p11 = s + gy1 * irow + gx1 * c;
        uint8_t* o = d + y * orow + x * c;
        for (int64_t k = 0; k < c; ++k) {
          const float topv = p00[k] + (p01[k] - p00[k]) * wx;
          const float botv = p10[k] + (p11[k] - p10[k]) * wx;
          const float v = topv + (botv - topv) * wy;
          o[k] = (uint8_t)std::min(255.0f, std::max(0.0f, v + 0.5f));
        }
      }
    }
  }
}

}  // extern "C"
