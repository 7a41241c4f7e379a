// Native host-side data-pipeline kernels for rodygs_tpu.
//
// The reference's native code is CUDA compute (rasterizer, knn) — replaced in
// this framework by Pallas/XLA on the TPU. What remains hot on the HOST is
// the data pipeline: per-frame image normalization at dataset-load time
// (RGBA -> premultiplied RGB over black, uint8 -> f32) runs over hundreds of
// 1080p frames, and 16-bit PNG packing runs per evaluated frame. These are
// memory-bound loops that numpy executes single-threaded with temporaries;
// here they are fused single-pass OpenMP loops.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this
// environment); rodygs_tpu/utils/native.py builds and loads this file and
// falls back to numpy when no toolchain is available.

#include <cstdint>
#include <cstddef>
#include <cmath>

extern "C" {

// RGBA uint8 [h*w*4] -> float32 RGB [h*w*3], alpha-composited over black,
// clamped to [0,1]. (data/datamodule.py _load_image_composite_black)
void composite_rgba_to_rgb(const uint8_t* in, float* out, int64_t n_pixels) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = in + i * 4;
    float a = p[3] * (1.0f / 255.0f);
    float* q = out + i * 3;
    q[0] = p[0] * (1.0f / 255.0f) * a;
    q[1] = p[1] * (1.0f / 255.0f) * a;
    q[2] = p[2] * (1.0f / 255.0f) * a;
  }
}

// RGB uint8 [h*w*3] -> float32 RGB (no alpha), scaled to [0,1].
void u8_rgb_to_f32(const uint8_t* in, float* out, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * (1.0f / 255.0f);
}

// DepthAnything prior normalization: out = ((-d) - min(-d)) / (max - min)
// (data/readers.py DepthAnythingReader).
void negate_minmax_normalize(const float* in, float* out, int64_t n) {
  float mn = INFINITY, mx = -INFINITY;
#pragma omp parallel for reduction(min : mn) reduction(max : mx)
  for (int64_t i = 0; i < n; ++i) {
    float v = -in[i];
    if (v < mn) mn = v;
    if (v > mx) mx = v;
  }
  float scale = (mx > mn) ? 1.0f / (mx - mn) : 0.0f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = (-in[i] - mn) * scale;
}

// float32 RGB [h*w*3] in [0,1] -> uint16 BGR for the 16-bit PNG storer
// (utils/store.py RGBStorer: clamp, channel swap, x65535).
void f32_rgb_to_u16_bgr(const float* in, uint16_t* out, int64_t n_pixels) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_pixels; ++i) {
    const float* p = in + i * 3;
    uint16_t* q = out + i * 3;
    for (int c = 0; c < 3; ++c) {
      float v = p[2 - c];
      v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
      q[c] = (uint16_t)(v * 65535.0f);
    }
  }
}

// Depth unprojection (scripts/mast3r_unproject.py): pixel grid + depth ->
// world points through inv(K) and c2w. c2w is a row-major [4,4].
void unproject_depth(const float* depth, const float* c2w, float focal,
                     int64_t w, int64_t h, float* out_xyz) {
  const float cx = w * 0.5f, cy = h * 0.5f;
  const float inv_f = 1.0f / focal;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      int64_t i = y * w + x;
      float d = depth[i];
      float xc = (x - cx) * inv_f * d;
      float yc = (y - cy) * inv_f * d;
      float zc = d;
      float* q = out_xyz + i * 3;
      q[0] = c2w[0] * xc + c2w[1] * yc + c2w[2] * zc + c2w[3];
      q[1] = c2w[4] * xc + c2w[5] * yc + c2w[6] * zc + c2w[7];
      q[2] = c2w[8] * xc + c2w[9] * yc + c2w[10] * zc + c2w[11];
    }
  }
}

}  // extern "C"
