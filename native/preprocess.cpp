// Native data-loader compute: antialiased separable bicubic resize +
// min-max renormalization for batches of RGB images, multithreaded.
//
// This is the framework's CPU-side hot path (the reference does this work in
// Python via torchvision/resize_right per item inside the dataset loop,
// /root/reference/minimagen/training.py:33-56,145-175). Implemented as a
// plain C ABI shared library consumed through ctypes
// (minimagen_tpu/data/native.py); no pybind11 dependency.
//
// Resampling: Catmull-Rom cubic (a = -0.5), kernel support scaled by the
// inverse scale factor when downscaling (classic antialiased resampling, the
// same family resize_right/PIL use). Edges clamp.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float cubic_kernel(float x) {
  // Catmull-Rom (Keys, a = -0.5)
  x = std::fabs(x);
  if (x < 1.0f) return ((1.5f * x - 2.5f) * x) * x + 1.0f;
  if (x < 2.0f) return (((-0.5f * x + 2.5f) * x) - 4.0f) * x + 2.0f;
  return 0.0f;
}

struct Taps {
  // per output index: first source index + normalized weights
  std::vector<int> start;
  std::vector<float> weights;  // (out_size, n_taps) row-major
  int n_taps;
};

Taps compute_taps(int in_size, int out_size) {
  const float scale = static_cast<float>(out_size) / in_size;
  const float filter_scale = std::max(1.0f, 1.0f / scale);  // widen for AA
  const float support = 2.0f * filter_scale;
  const int n_taps = static_cast<int>(std::ceil(support)) * 2 + 1;

  Taps t;
  t.n_taps = n_taps;
  t.start.resize(out_size);
  t.weights.assign(static_cast<size_t>(out_size) * n_taps, 0.0f);

  for (int o = 0; o < out_size; ++o) {
    const float center = (o + 0.5f) / scale - 0.5f;
    int first = static_cast<int>(std::floor(center - support + 0.5f));
    t.start[o] = first;
    float sum = 0.0f;
    float* w = &t.weights[static_cast<size_t>(o) * n_taps];
    for (int k = 0; k < n_taps; ++k) {
      const float x = (first + k - center) / filter_scale;
      w[k] = cubic_kernel(x);
      sum += w[k];
    }
    if (sum != 0.0f) {
      for (int k = 0; k < n_taps; ++k) w[k] /= sum;
    }
  }
  return t;
}

inline int clampi(int v, int lo, int hi) { return v < lo ? lo : (v > hi ? hi : v); }

// Resize one HWC u8 RGB image to (side, side) f32 in [0,1], then min-max
// renormalize (mirrors the reference _Rescale semantics, training.py:50-56).
void resize_one(const uint8_t* src, int sh, int sw, int channels, float* dst,
                int side, bool renorm) {
  const Taps tx = compute_taps(sw, side);
  const Taps ty = compute_taps(sh, side);

  // horizontal pass: (sh, side, c) f32
  std::vector<float> tmp(static_cast<size_t>(sh) * side * channels);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * channels;
    for (int o = 0; o < side; ++o) {
      const float* w = &tx.weights[static_cast<size_t>(o) * tx.n_taps];
      const int first = tx.start[o];
      float acc[4] = {0, 0, 0, 0};
      for (int k = 0; k < tx.n_taps; ++k) {
        const int xi = clampi(first + k, 0, sw - 1);
        const uint8_t* px = row + static_cast<size_t>(xi) * channels;
        const float wk = w[k];
        for (int c = 0; c < channels; ++c) acc[c] += wk * px[c];
      }
      float* out_px = &tmp[(static_cast<size_t>(y) * side + o) * channels];
      for (int c = 0; c < channels; ++c) out_px[c] = acc[c] * (1.0f / 255.0f);
    }
  }

  // vertical pass into dst: (side, side, c)
  for (int o = 0; o < side; ++o) {
    const float* w = &ty.weights[static_cast<size_t>(o) * ty.n_taps];
    const int first = ty.start[o];
    for (int x = 0; x < side; ++x) {
      float acc[4] = {0, 0, 0, 0};
      for (int k = 0; k < ty.n_taps; ++k) {
        const int yi = clampi(first + k, 0, sh - 1);
        const float* px = &tmp[(static_cast<size_t>(yi) * side + x) * channels];
        const float wk = w[k];
        for (int c = 0; c < channels; ++c) acc[c] += wk * px[c];
      }
      float* out_px = dst + (static_cast<size_t>(o) * side + x) * channels;
      for (int c = 0; c < channels; ++c) out_px[c] = acc[c];
    }
  }

  if (renorm) {
    const size_t n = static_cast<size_t>(side) * side * channels;
    float lo = dst[0], hi = dst[0];
    for (size_t i = 1; i < n; ++i) {
      lo = std::min(lo, dst[i]);
      hi = std::max(hi, dst[i]);
    }
    const float range = hi - lo;
    if (range > 0.0f) {
      const float inv = 1.0f / range;
      for (size_t i = 0; i < n; ++i) dst[i] = (dst[i] - lo) * inv;
    }
  }
}

}  // namespace

extern "C" {

// Resize a batch of variably-sized u8 RGB images (concatenated in `src`,
// per-image byte offsets/heights/widths) into a dense (n, side, side, c) f32
// output. Parallel over images. Returns 0 on success.
int mm_preprocess_batch(const uint8_t* src, const int64_t* offsets,
                        const int32_t* heights, const int32_t* widths,
                        int32_t n_images, int32_t channels, int32_t side,
                        int32_t renorm, float* out, int32_t n_threads) {
  if (channels < 1 || channels > 4 || side < 1 || n_images < 0) return 1;
  const size_t out_stride = static_cast<size_t>(side) * side * channels;

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_images) break;
      resize_one(src + offsets[i], heights[i], widths[i], channels,
                 out + static_cast<size_t>(i) * out_stride, side, renorm != 0);
    }
  };

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  const int threads = std::max(1, std::min(n_threads > 0 ? n_threads : hw, n_images > 0 ? n_images : 1));
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

// Single-image convenience entry.
int mm_resize_image(const uint8_t* src, int32_t h, int32_t w, int32_t channels,
                    float* dst, int32_t side, int32_t renorm) {
  if (channels < 1 || channels > 4 || side < 1) return 1;
  resize_one(src, h, w, channels, dst, side, renorm != 0);
  return 0;
}

}  // extern "C"
