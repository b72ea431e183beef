// Host-side colour conversion for the hermetic Y4M data plane.
//
// The pure-numpy RGB<->YCbCr (full-range BT.601) in video/io.py costs
// ~285 ms per 4K frame on this host — slower than the TPU device program
// it feeds, so the hermetic pipeline would be host-bound.  These loops do
// the same float math (identical operation order, round-half-to-even like
// np.round) row-parallel across a small thread pool.
//
// Replaces the role cv2/libswscale play for the reference's data plane
// (upscale/upscale_processing.py:263-288 PNG/cv2 round-trips) without any
// external dependency.

#include <algorithm>
#include <atomic>
#include <cfenv>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_round(float v) {
  // matches np.clip(np.round(x), 0, 255): nearbyintf under the default
  // FE_TONEAREST mode rounds half to even, like np.round
  float r = nearbyintf(v);
  if (r < 0.0f) r = 0.0f;
  if (r > 255.0f) r = 255.0f;
  return static_cast<uint8_t>(r);
}

constexpr float KCB = 0.5f / (1.0f - 0.114f);
constexpr float KCR = 0.5f / (1.0f - 0.299f);

void rows_rgb_to_ycc(const uint8_t *rgb, uint8_t *y, uint8_t *cb, uint8_t *cr,
                     int64_t begin, int64_t end) {
  for (int64_t i = begin; i < end; ++i) {
    float r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    float yy = 0.299f * r + 0.587f * g + 0.114f * b;
    y[i] = clamp_round(yy);
    cb[i] = clamp_round(128.0f + (b - yy) * KCB);
    cr[i] = clamp_round(128.0f + (r - yy) * KCR);
  }
}

void rows_ycc_to_rgb(const uint8_t *y, const uint8_t *cb, const uint8_t *cr,
                     uint8_t *rgb, int64_t begin, int64_t end) {
  for (int64_t i = begin; i < end; ++i) {
    float yy = y[i];
    float u = static_cast<float>(cb[i]) - 128.0f;
    float v = static_cast<float>(cr[i]) - 128.0f;
    float r = yy + v * ((1.0f - 0.299f) / 0.5f);
    float b = yy + u * ((1.0f - 0.114f) / 0.5f);
    float g = (yy - 0.299f * r - 0.114f * b) / 0.587f;
    rgb[3 * i] = clamp_round(r);
    rgb[3 * i + 1] = clamp_round(g);
    rgb[3 * i + 2] = clamp_round(b);
  }
}

template <typename F>
void parallel_for(int64_t n, int threads, F f) {
  if (threads <= 1 || n < (1 << 16)) {
    f(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t b = t * chunk, e = std::min(n, b + chunk);
    if (b >= e) break;
    pool.emplace_back([=] { f(b, e); });
  }
  for (auto &th : pool) th.join();
}

}  // namespace

extern "C" {

// interleaved RGB24 (npix*3 bytes) -> planar Y, Cb, Cr (npix bytes each)
void imgproc_rgb_to_ycbcr444(const uint8_t *rgb, uint8_t *y, uint8_t *cb,
                             uint8_t *cr, int64_t npix, int threads) {
  parallel_for(npix, threads, [&](int64_t b, int64_t e) {
    rows_rgb_to_ycc(rgb, y, cb, cr, b, e);
  });
}

// planar Y, Cb, Cr (npix bytes each) -> interleaved RGB24 (npix*3 bytes)
void imgproc_ycbcr444_to_rgb(const uint8_t *y, const uint8_t *cb,
                             const uint8_t *cr, uint8_t *rgb, int64_t npix,
                             int threads) {
  parallel_for(npix, threads, [&](int64_t b, int64_t e) {
    rows_ycc_to_rgb(y, cb, cr, rgb, b, e);
  });
}

// Shuffle-planar uint8 (H, W, C*s*s) in (i, j, c) plane order ->
// interleaved (H*s, W*s, C).  The TPU device program skips this
// pixel-shuffle interleave (it crosses tiled-layout boundaries at ~1% of
// HBM bandwidth there — models/executor.py:_planar_tail_u8); on the host
// it is pure strided memcpy: for output row (h, i), each input pixel
// contributes s*C contiguous bytes from plane offset i*s*C.  C=3 is the
// RGB contract; C=1 assembles the Y/Cb/Cr planes of the packed 4:2:0
// contract (ops/yuv.py).
// in_stride = bytes between consecutive input pixels' plane blocks
// (channels*s*s when the planes are densely packed; larger when reading a
// channel-slice view of a wider packed buffer, e.g. the Y/Cb/Cr sections
// of the 4:2:0 contract — zero-copy, no ascontiguousarray needed).
void imgproc_planar_interleave_s(const uint8_t *p, uint8_t *out, int64_t h_lr,
                                 int64_t w_lr, int s, int channels,
                                 int64_t in_stride, int threads) {
  const int64_t in_px = in_stride;
  const int64_t chunk = (int64_t)channels * s;  // bytes per pixel per row
  const int64_t out_row = w_lr * chunk;
  const int64_t rows = h_lr * s;
  auto work = [&](int64_t rb, int64_t re) {
    for (int64_t r = rb; r < re; ++r) {
      const int64_t h = r / s, i = r % s;
      const uint8_t *src = p + h * w_lr * in_px + i * chunk;
      uint8_t *dst = out + r * out_row;
      for (int64_t w = 0; w < w_lr; ++w)
        std::memcpy(dst + w * chunk, src + w * in_px, chunk);
    }
  };
  if (threads <= 1 || rows < 64) {
    work(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t per = (rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t b = t * per, e = std::min(rows, b + per);
    if (b >= e) break;
    pool.emplace_back([=] { work(b, e); });
  }
  for (auto &th : pool) th.join();
}

void imgproc_planar_interleave_c(const uint8_t *p, uint8_t *out, int64_t h_lr,
                                 int64_t w_lr, int s, int channels,
                                 int threads) {
  imgproc_planar_interleave_s(p, out, h_lr, w_lr, s, channels,
                              (int64_t)channels * s * s, threads);
}

// back-compat entry point: the RGB (C=3) contract
void imgproc_planar_interleave(const uint8_t *p, uint8_t *out, int64_t h_lr,
                               int64_t w_lr, int s, int threads) {
  imgproc_planar_interleave_c(p, out, h_lr, w_lr, s, 3, threads);
}

}  // extern "C"
