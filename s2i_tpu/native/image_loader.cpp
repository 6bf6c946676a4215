// Native host data-path: multithreaded JPEG decode + StackGAN image
// transform + multi-scale pyramid, C ABI for ctypes.
//
// Role (SURVEY.md §2 "TPU-native equivalent" column): the reference's host
// data path is torch DataLoader worker processes wrapping PIL; at the
// ≥256 images/sec/chip target the Python/PIL path becomes the bottleneck,
// so decode→crop→resize→augment→normalize→pyramid runs here in C++ worker
// threads writing straight into caller-owned float buffers (zero Python-side
// copies). PNG and exotic formats fall back to the PIL path in Python.
//
// Per-image pipeline (matches s2i_tpu/data/stackgan.py::load_image):
//   1. decode JPEG (libjpeg, RGB)
//   2. optional bbox crop with 1.5x margin
//   3. bilinear resize to load_size = imsize * 76 / 64
//   4. random crop to imsize + random horizontal flip (or center crop)
//   5. normalize to [-1, 1] float32
//   6. area-pool the top scale into each smaller scale (÷2 per stage)
//
// RNG: splitmix64 seeded per (seed, image-index) — deterministic given the
// batch seed, independent of thread scheduling.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to tightly-packed RGB8. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

// Bilinear resize RGB8 region [x0,y0)-(x1,y1) of src into dst (dw x dh RGB8).
void resize_bilinear(const uint8_t* src, int sw, int sh, int x0, int y0,
                     int x1, int y1, uint8_t* dst, int dw, int dh) {
  const float rw = static_cast<float>(x1 - x0) / dw;
  const float rh = static_cast<float>(y1 - y0) / dh;
  for (int y = 0; y < dh; ++y) {
    // PIL-style half-pixel centers
    float fy = y0 + (y + 0.5f) * rh - 0.5f;
    int iy = static_cast<int>(floorf(fy));
    float wy = fy - iy;
    int iy0 = iy < 0 ? 0 : (iy >= sh ? sh - 1 : iy);
    int iy1 = iy + 1 < 0 ? 0 : (iy + 1 >= sh ? sh - 1 : iy + 1);
    for (int x = 0; x < dw; ++x) {
      float fx = x0 + (x + 0.5f) * rw - 0.5f;
      int ix = static_cast<int>(floorf(fx));
      float wx = fx - ix;
      int ix0 = ix < 0 ? 0 : (ix >= sw ? sw - 1 : ix);
      int ix1 = ix + 1 < 0 ? 0 : (ix + 1 >= sw ? sw - 1 : ix + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(iy0) * sw + ix0) * 3 + c];
        float v01 = src[(static_cast<size_t>(iy0) * sw + ix1) * 3 + c];
        float v10 = src[(static_cast<size_t>(iy1) * sw + ix0) * 3 + c];
        float v11 = src[(static_cast<size_t>(iy1) * sw + ix1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

}  // namespace

namespace {

// OutT = float: values in [-1, 1] (x/127.5 - 1).
// OutT = uint8_t: raw [0, 255] — the device normalizes after transfer
// (4x fewer host->device bytes; see DATA.IMAGE_DTYPE).
template <typename OutT>
int load_batch_impl(const char** paths, int n, const float* bboxes, int imsize,
                    int branch_num, uint64_t seed, int augment, OutT** outs,
                    int num_threads) {
  const int load_size = imsize * 76 / 64;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};

  auto worker = [&]() {
    std::vector<uint8_t> rgb, resized(static_cast<size_t>(load_size) * load_size * 3);
    // top scale kept as float pixel values in [0, 255]: the pyramid
    // area-pool averages in that space for both output types, so the two
    // paths differ only by the final quantization/normalization.
    std::vector<float> top(static_cast<size_t>(imsize) * imsize * 3);
    auto store = [](float v255, OutT* o) {
      if (sizeof(OutT) == 1) {
        float r = v255 + 0.5f;
        *o = static_cast<OutT>(r < 0 ? 0 : (r > 255 ? 255 : r));
      } else {
        *o = static_cast<OutT>(v255 / 127.5f - 1.0f);
      }
    };
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      bool ok = decode_jpeg(paths[i], rgb, w, h);
      if (!ok) {
        failures.fetch_add(1);
        for (int b = 0; b < branch_num; ++b) {
          int s = (imsize >> (branch_num - 1)) << b;
          memset(outs[b] + static_cast<size_t>(i) * s * s * 3, 0,
                 static_cast<size_t>(s) * s * 3 * sizeof(OutT));
        }
        continue;
      }
      int x0 = 0, y0 = 0, x1 = w, y1 = h;
      if (bboxes) {
        float bx = bboxes[i * 4 + 0], by = bboxes[i * 4 + 1];
        float bw = bboxes[i * 4 + 2], bh = bboxes[i * 4 + 3];
        if (bw > 0 && bh > 0) {
          float cx = bx + bw / 2, cy = by + bh / 2;
          int r = static_cast<int>(fmaxf(bw, bh) * 0.75f);
          x0 = std::max(0, static_cast<int>(cx) - r);
          y0 = std::max(0, static_cast<int>(cy) - r);
          x1 = std::min(w, static_cast<int>(cx) + r);
          y1 = std::min(h, static_cast<int>(cy) + r);
        }
      }
      resize_bilinear(rgb.data(), w, h, x0, y0, x1, y1, resized.data(),
                      load_size, load_size);

      uint64_t s = seed * 0x9e3779b97f4a7c15ULL + i + 1;
      int ox, oy;
      bool flip = false;
      if (augment) {
        ox = static_cast<int>(splitmix64(s) % (load_size - imsize + 1));
        oy = static_cast<int>(splitmix64(s) % (load_size - imsize + 1));
        flip = (splitmix64(s) & 1) != 0;
      } else {
        ox = oy = (load_size - imsize) / 2;
      }
      for (int y = 0; y < imsize; ++y) {
        for (int x = 0; x < imsize; ++x) {
          int sx = flip ? (ox + imsize - 1 - x) : (ox + x);
          const uint8_t* px =
              resized.data() + (static_cast<size_t>(oy + y) * load_size + sx) * 3;
          float* out = top.data() + (static_cast<size_t>(y) * imsize + x) * 3;
          out[0] = px[0];
          out[1] = px[1];
          out[2] = px[2];
        }
      }
      // write pyramid: area-pool by 2^(branch-1-b)
      for (int b = 0; b < branch_num; ++b) {
        int shift = branch_num - 1 - b;
        int sc = imsize >> shift;
        int f = 1 << shift;
        OutT* dst = outs[b] + static_cast<size_t>(i) * sc * sc * 3;
        float inv = 1.0f / (f * f);
        for (int y = 0; y < sc; ++y) {
          for (int x = 0; x < sc; ++x) {
            float acc[3] = {0, 0, 0};
            for (int dy = 0; dy < f; ++dy)
              for (int dx = 0; dx < f; ++dx) {
                const float* px =
                    top.data() +
                    (static_cast<size_t>(y * f + dy) * imsize + x * f + dx) * 3;
                acc[0] += px[0];
                acc[1] += px[1];
                acc[2] += px[2];
              }
            OutT* o = dst + (static_cast<size_t>(y) * sc + x) * 3;
            store(acc[0] * inv, o + 0);
            store(acc[1] * inv, o + 1);
            store(acc[2] * inv, o + 2);
          }
        }
      }
    }
  };

  int nt = num_threads > 0 ? num_threads : 4;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // namespace

extern "C" {

// Load one batch. Returns number of failed images (their slots are zeroed;
// caller retries those via the PIL fallback).
//   paths:      n C strings
//   bboxes:     n*4 floats (x, y, w, h) or nullptr
//   imsize:     top-scale size (e.g. 256)
//   branch_num: number of pyramid scales (1..3), base = imsize >> (branch-1)
//   seed:       batch seed for crop/flip rng
//   augment:    1 = random crop + flip, 0 = center crop
//   outs:       branch_num pointers, outs[i] = float[n, s_i, s_i, 3] NHWC,
//               s_i = base << i, values in [-1, 1]
//   num_threads
int il_load_batch(const char** paths, int n, const float* bboxes, int imsize,
                  int branch_num, uint64_t seed, int augment, float** outs,
                  int num_threads) {
  return load_batch_impl<float>(paths, n, bboxes, imsize, branch_num, seed,
                                augment, outs, num_threads);
}

// Same pipeline, uint8 [0, 255] outputs (device-side normalization):
// identical decode/crop/flip/area-pool math, final store rounds instead of
// normalizing — 4x fewer host->device bytes per batch.
int il_load_batch_u8(const char** paths, int n, const float* bboxes,
                     int imsize, int branch_num, uint64_t seed, int augment,
                     uint8_t** outs, int num_threads) {
  return load_batch_impl<uint8_t>(paths, n, bboxes, imsize, branch_num, seed,
                                  augment, outs, num_threads);
}

// Decode-only entry (shape probe / tests): returns 0 on success.
int il_probe(const char* path, int* w, int* h) {
  std::vector<uint8_t> rgb;
  return decode_jpeg(path, rgb, *w, *h) ? 0 : 1;
}

}  // extern "C"
