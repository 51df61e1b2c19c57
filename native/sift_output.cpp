// Native output tier for the TPU SIFT engine.
//
// Role: the reference's examples render matches through OpenCV
// (examples/sift-match.rs:21-39 draw_matches -> matches.jpg) and return
// compact Vec<KeyPoint> lists (lib.rs:163-176). Here the host-side output
// path is native C++: (1) multi-threaded compaction of the device's padded
// fixed-capacity result arrays ((B, K, 5) f32 + (B, K, 128) u8 + validity
// mask -> per-frame contiguous blocks), (2) match rendering (side-by-side
// canvas, keypoint circles, colored match lines — the draw_matches analog),
// and (3) libjpeg encode. No OpenCV dependency anywhere in the output path.
//
// C API only (consumed via ctypes from sift_features_tpu.io.native_output).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Compaction: padded (B, K, ...) device outputs -> per-frame dense prefixes.
// Each frame's valid rows are packed to the front of its own capacity-K
// region (order preserved), so Python can expose zero-copy views
// out[f, :counts[f]]. Frames are independent -> thread over frames.
// ---------------------------------------------------------------------------

void compact_frame(const float* kps, const uint8_t* desc, const uint8_t* valid,
                   int k_cap, int d, float* out_kps, uint8_t* out_desc,
                   int32_t* out_count) {
  int n = 0;
  for (int i = 0; i < k_cap; ++i) {
    if (!valid[i]) continue;
    if (n != i) {
      std::memcpy(out_kps + static_cast<size_t>(n) * 5,
                  kps + static_cast<size_t>(i) * 5, 5 * sizeof(float));
      std::memcpy(out_desc + static_cast<size_t>(n) * d,
                  desc + static_cast<size_t>(i) * d, d);
    } else if (out_kps != kps) {
      std::memcpy(out_kps + static_cast<size_t>(n) * 5,
                  kps + static_cast<size_t>(i) * 5, 5 * sizeof(float));
      std::memcpy(out_desc + static_cast<size_t>(n) * d,
                  desc + static_cast<size_t>(i) * d, d);
    }
    ++n;
  }
  *out_count = n;
}

// ---------------------------------------------------------------------------
// Rendering primitives on an interleaved RGB canvas.
// ---------------------------------------------------------------------------

struct Canvas {
  uint8_t* px;
  int h, w;

  void set(int x, int y, uint8_t r, uint8_t g, uint8_t b) {
    if (x < 0 || y < 0 || x >= w || y >= h) return;
    uint8_t* p = px + (static_cast<size_t>(y) * w + x) * 3;
    p[0] = r; p[1] = g; p[2] = b;
  }
};

void draw_line(Canvas& c, int x0, int y0, int x1, int y1, uint8_t r,
               uint8_t g, uint8_t b) {
  // Bresenham, all octants
  const int dx = std::abs(x1 - x0), sx = x0 < x1 ? 1 : -1;
  const int dy = -std::abs(y1 - y0), sy = y0 < y1 ? 1 : -1;
  int err = dx + dy;
  for (;;) {
    c.set(x0, y0, r, g, b);
    if (x0 == x1 && y0 == y1) break;
    const int e2 = 2 * err;
    if (e2 >= dy) { err += dy; x0 += sx; }
    if (e2 <= dx) { err += dx; y0 += sy; }
  }
}

void draw_circle(Canvas& c, int cx, int cy, int rad, uint8_t r, uint8_t g,
                 uint8_t b) {
  // midpoint circle
  if (rad <= 0) { c.set(cx, cy, r, g, b); return; }
  int x = rad, y = 0, err = 1 - rad;
  while (x >= y) {
    c.set(cx + x, cy + y, r, g, b); c.set(cx - x, cy + y, r, g, b);
    c.set(cx + x, cy - y, r, g, b); c.set(cx - x, cy - y, r, g, b);
    c.set(cx + y, cy + x, r, g, b); c.set(cx - y, cy + x, r, g, b);
    c.set(cx + y, cy - x, r, g, b); c.set(cx - y, cy - x, r, g, b);
    ++y;
    if (err < 0) { err += 2 * y + 1; } else { --x; err += 2 * (y - x) + 1; }
  }
}

// Deterministic bright per-match color (splitmix-style hash of the index).
void match_color(int i, uint8_t* rgb) {
  uint32_t z = static_cast<uint32_t>(i) * 0x9E3779B9u + 0x6A09E667u;
  z ^= z >> 16; z *= 0x85EBCA6Bu; z ^= z >> 13; z *= 0xC2B2AE35u; z ^= z >> 16;
  rgb[0] = 64 + (z & 0xBF);
  rgb[1] = 64 + ((z >> 8) & 0xBF);
  rgb[2] = 64 + ((z >> 16) & 0xBF);
}

// ---------------------------------------------------------------------------
// JPEG encode (gray or RGB).
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Compact padded batch outputs. kps (B,K,5) f32, desc (B,K,D) u8, valid
// (B,K) u8 -> out_kps (B,K,5), out_desc (B,K,D) dense per-frame prefixes +
// out_counts (B,) i32. In-place allowed (out == in). Returns 0.
int so_compact(const float* kps, const uint8_t* desc, const uint8_t* valid,
               int b, int k_cap, int d, float* out_kps, uint8_t* out_desc,
               int32_t* out_counts, int n_threads) {
  const int nt = std::max(1, std::min(n_threads, b));
  std::vector<std::thread> ts;
  ts.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back([=] {
      for (int f = t; f < b; f += nt) {
        const size_t ko = static_cast<size_t>(f) * k_cap;
        compact_frame(kps + ko * 5, desc + ko * d, valid + ko, k_cap, d,
                      out_kps + ko * 5, out_desc + ko * d, out_counts + f);
      }
    });
  }
  for (auto& t : ts) t.join();
  return 0;
}

// Render a side-by-side match image (cv2.drawMatches analog, matched
// keypoints only). img1 is placed left, img2 right; kps are (N, 5) f32
// rows [x, y, size, angle, response]; pairs are (M, 2) i32 [idx1, idx2].
// out must hold max(h1,h2) * (w1+w2) * 3 bytes. Returns 0.
int so_render_matches(const uint8_t* img1, int h1, int w1,
                      const uint8_t* img2, int h2, int w2,
                      const float* kps1, int n1, const float* kps2, int n2,
                      const int32_t* pairs, int n_pairs, uint8_t* out) {
  const int h = std::max(h1, h2), w = w1 + w2;
  Canvas c{out, h, w};
  std::memset(out, 0, static_cast<size_t>(h) * w * 3);
  for (int y = 0; y < h1; ++y)
    for (int x = 0; x < w1; ++x) {
      const uint8_t v = img1[static_cast<size_t>(y) * w1 + x];
      c.set(x, y, v, v, v);
    }
  for (int y = 0; y < h2; ++y)
    for (int x = 0; x < w2; ++x) {
      const uint8_t v = img2[static_cast<size_t>(y) * w2 + x];
      c.set(w1 + x, y, v, v, v);
    }
  for (int m = 0; m < n_pairs; ++m) {
    const int i = pairs[2 * m], j = pairs[2 * m + 1];
    if (i < 0 || i >= n1 || j < 0 || j >= n2) return -1;
    uint8_t rgb[3];
    match_color(m, rgb);
    const float* a = kps1 + static_cast<size_t>(i) * 5;
    const float* bkp = kps2 + static_cast<size_t>(j) * 5;
    const int x0 = static_cast<int>(std::lround(a[0]));
    const int y0 = static_cast<int>(std::lround(a[1]));
    const int x1 = w1 + static_cast<int>(std::lround(bkp[0]));
    const int y1 = static_cast<int>(std::lround(bkp[1]));
    draw_circle(c, x0, y0, std::max(1, static_cast<int>(std::lround(a[2] / 2))),
                rgb[0], rgb[1], rgb[2]);
    draw_circle(c, x1, y1,
                std::max(1, static_cast<int>(std::lround(bkp[2] / 2))),
                rgb[0], rgb[1], rgb[2]);
    draw_line(c, x0, y0, x1, y1, rgb[0], rgb[1], rgb[2]);
  }
  return 0;
}

// Encode an (h, w, comps) u8 image (comps 1 = gray, 3 = RGB) to a JPEG
// file. Returns 0 on success.
int so_encode_jpeg(const uint8_t* img, int h, int w, int comps, int quality,
                   const char* path) {
  if (comps != 1 && comps != 3) return -3;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = comps;
  cinfo.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  for (int y = 0; y < h; ++y) {
    JSAMPROW row = const_cast<uint8_t*>(img)
        + static_cast<size_t>(y) * w * comps;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::fclose(f);
  return 0;
}

}  // extern "C"
