// Native data loader for the TPU SIFT engine.
//
// Role: the reference crate's image-decode tier is native Rust (the `image`
// crate decoding JPEGs and converting to luma, reference lib.rs:198 +
// examples/run-sift.rs). Here the equivalent is a C++ library: libjpeg
// decode, three grayscale conversions (libjpeg JCS_GRAYSCALE == OpenCV
// imread(IMREAD_GRAYSCALE); BT.601 fixed-point == cv2.cvtColor; BT.709
// truncating == Rust image 0.25's DynamicImage::grayscale()), and a
// multi-threaded prefetching batch pool that assembles fixed-shape (B, H, W)
// u8 batches for the device feed (crop/zero-pad to the static TPU shape).
//
// C API only (consumed via ctypes from sift_features_tpu.io.native_loader).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// luma modes
enum LumaMode {
  LUMA_JPEG_GRAY = 0,  // libjpeg JCS_GRAYSCALE (cv2.imread grayscale path)
  LUMA_BT601 = 1,      // OpenCV cvtColor fixed-point: (R*4899+G*9617+B*1868+8192)>>14
  LUMA_BT709_TRUNC = 2 // Rust image crate: (2126R+7152G+722B)/10000 truncating
};

// Decode a JPEG file to grayscale. Returns 0 on success.
// out must hold max_h*max_w bytes; *h/*w receive the decoded dims (capped).
int decode_gray_impl(const char* path, uint8_t* out, int* h, int* w,
                     int max_h, int max_w, int luma) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // high bits of `luma` carry decode options (golden-parity experiments):
  // bits 8-9: DCT method (0 islow, 1 ifast, 2 float); bit 10: plain
  // (non-fancy) chroma upsampling. Low byte: luma mode.
  const int opts = luma >> 8;
  luma &= 0xff;
  const bool direct_gray = (luma == LUMA_JPEG_GRAY);
  cinfo.out_color_space = direct_gray ? JCS_GRAYSCALE : JCS_RGB;
  const int dct = opts & 3;
  cinfo.dct_method = dct == 1 ? JDCT_IFAST : (dct == 2 ? JDCT_FLOAT : JDCT_ISLOW);
  if (opts & 4) cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);

  const int width = static_cast<int>(cinfo.output_width);
  const int height = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;
  const int out_h = height < max_h ? height : max_h;
  const int out_w = width < max_w ? width : max_w;
  *h = out_h;
  *w = out_w;

  std::vector<uint8_t> row(static_cast<size_t>(width) * comps);
  uint8_t* rowp = row.data();
  for (int y = 0; y < height; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    if (y >= out_h) continue;  // keep consuming scanlines to finish cleanly
    uint8_t* dst = out + static_cast<size_t>(y) * max_w;
    if (direct_gray) {
      std::memcpy(dst, rowp, out_w);
    } else if (luma == LUMA_BT601) {
      for (int x = 0; x < out_w; ++x) {
        const uint32_t r = rowp[3 * x], g = rowp[3 * x + 1], b = rowp[3 * x + 2];
        dst[x] = static_cast<uint8_t>((4899u * r + 9617u * g + 1868u * b + 8192u) >> 14);
      }
    } else {  // LUMA_BT709_TRUNC
      for (int x = 0; x < out_w; ++x) {
        const uint32_t r = rowp[3 * x], g = rowp[3 * x + 1], b = rowp[3 * x + 2];
        dst[x] = static_cast<uint8_t>((2126u * r + 7152u * g + 722u * b) / 10000u);
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetching batch pool: worker threads decode frames into fixed-shape
// (H, W) slots (crop / zero-pad), a consumer drains assembled batches in
// order. Bounded queue -> bounded host memory.
// ---------------------------------------------------------------------------

struct BatchPool {
  std::vector<std::string> paths;
  int batch, h, w, luma;
  size_t frame_bytes;

  std::vector<std::vector<uint8_t>> slots;  // one buffer per frame index
  std::vector<std::atomic<int>> done;       // 0 = pending, 1 = decoded, -1 = error
  std::vector<std::atomic<int>> consumed;   // 1 once copied out (slot freed)

  std::atomic<int> next_job{0};
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv;

  BatchPool(const char** p, int n, int batch_, int h_, int w_, int luma_,
            int n_threads)
      : batch(batch_), h(h_), w(w_), luma(luma_),
        frame_bytes(static_cast<size_t>(h_) * w_),
        slots(n), done(n), consumed(n) {
    paths.reserve(n);
    for (int i = 0; i < n; ++i) paths.emplace_back(p[i]);
    for (int i = 0; i < n; ++i) { done[i].store(0); consumed[i].store(0); }
    const int nt = n_threads > 0 ? n_threads : 2;
    for (int t = 0; t < nt; ++t)
      workers.emplace_back([this] { this->work(); });
  }

  void work() {
    for (;;) {
      if (stop.load()) return;
      const int i = next_job.fetch_add(1);
      if (i >= static_cast<int>(paths.size())) return;
      slots[i].assign(frame_bytes, 0);  // zero-pad
      int dh = 0, dw = 0;
      const int rc = decode_gray_impl(paths[i].c_str(), slots[i].data(),
                                      &dh, &dw, h, w, luma);
      {
        // done[] must flip under mu: a store+notify between the consumer's
        // false predicate check and its block would otherwise be a lost
        // wakeup (the last frame of a batch never re-notifies).
        std::lock_guard<std::mutex> lk(mu);
        done[i].store(rc == 0 ? 1 : -1);
      }
      cv.notify_all();
    }
  }

  // Copy batch b (frames b*batch .. min((b+1)*batch, n)) into out.
  // Returns the number of frames copied, -1 on decode error, or -2 if the
  // batch was already consumed (slots are freed after the first copy, so a
  // second read would be from empty buffers).
  int next(int b, uint8_t* out) {
    const int n = static_cast<int>(paths.size());
    const int lo = b * batch;
    if (lo >= n) return 0;
    const int hi = std::min(lo + batch, n);
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] {
      for (int i = lo; i < hi; ++i)
        if (done[i].load() == 0) return false;
      return true;
    });
    for (int i = lo; i < hi; ++i)
      if (consumed[i].load() != 0) return -2;
    // Validate the WHOLE batch before copying anything: a decode error must
    // not leave earlier frames copied+consumed (a retry would then hit -2
    // and mask the original error while losing the partial batch).
    for (int i = lo; i < hi; ++i)
      if (done[i].load() < 0) return -1;
    for (int i = lo; i < hi; ++i) {
      std::memcpy(out + static_cast<size_t>(i - lo) * frame_bytes,
                  slots[i].data(), frame_bytes);
      consumed[i].store(1);
      slots[i].clear();
      slots[i].shrink_to_fit();
    }
    return hi - lo;
  }

  ~BatchPool() {
    stop.store(true);
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

int sl_decode_gray(const char* path, uint8_t* out, int* h, int* w,
                   int max_h, int max_w, int luma) {
  return decode_gray_impl(path, out, h, w, max_h, max_w, luma);
}

void* sl_pool_create(const char** paths, int n, int batch, int h, int w,
                     int luma, int n_threads) {
  return new BatchPool(paths, n, batch, h, w, luma, n_threads);
}

int sl_pool_next(void* pool, int batch_index, uint8_t* out) {
  return static_cast<BatchPool*>(pool)->next(batch_index, out);
}

void sl_pool_destroy(void* pool) { delete static_cast<BatchPool*>(pool); }

}  // extern "C"
