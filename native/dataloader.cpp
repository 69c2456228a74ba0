// Native data-loading runtime: multithreaded JPEG decode + bilinear resize +
// center-crop + normalize, exposed as a C API for ctypes.
//
// This is the TPU-native framework's replacement for the implicit native
// machinery the reference leaned on (torch DataLoader worker processes + PIL,
// SURVEY.md §2.4): one shared library, a thread pool per call, zero Python in
// the per-frame path.  Preprocessing matches ctc_tpu/data/frames.py
// (torchvision semantics): shorter side -> resize_target with a triangle
// (bilinear) filter whose support scales on downsampling (PIL-style), center
// crop, (x/255 - 0.5)/0.5 normalization, channels-last float32 output.
//
// Build: make -C native   (produces libctcdata.so; see Makefile)

#include <cstdio>  // must precede jpeglib.h (it needs FILE)

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG into an RGB byte buffer. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                 int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
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
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Precomputed PIL-style triangle (bilinear) filter table for one axis.
struct Filter {
  std::vector<int> xmin;     // [len_out]
  std::vector<int> count;    // [len_out]
  std::vector<float> weight; // [len_out * max_count], normalized
  int max_count = 0;
};

Filter build_filter(int len_in, int len_out) {
  Filter f;
  const double scale = static_cast<double>(len_in) / len_out;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // bilinear support = 1
  f.xmin.resize(len_out);
  f.count.resize(len_out);
  std::vector<std::vector<float>> rows(len_out);
  for (int i = 0; i < len_out; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > len_in) xmax = len_in;
    const int n = xmax - xmin;
    rows[i].resize(n);
    double total = 0.0;
    for (int x = 0; x < n; ++x) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double wgt = (arg < 0 ? 1.0 + arg : 1.0 - arg);
      if (wgt < 0) wgt = 0;
      rows[i][x] = static_cast<float>(wgt);
      total += wgt;
    }
    if (total > 0)
      for (int x = 0; x < n; ++x) rows[i][x] = static_cast<float>(rows[i][x] / total);
    f.xmin[i] = xmin;
    f.count[i] = n;
    f.max_count = std::max(f.max_count, n);
  }
  f.weight.assign(static_cast<size_t>(len_out) * f.max_count, 0.0f);
  for (int i = 0; i < len_out; ++i)
    std::copy(rows[i].begin(), rows[i].end(),
              f.weight.begin() + static_cast<size_t>(i) * f.max_count);
  return f;
}

// Full per-frame pipeline into out[crop, crop, 3].
bool process_frame(const char* path, int resize_target, int crop, float* out) {
  std::vector<unsigned char> rgb;
  int w, h;
  if (!decode_jpeg(path, rgb, w, h)) return false;

  int nw, nh;
  if (w < h) {
    nw = resize_target;
    nh = static_cast<int>(std::lround(static_cast<double>(h) * resize_target / w));
  } else {
    nh = resize_target;
    nw = static_cast<int>(std::lround(static_cast<double>(w) * resize_target / h));
  }

  const Filter fh = build_filter(w, nw);
  const Filter fv = build_filter(h, nh);

  // horizontal pass: [h, w, 3] u8 -> [h, nw, 3] f32 (per-row, cache-local)
  std::vector<float> tmp(static_cast<size_t>(h) * nw * 3);
  for (int row = 0; row < h; ++row) {
    const unsigned char* src = rgb.data() + static_cast<size_t>(row) * w * 3;
    float* dst = tmp.data() + static_cast<size_t>(row) * nw * 3;
    for (int i = 0; i < nw; ++i) {
      const float* wt = fh.weight.data() + static_cast<size_t>(i) * fh.max_count;
      const unsigned char* s = src + static_cast<size_t>(fh.xmin[i]) * 3;
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < fh.count[i]; ++k) {
        const float wk = wt[k];
        r += wk * s[3 * k];
        g += wk * s[3 * k + 1];
        b += wk * s[3 * k + 2];
      }
      dst[3 * i] = r;
      dst[3 * i + 1] = g;
      dst[3 * i + 2] = b;
    }
  }

  // vertical pass: per OUTPUT row, accumulate whole input rows (row-major)
  std::vector<float> resized(static_cast<size_t>(nh) * nw * 3);
  const size_t rowlen = static_cast<size_t>(nw) * 3;
  for (int i = 0; i < nh; ++i) {
    float* dst = resized.data() + static_cast<size_t>(i) * rowlen;
    std::memset(dst, 0, rowlen * sizeof(float));
    const float* wt = fv.weight.data() + static_cast<size_t>(i) * fv.max_count;
    for (int k = 0; k < fv.count[i]; ++k) {
      const float wk = wt[k];
      const float* src = tmp.data() + static_cast<size_t>(fv.xmin[i] + k) * rowlen;
      for (size_t j = 0; j < rowlen; ++j) dst[j] += wk * src[j];
    }
  }

  const int left = (nw - crop) / 2;
  const int top = (nh - crop) / 2;
  for (int row = 0; row < crop; ++row) {
    for (int col = 0; col < crop; ++col) {
      for (int c = 0; c < 3; ++c) {
        float v = resized[(static_cast<size_t>(row + top) * nw + (col + left)) * 3 + c];
        out[(static_cast<size_t>(row) * crop + col) * 3 + c] =
            (v / 255.0f - 0.5f) / 0.5f;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode + preprocess n frames in parallel into out [n, crop, crop, 3] f32.
// Returns 0 on success, or (1 + index) of the first failed frame.
int ctc_decode_frames(const char** paths, int n, int resize_target, int crop,
                      int num_threads, float* out) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0);
  std::atomic<int> failed(0);  // 0 = ok, else 1+index
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;
      float* dst = out + static_cast<size_t>(i) * crop * crop * 3;
      if (!process_frame(paths[i], resize_target, crop, dst)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, 1 + i);
      }
    }
  };
  std::vector<std::thread> threads;
  const int t = std::min(num_threads, std::max(n, 1));
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failed.load();
}

}  // extern "C"
