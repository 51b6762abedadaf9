// Native threaded image loader: JPEG/PNG decode + resize + crop + normalize.
//
// TPU-native replacement for the reference's torchvision/PIL input pipeline
// (/root/reference/utils/imagenet_dataloaders.py:22-139). The reference
// leans on torch DataLoader worker *processes*; here the host pipeline is a
// C++ thread pool decoding and preprocessing a whole batch per call, feeding
// NHWC float32 directly into jax.device_put.
//
// Preprocessing mirrors the reference validation transform
// (imagenet_dataloaders.py:60-70): resize shorter side to image_size + 24
// with a PIL-style triangle (bilinear) filter, center-crop to image_size,
// scale to [0,1], normalize with per-channel mean/std.
//
// Build: make -C runtime  (produces libimage_loader.so; links -ljpeg -lpng)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode JPEG bytes to RGB8. Returns true on success.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "truncated png");
    return;
  }
  std::memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

// Decode PNG bytes to RGB8 (palette/gray/alpha are expanded/flattened).
bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{data, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  png_set_expand(png);          // palette/gray -> 8-bit
  png_set_strip_16(png);        // 16-bit -> 8-bit
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);     // flatten alpha (PIL convert("RGB") drops it)
  png_read_update_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = rgb->data() + static_cast<size_t>(y) * *w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_any(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, rgb, w, h);
  if (len >= 8 && !png_sig_cmp(data, 0, 8))
    return decode_png(data, len, rgb, w, h);
  return false;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

// ---------------------------------------------------------------------------
// PIL-style triangle (BILINEAR) resampling, separable float two-pass
// ---------------------------------------------------------------------------

struct FilterWeights {
  std::vector<int> start;      // first source index per output pixel
  std::vector<int> count;      // taps per output pixel
  std::vector<float> coef;     // count-padded coefficient rows
  int max_count = 0;
};

// Triangle filter with support widened by the downscale factor — PIL's
// resample kernel construction (libImaging/Resample.c).
FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;
  int max_count = static_cast<int>(std::ceil(support)) * 2 + 1;
  fw.start.resize(out_size);
  fw.count.resize(out_size);
  fw.coef.assign(static_cast<size_t>(out_size) * max_count, 0.0f);
  fw.max_count = max_count;

  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
    int xmax = static_cast<int>(
        std::min<double>(in_size, std::ceil(center + support)));
    double total = 0.0;
    std::vector<double> tmp(xmax - xmin);
    for (int i = xmin; i < xmax; ++i) {
      double t = (i + 0.5 - center) / filterscale;
      double wgt = (t < 0 ? 1.0 + t : 1.0 - t);
      wgt = std::max(0.0, wgt);
      tmp[i - xmin] = wgt;
      total += wgt;
    }
    fw.start[x] = xmin;
    fw.count[x] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i)
      fw.coef[static_cast<size_t>(x) * max_count + i] =
          static_cast<float>(total > 0 ? tmp[i] / total : 0.0);
  }
  return fw;
}

// Resize RGB8 (h, w, 3) -> float32 (out_h, out_w, 3), two separable passes.
void resize_triangle(const uint8_t* src, int w, int h, int out_w, int out_h,
                     std::vector<float>* dst) {
  FilterWeights fx = triangle_weights(w, out_w);
  FilterWeights fy = triangle_weights(h, out_h);

  // horizontal pass: (h, w, 3) -> (h, out_w, 3)
  std::vector<float> mid(static_cast<size_t>(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* orow = mid.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const float* cf = fx.coef.data() + static_cast<size_t>(x) * fx.max_count;
      float acc[3] = {0, 0, 0};
      int s = fx.start[x];
      for (int i = 0; i < fx.count[x]; ++i) {
        const uint8_t* px = row + static_cast<size_t>(s + i) * 3;
        acc[0] += cf[i] * px[0];
        acc[1] += cf[i] * px[1];
        acc[2] += cf[i] * px[2];
      }
      orow[x * 3 + 0] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (h, out_w, 3) -> (out_h, out_w, 3)
  dst->resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < out_h; ++y) {
    const float* cf = fy.coef.data() + static_cast<size_t>(y) * fy.max_count;
    float* orow = dst->data() + static_cast<size_t>(y) * out_w * 3;
    std::fill(orow, orow + static_cast<size_t>(out_w) * 3, 0.0f);
    int s = fy.start[y];
    for (int i = 0; i < fy.count[y]; ++i) {
      const float* irow = mid.data() + static_cast<size_t>(s + i) * out_w * 3;
      float c = cf[i];
      for (int x = 0; x < out_w * 3; ++x) orow[x] += c * irow[x];
    }
  }
}

// Full validation preprocess of one decoded image into out (HWC float32,
// image_size x image_size x 3).
void preprocess_rgb(const uint8_t* rgb, int w, int h, int image_size,
                    const float* mean, const float* stddev, float* out) {
  int target = image_size + 24;  // imagenet_dataloaders.py:60-70
  int nw, nh;
  if (w < h) {
    nw = target;
    nh = static_cast<int>(std::lround(static_cast<double>(h) * target / w));
  } else {
    nh = target;
    nw = static_cast<int>(std::lround(static_cast<double>(w) * target / h));
  }
  std::vector<float> resized;
  resize_triangle(rgb, w, h, nw, nh, &resized);

  int left = (nw - image_size) / 2;
  int top = (nh - image_size) / 2;
  for (int y = 0; y < image_size; ++y) {
    const float* irow =
        resized.data() + (static_cast<size_t>(top + y) * nw + left) * 3;
    float* orow = out + static_cast<size_t>(y) * image_size * 3;
    for (int x = 0; x < image_size; ++x) {
      for (int c = 0; c < 3; ++c) {
        // PIL stores the resized image as uint8 before ToTensor: replicate
        // the rounding+clamp so the native path matches the PIL pipeline
        float v = std::nearbyintf(irow[x * 3 + c]);
        v = std::min(255.0f, std::max(0.0f, v));
        orow[x * 3 + c] = (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode + preprocess one file. Returns 0 on success, nonzero on failure.
// out must hold image_size*image_size*3 floats.
int il_preprocess_file(const char* path, int image_size, const float* mean,
                       const float* stddev, float* out) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return 1;
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_any(bytes.data(), bytes.size(), &rgb, &w, &h)) return 2;
  preprocess_rgb(rgb.data(), w, h, image_size, mean, stddev, out);
  return 0;
}

// Decode + preprocess a batch of files with an internal thread pool.
// paths: n zero-terminated strings back to back. out: (n, S, S, 3) floats.
// status: n ints (0 ok / error codes as above). num_threads<=0 => hw threads.
void il_preprocess_batch(const char* paths, int n, int image_size,
                         const float* mean, const float* stddev, float* out,
                         int* status, int num_threads) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files[i] = p;
    p += std::strlen(p) + 1;
  }
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = num_threads > 0 ? num_threads : (hw > 0 ? hw : 2);
  nt = std::min(nt, n);
  std::atomic<int> next(0);
  size_t stride = static_cast<size_t>(image_size) * image_size * 3;

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
      status[i] = il_preprocess_file(files[i], image_size, mean, stddev,
                                     out + stride * i);
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

// Raw decode to RGB8 for testing: out must hold max_bytes; returns actual
// (w<<16)|h packed on success via w_out/h_out, 0 status on success.
int il_decode_file(const char* path, uint8_t* out, int64_t max_bytes,
                   int* w_out, int* h_out) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return 1;
  std::vector<uint8_t> rgb;
  if (!decode_any(bytes.data(), bytes.size(), &rgb, w_out, h_out)) return 2;
  if (static_cast<int64_t>(rgb.size()) > max_bytes) return 3;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

}  // extern "C"
