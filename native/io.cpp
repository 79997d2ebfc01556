// Native image I/O for the latent-fingerprinting framework.
//
// Role: the host-side runtime around the TPU compute path.  The
// reference's result storage goes through PIL per image
// (reference src/utils.py:85-125); at production scale (hundreds of
// fingerprinted PNGs per run, src/params.py:13) the encode cost sits on
// the Python heap.  This library provides a thin, dependency-light C++
// encode path (libpng + zlib) exposed through a C ABI for ctypes.
//
// Build: `make -C native` -> native/libfpio.so

#include <cstddef>
#include <cstdio>

// jpeglib.h does not include its own dependencies; stdio/stddef must
// come first.
#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Write an 8-bit image (c = 1 gray or 3 RGB) to `path`.
// Returns 0 on success, negative error codes otherwise.
int fpio_write_png(const char* path, const uint8_t* data, int w, int h, int c) {
  if (!path || !data || w <= 0 || h <= 0 || (c != 1 && c != 3)) return -1;

  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -2;

  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    std::fclose(fp);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return -4;
  }

  png_init_io(png, fp);
  // Favor encode speed over ratio: these are bulk result artifacts.
  png_set_compression_level(png, 1);
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_IHDR(png, info, w, h, 8,
               c == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);

  std::vector<png_bytep> rows(h);
  const size_t stride = static_cast<size_t>(w) * c;
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(data + y * stride);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);

  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 0;
}

// Batch variant: n images laid out contiguously [n, h, w, c]; paths are a
// NUL-separated buffer.  Amortizes the ctypes crossing for result bursts.
int fpio_write_png_batch(const char* paths, const uint8_t* data, int n, int w,
                         int h, int c) {
  const char* p = paths;
  const size_t img = static_cast<size_t>(w) * h * c;
  for (int i = 0; i < n; ++i) {
    int rc = fpio_write_png(p, data + i * img, w, h, c);
    if (rc != 0) return rc;
    p += std::strlen(p) + 1;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Read path: the training data loader.  The reference has no training
// subsystem (it loads rosinality checkpoints, src/PCA.py:40); this repo's
// training CLI accepts an image folder, and the decode -> center-crop ->
// area-resample -> RGB8 hot loop lives here so the Python side only hands
// out ready [target, target, 3] tensors.  The resample algorithm (separable
// box filter with fractional edge coverage) is mirrored bit-for-bit-ish by
// the numpy fallback in training/folder.py; tests assert |diff| <= 1.

namespace {

// Decode a PNG file into RGB8.  Any bit depth / palette / gray / alpha is
// normalized to 8-bit RGB via libpng transforms.  Returns 0 on success.
int decode_png_rgb8(const char* path, std::vector<uint8_t>* out, int* w_out,
                    int* h_out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -2;

  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return -5;  // not a PNG
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -4;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  const int w = static_cast<int>(png_get_image_width(png, info));
  const int h = static_cast<int>(png_get_image_height(png, info));
  if (w <= 0 || h <= 0 || png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return -6;
  }

  out->resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = out->data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *w_out = w;
  *h_out = h;
  return 0;
}

// libjpeg error handling: the default handler calls exit(); route fatal
// errors through setjmp so a corrupt file returns an error code instead
// of killing the training process.
struct JpegErrorMgr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(err->jb, 1);
}

// Decode a baseline/progressive JPEG into RGB8 (grayscale and YCbCr are
// converted by libjpeg; CMYK is rejected).  Returns 0 on success.
int decode_jpeg_rgb8(const char* path, std::vector<uint8_t>* out, int* w_out,
                     int* h_out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -2;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return -4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return -5;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  if (w <= 0 || h <= 0 || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return -6;
  }
  out->resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        out->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  *w_out = w;
  *h_out = h;
  return 0;
}

// Dispatch on the file's magic bytes (not the extension): PNG signature
// or JPEG SOI marker.  Returns -5 for unrecognized formats.
int decode_image_rgb8(const char* path, std::vector<uint8_t>* out, int* w_out,
                      int* h_out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -2;
  uint8_t magic[8] = {0};
  const size_t got = std::fread(magic, 1, 8, fp);
  std::fclose(fp);
  if (got >= 8 && !png_sig_cmp(magic, 0, 8))
    return decode_png_rgb8(path, out, w_out, h_out);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
    return decode_jpeg_rgb8(path, out, w_out, h_out);
  return -5;
}

// Separable 1-D area (box) resample taps: output index i covers input
// span [i*s/t, (i+1)*s/t); weight of input pixel j is its overlap with the
// span, normalized by the span length.  Precomputed once per (s, t) pair.
struct AxisTaps {
  std::vector<int> start;      // first input index per output index
  std::vector<int> count;      // number of taps per output index
  std::vector<double> weight;  // flattened taps, sum 1 per output index
  std::vector<int> offset;     // start of each output's taps in `weight`
};

AxisTaps make_axis_taps(int s, int t) {
  AxisTaps taps;
  taps.start.resize(t);
  taps.count.resize(t);
  taps.offset.resize(t);
  const double scale = static_cast<double>(s) / t;
  for (int i = 0; i < t; ++i) {
    const double a = i * scale;
    const double b = (i + 1) * scale;
    int j0 = static_cast<int>(std::floor(a));
    int j1 = static_cast<int>(std::ceil(b));
    if (j1 > s) j1 = s;
    if (j0 < 0) j0 = 0;
    taps.start[i] = j0;
    taps.count[i] = j1 - j0;
    taps.offset[i] = static_cast<int>(taps.weight.size());
    for (int j = j0; j < j1; ++j) {
      const double lo = j > a ? j : a;
      const double hi = (j + 1) < b ? (j + 1) : b;
      taps.weight.push_back((hi - lo) / scale);
    }
  }
  return taps;
}

// Center-crop [h, w, 3] RGB8 to the largest square, then area-resample to
// [target, target, 3].  Double accumulation; round-half-up to match the
// numpy fallback (np.floor(x + 0.5)).
void crop_resample_rgb8(const uint8_t* src, int w, int h, int target,
                        uint8_t* out) {
  const int s = w < h ? w : h;
  const int y0 = (h - s) / 2;
  const int x0 = (w - s) / 2;
  const AxisTaps taps = make_axis_taps(s, target);

  // rows pass: [s, s, 3] -> [target, s, 3]
  std::vector<double> tmp(static_cast<size_t>(target) * s * 3);
  for (int i = 0; i < target; ++i) {
    double* trow = tmp.data() + static_cast<size_t>(i) * s * 3;
    std::memset(trow, 0, sizeof(double) * s * 3);
    for (int k = 0; k < taps.count[i]; ++k) {
      const double wgt = taps.weight[taps.offset[i] + k];
      const uint8_t* srow = src + (static_cast<size_t>(y0 + taps.start[i] + k) * w + x0) * 3;
      for (int x = 0; x < s * 3; ++x) trow[x] += wgt * srow[x];
    }
  }
  // cols pass: [target, s, 3] -> [target, target, 3]
  for (int i = 0; i < target; ++i) {
    const double* trow = tmp.data() + static_cast<size_t>(i) * s * 3;
    uint8_t* orow = out + static_cast<size_t>(i) * target * 3;
    for (int j = 0; j < target; ++j) {
      for (int c = 0; c < 3; ++c) {
        double acc = 0.0;
        for (int k = 0; k < taps.count[j]; ++k)
          acc += taps.weight[taps.offset[j] + k] *
                 trow[(taps.start[j] + k) * 3 + c];
        double v = std::floor(acc + 0.5);
        if (v < 0.0) v = 0.0;
        if (v > 255.0) v = 255.0;
        orow[j * 3 + c] = static_cast<uint8_t>(v);
      }
    }
  }
}

}  // namespace

namespace {

using DecodeFn = int (*)(const char*, std::vector<uint8_t>*, int*, int*);

int load_rgb_one(DecodeFn decode, const char* path, int target, uint8_t* out) {
  if (!path || !out || target <= 0) return -1;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  const int rc = decode(path, &rgb, &w, &h);
  if (rc != 0) return rc;
  crop_resample_rgb8(rgb.data(), w, h, target, out);
  return 0;
}

// Threaded batch loader: n NUL-separated paths decoded into the contiguous
// [n, target, target, 3] buffer `out`.  n_threads <= 0 uses the hardware
// concurrency.  Returns 0, or the first error code encountered.
int load_rgb_batch(DecodeFn decode, const char* paths, int n, int target,
                   uint8_t* out, int n_threads) {
  if (!paths || !out || n <= 0 || target <= 0) return -1;
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += std::strlen(p) + 1;
  }
  int workers = n_threads > 0
                    ? n_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;
  if (workers > n) workers = n;

  const size_t img = static_cast<size_t>(target) * target * 3;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      const int rc = load_rgb_one(decode, ptrs[i], target, out + i * img);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
        return;
      }
    }
  };
  if (workers == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int i = 0; i < workers; ++i) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return err.load();
}

}  // namespace

extern "C" {

// Decode a PNG, center-crop to the largest square, area-resample to
// [target, target, 3] RGB8.  `out` must hold target*target*3 bytes.
// Returns 0 on success, negative error codes otherwise.
int fpio_load_png_rgb(const char* path, int target, uint8_t* out) {
  return load_rgb_one(decode_png_rgb8, path, target, out);
}

int fpio_load_png_rgb_batch(const char* paths, int n, int target, uint8_t* out,
                            int n_threads) {
  return load_rgb_batch(decode_png_rgb8, paths, n, target, out, n_threads);
}

// Format-sniffing variants (PNG signature or JPEG SOI marker, not the
// file extension); same crop/resample contract as the PNG entry points.
int fpio_load_image_rgb(const char* path, int target, uint8_t* out) {
  return load_rgb_one(decode_image_rgb8, path, target, out);
}

int fpio_load_image_rgb_batch(const char* paths, int n, int target,
                              uint8_t* out, int n_threads) {
  return load_rgb_batch(decode_image_rgb8, paths, n, target, out, n_threads);
}

}  // extern "C"
