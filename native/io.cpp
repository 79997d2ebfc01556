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

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
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
