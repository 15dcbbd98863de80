// libpng-based PNG decode for the native frame loader.
//
// Two paths matching the dataset formats (reference readers,
// src/utils/TUMRGBDReader.cpp:95-104 and src/utils/ImageReader.cpp:100-117):
//   * 8-bit color images  -> RGB uint8 (palette/gray/alpha normalized)
//   * 16-bit gray images  -> uint16 (TUM depth, raw values)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <png.h>

namespace emf {

namespace {

struct PngReader {
  FILE* f = nullptr;
  png_structp png = nullptr;
  png_infop info = nullptr;

  ~PngReader() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    if (f) std::fclose(f);
  }

  bool open(const char* path) {
    f = std::fopen(path, "rb");
    if (!f) return false;
    uint8_t sig[8];
    if (std::fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                 nullptr);
    if (!png) return false;
    info = png_create_info_struct(png);
    if (!info) return false;
    if (setjmp(png_jmpbuf(png))) return false;
    png_init_io(png, f);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    return true;
  }
};

}  // namespace

// Decodes a PNG as 8-bit RGB. Returns malloc'd (h, w, 3) uint8 buffer or
// nullptr. Caller frees.
uint8_t* png_read_rgb8(const char* path, int* width, int* height) {
  PngReader r;
  if (!r.open(path)) return nullptr;
  if (setjmp(png_jmpbuf(r.png))) return nullptr;

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(r.png, r.info, &w, &h, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(r.png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(r.png);
  if (png_get_valid(r.png, r.info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(r.png);
  if (bit_depth == 16) png_set_strip_16(r.png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(r.png);
  png_set_strip_alpha(r.png);
  png_read_update_info(r.png, r.info);

  uint8_t* out = (uint8_t*)std::malloc((size_t)w * h * 3);
  if (!out) return nullptr;
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++) rows[y] = out + (size_t)y * w * 3;
  png_read_image(r.png, rows.data());
  *width = (int)w;
  *height = (int)h;
  return out;
}

// Decodes a 16-bit grayscale PNG (TUM depth). Returns malloc'd (h, w)
// uint16 buffer (native endianness) or nullptr.
uint16_t* png_read_gray16(const char* path, int* width, int* height) {
  PngReader r;
  if (!r.open(path)) return nullptr;
  if (setjmp(png_jmpbuf(r.png))) return nullptr;

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(r.png, r.info, &w, &h, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);
  if (bit_depth != 16 || color_type != PNG_COLOR_TYPE_GRAY) return nullptr;
  png_set_swap(r.png);  // PNG is big-endian; we want host little-endian
  png_read_update_info(r.png, r.info);

  uint16_t* out = (uint16_t*)std::malloc((size_t)w * h * 2);
  if (!out) return nullptr;
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = (png_bytep)(out + (size_t)y * w);
  png_read_image(r.png, rows.data());
  *width = (int)w;
  *height = (int)h;
  return out;
}

// Writes an 8-bit RGB PNG (used by export writers / synthetic data tools).
int png_write_rgb8(const char* path, const uint8_t* data, int width,
                   int height) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; y++)
    rows[y] = (png_bytep)(data + (size_t)y * width * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return 0;
}

// Writes a 16-bit grayscale PNG.
int png_write_gray16(const char* path, const uint16_t* data, int width,
                     int height) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(f);
    return -1;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, width, height, 16, PNG_COLOR_TYPE_GRAY,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  png_set_swap(png);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; y++)
    rows[y] = (png_bytep)(data + (size_t)y * width);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return 0;
}

}  // namespace emf
