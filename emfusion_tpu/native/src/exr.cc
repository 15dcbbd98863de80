// Minimal OpenEXR scanline codec (read + write).
//
// Native-tier replacement for the reference's dependence on OpenCV's EXR
// reader (Co-Fusion depth maps, reference src/utils/ImageReader.cpp:100-117).
// Supports the subset the datasets actually use: single-part scanline
// images, NONE / ZIP / ZIPS compression, HALF / FLOAT / UINT channels,
// INCREASING_Y line order.
//
// Exposed through the C API in emf_runtime.cc.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>
#include <algorithm>
#include <zlib.h>

namespace emf {

namespace {

constexpr uint32_t kMagic = 20000630;  // 0x01312f76 little-endian on disk

struct Channel {
  std::string name;
  int32_t pixel_type;  // 0=UINT, 1=HALF, 2=FLOAT
};

struct ExrHeader {
  std::vector<Channel> channels;  // sorted by name (file order)
  uint8_t compression = 0;        // 0=NONE, 2=ZIPS, 3=ZIP
  int32_t xmin = 0, ymin = 0, xmax = 0, ymax = 0;
  uint8_t line_order = 0;
  long data_start = 0;  // file offset of the scanline offset table
};

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) {
        man <<= 1;
        exp--;
      }
      man &= 0x3ff;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

inline uint16_t float_to_half(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint32_t sign = (bits >> 16) & 0x8000;
  int32_t exp = (int32_t)((bits >> 23) & 0xff) - 127 + 15;
  uint32_t man = bits & 0x7fffff;
  if (exp <= 0) return (uint16_t)sign;                  // flush to zero
  if (exp >= 31) return (uint16_t)(sign | 0x7c00);      // inf
  return (uint16_t)(sign | (exp << 10) | (man >> 13));
}

bool read_bytes(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

bool read_cstr(FILE* f, std::string* out, size_t maxlen = 256) {
  out->clear();
  for (size_t i = 0; i < maxlen; i++) {
    int c = std::fgetc(f);
    if (c == EOF) return false;
    if (c == 0) return true;
    out->push_back((char)c);
  }
  return false;
}

// EXR ZIP post-inflate reconstruction: delta-decode then de-interleave.
void zip_reconstruct(std::vector<uint8_t>* data) {
  uint8_t* d = data->data();
  size_t n = data->size();
  for (size_t i = 1; i < n; i++) d[i] = (uint8_t)(d[i - 1] + d[i] - 128);
  std::vector<uint8_t> out(n);
  const uint8_t* t1 = d;
  const uint8_t* t2 = d + (n + 1) / 2;
  for (size_t i = 0; i < n; i++) out[i] = (i & 1) ? *t2++ : *t1++;
  *data = std::move(out);
}

// Inverse (for writing): interleave-split then delta-encode.
void zip_deconstruct(std::vector<uint8_t>* data) {
  uint8_t* d = data->data();
  size_t n = data->size();
  std::vector<uint8_t> out(n);
  uint8_t* t1 = out.data();
  uint8_t* t2 = out.data() + (n + 1) / 2;
  for (size_t i = 0; i < n; i++) {
    if (i & 1) *t2++ = d[i];
    else *t1++ = d[i];
  }
  uint8_t prev = out[0];
  for (size_t i = 1; i < n; i++) {
    uint8_t cur = out[i];
    out[i] = (uint8_t)((int)cur - (int)prev + 128);
    prev = cur;
  }
  *data = std::move(out);
}

bool parse_header(FILE* f, ExrHeader* hdr) {
  uint32_t magic, version;
  if (!read_bytes(f, &magic, 4) || !read_bytes(f, &version, 4)) return false;
  if (magic != kMagic) return false;
  if (version & 0x200) return false;  // tiled: unsupported
  std::string name, type;
  while (true) {
    if (!read_cstr(f, &name)) return false;
    if (name.empty()) break;  // end of header
    if (!read_cstr(f, &type)) return false;
    int32_t size;
    if (!read_bytes(f, &size, 4)) return false;
    long next = std::ftell(f) + size;
    if (name == "channels" && type == "chlist") {
      while (true) {
        std::string cname;
        if (!read_cstr(f, &cname)) return false;
        if (cname.empty()) break;
        Channel ch;
        ch.name = cname;
        int32_t plinear_pad, xs, ys;
        if (!read_bytes(f, &ch.pixel_type, 4)) return false;
        if (!read_bytes(f, &plinear_pad, 4)) return false;
        if (!read_bytes(f, &xs, 4) || !read_bytes(f, &ys, 4)) return false;
        hdr->channels.push_back(ch);
      }
    } else if (name == "compression") {
      if (!read_bytes(f, &hdr->compression, 1)) return false;
    } else if (name == "dataWindow") {
      int32_t box[4];
      if (!read_bytes(f, box, 16)) return false;
      hdr->xmin = box[0];
      hdr->ymin = box[1];
      hdr->xmax = box[2];
      hdr->ymax = box[3];
    } else if (name == "lineOrder") {
      if (!read_bytes(f, &hdr->line_order, 1)) return false;
    }
    std::fseek(f, next, SEEK_SET);
  }
  hdr->data_start = std::ftell(f);
  return true;
}

size_t pixel_size(int32_t t) { return t == 1 ? 2 : 4; }

}  // namespace

// Reads an EXR file. On success fills width/height/n_channels and returns a
// malloc'd float32 buffer of (height, width, n_channels), channel-major per
// pixel in file channel order (alphabetical). Caller frees with free().
// Returns nullptr on failure.
float* exr_read(const char* path, int* width, int* height, int* n_channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  ExrHeader hdr;
  if (!parse_header(f, &hdr) || hdr.channels.empty() ||
      hdr.line_order != 0 ||
      (hdr.compression != 0 && hdr.compression != 2 && hdr.compression != 3)) {
    std::fclose(f);
    return nullptr;
  }
  int W = hdr.xmax - hdr.xmin + 1;
  int H = hdr.ymax - hdr.ymin + 1;
  int C = (int)hdr.channels.size();
  if (W <= 0 || H <= 0 || (long)W * H > (1L << 30)) {
    std::fclose(f);
    return nullptr;
  }
  int lines_per_block = hdr.compression == 3 ? 16 : 1;
  int n_blocks = (H + lines_per_block - 1) / lines_per_block;
  std::vector<uint64_t> offsets(n_blocks);
  if (!read_bytes(f, offsets.data(), 8 * (size_t)n_blocks)) {
    std::fclose(f);
    return nullptr;
  }

  size_t row_bytes = 0;
  for (auto& ch : hdr.channels) row_bytes += (size_t)W * pixel_size(ch.pixel_type);

  float* out = (float*)std::malloc((size_t)W * H * C * sizeof(float));
  if (!out) {
    std::fclose(f);
    return nullptr;
  }
  std::vector<uint8_t> packed, raw;
  for (int b = 0; b < n_blocks; b++) {
    std::fseek(f, (long)offsets[b], SEEK_SET);
    int32_t y, packed_size;
    if (!read_bytes(f, &y, 4) || !read_bytes(f, &packed_size, 4)) goto fail;
    {
      int y0 = y - hdr.ymin;
      int nlines = std::min(lines_per_block, H - y0);
      size_t raw_size = row_bytes * (size_t)nlines;
      packed.resize((size_t)packed_size);
      if (!read_bytes(f, packed.data(), packed.size())) goto fail;
      if (hdr.compression == 0 || (size_t)packed_size >= raw_size) {
        raw = packed;  // stored uncompressed (ZIP stores raw if not smaller)
        raw.resize(raw_size);
      } else {
        raw.resize(raw_size);
        uLongf dest_len = raw_size;
        if (uncompress(raw.data(), &dest_len, packed.data(), packed.size())
                != Z_OK || dest_len != raw_size)
          goto fail;
        zip_reconstruct(&raw);
      }
      // deinterleave: per scanline, channels in file order, W values each
      const uint8_t* p = raw.data();
      for (int line = 0; line < nlines; line++) {
        int yy = y0 + line;
        for (int c = 0; c < C; c++) {
          int32_t t = hdr.channels[c].pixel_type;
          float* dst = out + ((size_t)yy * W) * C + c;
          if (t == 1) {
            const uint16_t* s = (const uint16_t*)p;
            for (int x = 0; x < W; x++, dst += C) *dst = half_to_float(s[x]);
            p += (size_t)W * 2;
          } else if (t == 2) {
            const float* s = (const float*)p;
            for (int x = 0; x < W; x++, dst += C) *dst = s[x];
            p += (size_t)W * 4;
          } else {  // UINT
            const uint32_t* s = (const uint32_t*)p;
            for (int x = 0; x < W; x++, dst += C) *dst = (float)s[x];
            p += (size_t)W * 4;
          }
        }
      }
    }
  }
  std::fclose(f);
  *width = W;
  *height = H;
  *n_channels = C;
  return out;
fail:
  std::free(out);
  std::fclose(f);
  return nullptr;
}

namespace {

void put_bytes(std::vector<uint8_t>* v, const void* p, size_t n) {
  const uint8_t* b = (const uint8_t*)p;
  v->insert(v->end(), b, b + n);
}

void put_str(std::vector<uint8_t>* v, const char* s) {
  put_bytes(v, s, std::strlen(s) + 1);
}

void put_attr(std::vector<uint8_t>* v, const char* name, const char* type,
              const void* data, int32_t size) {
  put_str(v, name);
  put_str(v, type);
  put_bytes(v, &size, 4);
  put_bytes(v, data, size);
}

}  // namespace

// Writes a single-channel float32 EXR ("Z" channel, HALF=0 -> FLOAT data).
// compression: 0=NONE, 3=ZIP. Returns 0 on success.
int exr_write(const char* path, const float* data, int width, int height,
              int compression, int as_half) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::vector<uint8_t> h;
  uint32_t magic = kMagic, version = 2;
  put_bytes(&h, &magic, 4);
  put_bytes(&h, &version, 4);

  std::vector<uint8_t> chl;
  put_str(&chl, "Z");
  int32_t ptype = as_half ? 1 : 2, plin = 0, xs = 1, ys = 1;
  put_bytes(&chl, &ptype, 4);
  put_bytes(&chl, &plin, 4);
  put_bytes(&chl, &xs, 4);
  put_bytes(&chl, &ys, 4);
  chl.push_back(0);
  put_attr(&h, "channels", "chlist", chl.data(), (int32_t)chl.size());

  uint8_t comp = (uint8_t)compression;
  put_attr(&h, "compression", "compression", &comp, 1);
  int32_t box[4] = {0, 0, width - 1, height - 1};
  put_attr(&h, "dataWindow", "box2i", box, 16);
  put_attr(&h, "displayWindow", "box2i", box, 16);
  uint8_t lo = 0;
  put_attr(&h, "lineOrder", "lineOrder", &lo, 1);
  float pa = 1.0f;
  put_attr(&h, "pixelAspectRatio", "float", &pa, 4);
  float swc[2] = {0, 0}, sww = 1.0f;
  put_attr(&h, "screenWindowCenter", "v2f", swc, 8);
  put_attr(&h, "screenWindowWidth", "float", &sww, 4);
  h.push_back(0);  // end of header
  std::fwrite(h.data(), 1, h.size(), f);

  int lines_per_block = compression == 3 ? 16 : 1;
  int n_blocks = (height + lines_per_block - 1) / lines_per_block;
  long table_pos = std::ftell(f);
  std::vector<uint64_t> offsets(n_blocks, 0);
  std::fwrite(offsets.data(), 8, n_blocks, f);  // placeholder

  size_t psz = as_half ? 2 : 4;
  std::vector<uint8_t> raw, packed;
  for (int b = 0; b < n_blocks; b++) {
    offsets[b] = (uint64_t)std::ftell(f);
    int y0 = b * lines_per_block;
    int nlines = std::min(lines_per_block, height - y0);
    raw.resize((size_t)width * nlines * psz);
    uint8_t* p = raw.data();
    for (int line = 0; line < nlines; line++) {
      const float* src = data + (size_t)(y0 + line) * width;
      if (as_half) {
        uint16_t* d = (uint16_t*)p;
        for (int x = 0; x < width; x++) d[x] = float_to_half(src[x]);
      } else {
        std::memcpy(p, src, (size_t)width * 4);
      }
      p += (size_t)width * psz;
    }
    int32_t y = y0, size_out;
    const uint8_t* payload;
    if (compression == 3) {
      std::vector<uint8_t> work = raw;
      zip_deconstruct(&work);
      uLongf bound = compressBound(work.size());
      packed.resize(bound);
      compress2(packed.data(), &bound, work.data(), work.size(), 6);
      if (bound < raw.size()) {
        size_out = (int32_t)bound;
        payload = packed.data();
      } else {
        size_out = (int32_t)raw.size();
        payload = raw.data();
      }
    } else {
      size_out = (int32_t)raw.size();
      payload = raw.data();
    }
    std::fwrite(&y, 4, 1, f);
    std::fwrite(&size_out, 4, 1, f);
    std::fwrite(payload, 1, (size_t)size_out, f);
  }
  std::fseek(f, table_pos, SEEK_SET);
  std::fwrite(offsets.data(), 8, n_blocks, f);
  std::fclose(f);
  return 0;
}

}  // namespace emf
