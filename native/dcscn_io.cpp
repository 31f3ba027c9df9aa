// dcscn_io — native data-path kernels for the dcscn_tpu framework.
//
// The reference's data pipeline is pure Python: per-patch BMP encode/decode
// through PIL/imageio (helper/loader.py:235-275, helper/utilty.py:113-130)
// and stride-tricks patchification (helper/utilty.py:286-327), all serial
// inside the train loop. This library provides the batch-store hot paths as
// multithreaded C++: grid patch extraction, BT.601 color conversion, and an
// 8-bit grayscale BMP codec with a batched directory writer/reader (the
// reference's on-disk format is ~150k small BMPs — file I/O dominates).
//
// Exposed as a plain C ABI consumed via ctypes (dcscn_tpu/data/native.py).
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// Patch extraction: uint8 image [H, W] -> [N, win, win] patch grid
// with rows-major patch order ((1 + (H-win)/stride) x (1 + (W-win)/stride)),
// matching ops/patches.get_split_images (reference util:286-307).
// Returns the number of patches written, or -1 on size error.
int64_t extract_patches_u8(const uint8_t* img, int64_t height, int64_t width,
                           int64_t win, int64_t stride, uint8_t* out,
                           int64_t out_capacity) {
  if (height < win || width < win || stride <= 0) return -1;
  const int64_t ny = 1 + (height - win) / stride;
  const int64_t nx = 1 + (width - win) / stride;
  const int64_t n = ny * nx;
  if (n * win * win > out_capacity) return -1;
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < n; ++p) {
    const int64_t py = (p / nx) * stride;
    const int64_t px = (p % nx) * stride;
    uint8_t* dst = out + p * win * win;
    const uint8_t* src = img + py * width + px;
    for (int64_t r = 0; r < win; ++r)
      std::memcpy(dst + r * win, src + r * width, (size_t)win);
  }
  return n;
}

// ---------------------------------------------------------------------
// BT.601 studio-swing RGB -> Y (float32), same coefficients as
// ops/color.py (reference util:142-149).
void rgb_to_y_f32(const uint8_t* rgb, int64_t npix, float* y) {
  const double kr = 65.738 / 256.0, kg = 129.057 / 256.0, kb = 25.064 / 256.0;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = rgb + i * 3;
    y[i] = (float)(p[0] * kr + p[1] * kg + p[2] * kb + 16.0);
  }
}

// ---------------------------------------------------------------------
// Minimal 8-bit grayscale BMP codec (BITMAPINFOHEADER + 256-entry gray
// palette, bottom-up rows, 4-byte row padding) — the format PIL writes for
// mode-L images, which the reference's batch store uses.

static int64_t bmp_gray8_size(int64_t w, int64_t h) {
  const int64_t row = (w + 3) & ~3LL;
  return 14 + 40 + 256 * 4 + row * h;
}

static void put_u16(uint8_t* p, uint32_t v) { p[0] = v & 0xff; p[1] = (v >> 8) & 0xff; }
static void put_u32(uint8_t* p, uint32_t v) {
  p[0] = v & 0xff; p[1] = (v >> 8) & 0xff; p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}
static uint32_t get_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}
static uint16_t get_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

static int64_t encode_bmp_gray8(const uint8_t* img, int64_t w, int64_t h,
                                uint8_t* buf) {
  const int64_t row = (w + 3) & ~3LL;
  const int64_t data_off = 14 + 40 + 256 * 4;
  const int64_t total = data_off + row * h;
  std::memset(buf, 0, (size_t)data_off);
  buf[0] = 'B'; buf[1] = 'M';
  put_u32(buf + 2, (uint32_t)total);
  put_u32(buf + 10, (uint32_t)data_off);
  put_u32(buf + 14, 40);                 // BITMAPINFOHEADER
  put_u32(buf + 18, (uint32_t)w);
  put_u32(buf + 22, (uint32_t)h);
  put_u16(buf + 26, 1);                  // planes
  put_u16(buf + 28, 8);                  // bpp
  put_u32(buf + 34, (uint32_t)(row * h));
  put_u32(buf + 46, 256);                // palette size
  for (int i = 0; i < 256; ++i) {        // gray palette BGRA
    buf[54 + i * 4 + 0] = (uint8_t)i;
    buf[54 + i * 4 + 1] = (uint8_t)i;
    buf[54 + i * 4 + 2] = (uint8_t)i;
    buf[54 + i * 4 + 3] = 0;
  }
  uint8_t* data = buf + data_off;
  std::memset(data, 0, (size_t)(row * h));
  for (int64_t r = 0; r < h; ++r)        // bottom-up
    std::memcpy(data + (h - 1 - r) * row, img + r * w, (size_t)w);
  return total;
}

// Decode an 8-bit (palette) or 24-bit BMP into a uint8 gray buffer.
// For 24-bit input, channels must match (use decode size query first).
// Returns 0 on success.
static int decode_bmp_gray8(const uint8_t* buf, int64_t len, uint8_t* out,
                            int64_t out_capacity, int64_t* out_w, int64_t* out_h) {
  if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return -1;
  const uint32_t data_off = get_u32(buf + 10);
  const int64_t w = (int32_t)get_u32(buf + 18);
  const int64_t h = (int32_t)get_u32(buf + 22);
  const uint16_t bpp = get_u16(buf + 28);
  if (w <= 0 || h <= 0) return -2;
  *out_w = w; *out_h = h;
  if (out == nullptr) return 0;  // size query
  if (w * h > out_capacity) return -3;
  // bounds: a truncated/corrupt file must fail cleanly, not read OOB
  if (bpp == 8) {
    const int64_t row = (w + 3) & ~3LL;
    if ((int64_t)data_off < 54 + 256 * 4 ||
        (int64_t)data_off + row * h > len) return -5;
    // palette may remap; apply palette's blue channel (gray palettes: b==g==r)
    // (palette location: our own encoder writes a 40-byte info header, so
    // the palette sits at byte 54; reject other header sizes)
    if (get_u32(buf + 14) != 40) return -6;
    const uint8_t* pal = buf + 54;
    for (int64_t r = 0; r < h; ++r) {
      const uint8_t* src = buf + data_off + (h - 1 - r) * row;
      uint8_t* dst = out + r * w;
      for (int64_t c = 0; c < w; ++c) dst[c] = pal[src[c] * 4];
    }
    return 0;
  }
  if (bpp == 24) {
    const int64_t row = (w * 3 + 3) & ~3LL;
    if ((int64_t)data_off < 54 || (int64_t)data_off + row * h > len)
      return -5;
    for (int64_t r = 0; r < h; ++r) {
      const uint8_t* src = buf + data_off + (h - 1 - r) * row;
      uint8_t* dst = out + r * w;
      for (int64_t c = 0; c < w; ++c) dst[c] = src[c * 3];  // B==G==R for gray
    }
    return 0;
  }
  return -4;
}

int write_bmp_gray8(const char* path, const uint8_t* img, int64_t w, int64_t h) {
  std::vector<uint8_t> buf((size_t)bmp_gray8_size(w, h));
  const int64_t n = encode_bmp_gray8(img, w, h, buf.data());
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const size_t wrote = std::fwrite(buf.data(), 1, (size_t)n, f);
  std::fclose(f);
  return wrote == (size_t)n ? 0 : -2;
}

int read_bmp_gray8(const char* path, uint8_t* out, int64_t out_capacity,
                   int64_t* out_w, int64_t* out_h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)len);
  if (std::fread(buf.data(), 1, (size_t)len, f) != (size_t)len) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);
  return decode_bmp_gray8(buf.data(), len, out, out_capacity, out_w, out_h);
}

// Batched store writer: patches [N, win, win] uint8 -> dir/%06d.bmp,
// parallel across files. Returns number written.
int64_t write_bmp_batch(const char* dir, const uint8_t* patches, int64_t n,
                        int64_t win, int64_t start_index) {
  int64_t ok = 0;
#pragma omp parallel for schedule(dynamic, 64) reduction(+ : ok)
  for (int64_t i = 0; i < n; ++i) {
    char path[4096];
    std::snprintf(path, sizeof(path), "%s/%06lld.bmp", dir,
                  (long long)(start_index + i));
    if (write_bmp_gray8(path, patches + i * win * win, win, win) == 0) ok += 1;
  }
  return ok;
}

// Batched store reader: dir/%06d.bmp x n -> out [N, win, win] uint8.
int64_t read_bmp_batch(const char* dir, uint8_t* out, int64_t n, int64_t win) {
  int64_t ok = 0;
#pragma omp parallel for schedule(dynamic, 64) reduction(+ : ok)
  for (int64_t i = 0; i < n; ++i) {
    char path[4096];
    std::snprintf(path, sizeof(path), "%s/%06lld.bmp", dir, (long long)i);
    int64_t w = 0, h = 0;
    if (read_bmp_gray8(path, out + i * win * win, win * win, &w, &h) == 0 &&
        w == win && h == win)
      ok += 1;
  }
  return ok;
}

int num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
