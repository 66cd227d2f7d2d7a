// Native batch PNG encoder for the sampling/eval hot path.
//
// TPU-native counterpart of the reference's native-ops layer: where the
// reference JIT-compiles CUDA kernels at import (song_sde/op/upfirdn2d.py:10-16),
// this framework's device math is XLA/Pallas and its native code lives on the
// host runtime side -- here, multithreaded PNG encoding of sample batches
// (util.py:147-158 writes 50k PNGs one PIL call at a time).
//
// PNG layout: IHDR + single IDAT (zlib deflate, filter 0 per row) + IEND.
// Links against system zlib. Built at import by psld_tpu/native/__init__.py.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

// Write one chunk: length, type, payload, crc.
bool write_chunk(FILE* f, const char type[4], const uint8_t* payload,
                 uint32_t len) {
  uint8_t hdr[8];
  put_be32(hdr, len);
  memcpy(hdr + 4, type, 4);
  if (fwrite(hdr, 1, 8, f) != 8) return false;
  if (len && fwrite(payload, 1, len, f) != len) return false;
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, reinterpret_cast<const Bytef*>(type), 4);
  if (len) crc = crc32(crc, payload, len);
  uint8_t crcb[4];
  put_be32(crcb, crc);
  return fwrite(crcb, 1, 4, f) == 4;
}

int encode_one(const char* path, const uint8_t* img, int h, int w, int c) {
  if (c != 1 && c != 3 && c != 4) return -2;
  const size_t row = static_cast<size_t>(w) * c;
  // raw scanlines with filter byte 0
  std::vector<uint8_t> raw((row + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (row + 1)] = 0;
    memcpy(&raw[y * (row + 1) + 1], img + y * row, row);
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 1) != Z_OK)
    return -3;

  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  bool ok = fwrite(magic, 1, 8, f) == 8;

  uint8_t ihdr[13];
  put_be32(ihdr, static_cast<uint32_t>(w));
  put_be32(ihdr + 4, static_cast<uint32_t>(h));
  ihdr[8] = 8;                                   // bit depth
  ihdr[9] = (c == 1) ? 0 : (c == 3 ? 2 : 6);     // gray / rgb / rgba
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  ok = ok && write_chunk(f, "IHDR", ihdr, 13);
  ok = ok && write_chunk(f, "IDAT", comp.data(), comp_cap);
  ok = ok && write_chunk(f, "IEND", nullptr, 0);
  fclose(f);
  return ok ? 0 : -4;
}

}  // namespace

extern "C" {

int psld_write_png(const char* path, const uint8_t* img, int h, int w,
                   int c) {
  return encode_one(path, img, h, w, c);
}

// Encode n images (contiguous NHWC uint8) to paths[i] using a thread pool.
// Returns 0 on success, else the first nonzero per-image error code.
int psld_write_png_batch(const char* const* paths, const uint8_t* data,
                         int n, int h, int w, int c, int threads) {
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 4;
  }
  if (threads > n) threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  const size_t stride = static_cast<size_t>(h) * w * c;
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = encode_one(paths[i], data + stride * i, h, w, c);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

}  // extern "C"
