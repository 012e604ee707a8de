// Native host-side image runtime for ray_rust_tpu.
//
// TPU-native equivalent of the reference's native image pipeline: the Rust
// code leans on the `image` crate for PNG encode/save (src/main.rs:340,
// src/webserver.rs:275-287) and decodes textures from disk
// (src/render.rs:215). Python/PIL covers decode fine (it is not on the hot
// path), but frame *output* is: the animation driver (src/render.rs:971-983)
// and the webserver emit a PNG per frame/request, and a Python encoder would
// serialize behind the GIL while the TPU sits idle. This library provides:
//
//   * rrt_png_encode  — PNG (RGB8) encoder over zlib, with PNG's paeth/sub/up
//     row filters chosen per row by minimum absolute-delta heuristic (the
//     same heuristic libpng's PNG_FILTER_HEURISTIC_MSD family uses).
//   * rrt_writer_*    — a pthread frame-writer pool: submit (index, buffer)
//     and the pool encodes + writes "<prefix><i>.png" off the render thread,
//     overlapping PNG IO with TPU compute — the role the reference's
//     scanline worker threads + mpsc channel play for its CPU renderer
//     (src/render.rs:836-898), re-cast for the part of OUR pipeline that is
//     still host-bound.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -shared -fPIC png_io.cpp -o libpng_io.so -lz -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_be32(out, crc);
}

// Per-row filter selection: try None/Sub/Up/Average/Paeth, keep the filter
// with the smallest sum of absolute signed deltas (libpng's default
// minimum-sum-of-absolute-differences heuristic).
uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
  int p = int(a) + int(b) - int(c);
  int pa = abs(p - int(a)), pb = abs(p - int(b)), pc = abs(p - int(c));
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

uint64_t filter_row(const uint8_t* row, const uint8_t* prev, int stride,
                    int bpp, uint8_t type, uint8_t* out) {
  uint64_t score = 0;
  for (int i = 0; i < stride; i++) {
    uint8_t x = row[i];
    uint8_t a = i >= bpp ? row[i - bpp] : 0;
    uint8_t b = prev ? prev[i] : 0;
    uint8_t c = (prev && i >= bpp) ? prev[i - bpp] : 0;
    uint8_t v;
    switch (type) {
      case 0: v = x; break;
      case 1: v = uint8_t(x - a); break;
      case 2: v = uint8_t(x - b); break;
      case 3: v = uint8_t(x - ((int(a) + int(b)) >> 1)); break;
      default: v = uint8_t(x - paeth(a, b, c)); break;
    }
    out[i] = v;
    score += v < 128 ? v : 256 - v;  // |signed delta|
  }
  return score;
}

}  // namespace

extern "C" {

// Encode an (h, w, 3) RGB8 buffer as a PNG byte stream. Returns a malloc'd
// buffer in *out (caller frees via rrt_free) and its length, or -1 on error.
// level: zlib compression level (1 fast .. 9 small; 6 = zlib default).
int rrt_png_encode(const uint8_t* rgb, int w, int h, int level,
                   uint8_t** out, size_t* out_len) {
  if (!rgb || w <= 0 || h <= 0 || !out || !out_len) return -1;
  const int bpp = 3;
  const int stride = w * bpp;

  // Filtered scanlines: 1 filter byte + stride per row.
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  std::vector<uint8_t> trial(stride);
  for (int y = 0; y < h; y++) {
    const uint8_t* row = rgb + size_t(y) * stride;
    const uint8_t* prev = y ? rgb + size_t(y - 1) * stride : nullptr;
    uint8_t* dst = raw.data() + size_t(y) * (stride + 1);
    uint64_t best = UINT64_MAX;
    for (uint8_t t = 0; t < 5; t++) {
      uint64_t s = filter_row(row, prev, stride, bpp, t, trial.data());
      if (s < best) {
        best = s;
        dst[0] = t;
        memcpy(dst + 1, trial.data(), stride);
      }
    }
  }

  uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> zbuf(zcap);
  if (compress2(zbuf.data(), &zcap, raw.data(),
                static_cast<uLong>(raw.size()), level) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  png.reserve(zcap + 128);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", zbuf.data(), zcap);
  put_chunk(png, "IEND", nullptr, 0);

  uint8_t* buf = static_cast<uint8_t*>(malloc(png.size()));
  if (!buf) return -1;
  memcpy(buf, png.data(), png.size());
  *out = buf;
  *out_len = png.size();
  return 0;
}

int rrt_png_write(const char* path, const uint8_t* rgb, int w, int h,
                  int level) {
  uint8_t* buf = nullptr;
  size_t len = 0;
  if (rrt_png_encode(rgb, w, h, level, &buf, &len) != 0) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) { free(buf); return -1; }
  size_t wrote = fwrite(buf, 1, len, f);
  fclose(f);
  free(buf);
  return wrote == len ? 0 : -1;
}

void rrt_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------------------
// Frame-writer pool: encode + write PNG frames off the render thread.
// ---------------------------------------------------------------------------

struct Frame {
  std::string path;
  std::vector<uint8_t> rgb;
  int w, h, level;
};

struct Writer {
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> threads;
  bool stop = false;
  int errors = 0;

  explicit Writer(int n_threads) {
    for (int i = 0; i < n_threads; i++) {
      threads.emplace_back([this] { run(); });
    }
  }

  void run() {
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (queue.empty()) {
          if (stop) return;
          continue;
        }
        f = std::move(queue.front());
        queue.pop_front();
      }
      int rc = rrt_png_write(f.path.c_str(), f.rgb.data(), f.w, f.h, f.level);
      if (rc != 0) {
        std::lock_guard<std::mutex> lk(mu);
        errors++;
      }
      cv.notify_all();
    }
  }

  void submit(const char* path, const uint8_t* rgb, int w, int h, int level) {
    Frame f;
    f.path = path;
    f.rgb.assign(rgb, rgb + size_t(w) * h * 3);
    f.w = w; f.h = h; f.level = level;
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.push_back(std::move(f));
    }
    cv.notify_one();
  }

  int drain() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return queue.empty(); });
    return errors;
  }

  ~Writer() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : threads) t.join();
  }
};

void* rrt_writer_create(int n_threads) {
  if (n_threads < 1) n_threads = 1;
  return new Writer(n_threads);
}

void rrt_writer_submit(void* wptr, const char* path, const uint8_t* rgb,
                       int w, int h, int level) {
  static_cast<Writer*>(wptr)->submit(path, rgb, w, h, level);
}

// Blocks until the queue is empty; returns the number of failed writes so far.
int rrt_writer_drain(void* wptr) { return static_cast<Writer*>(wptr)->drain(); }

void rrt_writer_destroy(void* wptr) { delete static_cast<Writer*>(wptr); }

}  // extern "C"
