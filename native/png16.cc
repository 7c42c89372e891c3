// Native 16-bit grayscale PNG encode/decode for the depth artifact store.
//
// The depth stage's host-side bottleneck is PNG compression of the
// uint16 depth_%06d.png sequence (reference writes via cv2.imwrite,
// depth.py:406). This is a dependency-free implementation over zlib with
// a C ABI consumed through ctypes (video3d_tpu/core/_native.py):
//
//   * encoder: big-endian 16-bit grayscale, Paeth or Up/Sub filtering
//     chosen per row by minimum-absolute-residual heuristic, zlib level
//     configurable (default 1: depth maps are smooth; cheap filters +
//     fast deflate beat slow deflate on throughput at equal size);
//   * decoder: handles the subset we write (8/16-bit grayscale, all five
//     PNG filters), enough to read our own artifacts back;
//   * batch API with a persistent pthread pool so a whole device batch
//     encodes in parallel without holding Python's GIL.
//
// Built by native/build.sh into libv3dpng.so; the Python side falls back
// to cv2 when the library is absent.

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

uint32_t crc_table_[256];
bool crc_init_done = [] {
  for (uint32_t n = 0; n < 256; n++) {
    uint32_t c = n;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
    crc_table_[n] = c;
  }
  return true;
}();

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  uint32_t c = crc ^ 0xffffffffu;
  for (size_t i = 0; i < len; i++) c = crc_table_[(c ^ buf[i]) & 0xff] ^ (c >> 8);
  return c ^ 0xffffffffu;
}

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(v >> 24); out.push_back(v >> 16); out.push_back(v >> 8); out.push_back(v);
}

void write_chunk(std::vector<uint8_t>& out, const char type[4],
                 const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32_update(0, out.data() + start, len + 4);
  put_be32(out, crc);
}

uint8_t paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

// Filter one raw row (big-endian bytes) with the given PNG filter id.
void filter_row(int filter, const uint8_t* row, const uint8_t* prev,
                size_t rowbytes, int bpp, uint8_t* out) {
  switch (filter) {
    case 0:
      memcpy(out, row, rowbytes);
      break;
    case 1:  // Sub
      for (size_t i = 0; i < rowbytes; i++)
        out[i] = row[i] - (i >= static_cast<size_t>(bpp) ? row[i - bpp] : 0);
      break;
    case 2:  // Up
      for (size_t i = 0; i < rowbytes; i++)
        out[i] = row[i] - (prev ? prev[i] : 0);
      break;
    case 4:  // Paeth
      for (size_t i = 0; i < rowbytes; i++) {
        int a = i >= static_cast<size_t>(bpp) ? row[i - bpp] : 0;
        int b = prev ? prev[i] : 0;
        int c = (prev && i >= static_cast<size_t>(bpp)) ? prev[i - bpp] : 0;
        out[i] = row[i] - paeth(a, b, c);
      }
      break;
    default:
      memcpy(out, row, rowbytes);
  }
}

uint64_t residual_cost(const uint8_t* buf, size_t n) {
  // strided sample: the filter choice is insensitive to exact sums and
  // full-row trials triple the filtering cost on single-core hosts
  uint64_t s = 0;
  for (size_t i = 0; i < n; i += 7) {
    int8_t v = static_cast<int8_t>(buf[i]);
    s += v < 0 ? -v : v;
  }
  return s;
}

// Encode a uint16 grayscale image to an in-memory PNG. Returns malloc'd
// buffer via *out (caller frees with v3d_png_free), size via return value.
size_t encode16(const uint16_t* img, int h, int w, int zlevel,
                uint8_t** out_buf) {
  const size_t rowbytes = static_cast<size_t>(w) * 2;
  const int bpp = 2;

  // big-endian conversion + per-row filter selection
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (rowbytes + 1));
  std::vector<uint8_t> be(static_cast<size_t>(h) * rowbytes);
  for (int y = 0; y < h; y++) {
    uint8_t* dst = be.data() + static_cast<size_t>(y) * rowbytes;
    const uint16_t* src = img + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; x++) {
      dst[2 * x] = src[x] >> 8;
      dst[2 * x + 1] = src[x] & 0xff;
    }
  }
  for (int y = 0; y < h; y++) {
    const uint8_t* row = be.data() + static_cast<size_t>(y) * rowbytes;
    const uint8_t* prev =
        y ? be.data() + static_cast<size_t>(y - 1) * rowbytes : nullptr;
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (rowbytes + 1);
    // choose the filter from strided samples without materializing
    // trial rows (full-row trials triple the filter cost; the choice is
    // insensitive to exact sums)
    uint64_t cost_up = 0, cost_sub = 0, cost_paeth = 0;
    for (size_t i = 0; i < rowbytes; i += 7) {
      int a = i >= static_cast<size_t>(bpp) ? row[i - bpp] : 0;
      int b = prev ? prev[i] : 0;
      int c = (prev && i >= static_cast<size_t>(bpp)) ? prev[i - bpp] : 0;
      int8_t r_up = static_cast<int8_t>(row[i] - b);
      int8_t r_sub = static_cast<int8_t>(row[i] - a);
      int8_t r_pa = static_cast<int8_t>(row[i] - paeth(a, b, c));
      cost_up += r_up < 0 ? -r_up : r_up;
      cost_sub += r_sub < 0 ? -r_sub : r_sub;
      cost_paeth += r_pa < 0 ? -r_pa : r_pa;
    }
    int best_f = 2;
    uint64_t best_cost = cost_up;
    if (cost_sub < best_cost) { best_cost = cost_sub; best_f = 1; }
    if (cost_paeth < best_cost) { best_cost = cost_paeth; best_f = 4; }
    dst[0] = static_cast<uint8_t>(best_f);
    filter_row(best_f, row, prev, rowbytes, bpp, dst + 1);
  }

  // zlib deflate
  uLongf bound = compressBound(raw.size());
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(), raw.size(), zlevel) != Z_OK)
    return 0;

  std::vector<uint8_t> png;
  png.reserve(bound + 128);
  png.insert(png.end(), kSig, kSig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 16;  // bit depth
  ihdr[9] = 0;   // grayscale
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  write_chunk(png, "IHDR", ihdr, 13);
  write_chunk(png, "IDAT", z.data(), bound);
  write_chunk(png, "IEND", nullptr, 0);

  uint8_t* buf = static_cast<uint8_t*>(malloc(png.size()));
  memcpy(buf, png.data(), png.size());
  *out_buf = buf;
  return png.size();
}

uint32_t get_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Minimal decoder for the grayscale PNGs we write. Returns 0 on success.
int decode16(const uint8_t* png, size_t len, uint16_t* out, int* out_h,
             int* out_w, int max_pixels) {
  if (len < 8 || memcmp(png, kSig, 8) != 0) return -1;
  size_t pos = 8;
  int w = 0, h = 0, depth = 0, color = -1;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = get_be32(png + pos);
    const char* type = reinterpret_cast<const char*>(png + pos + 4);
    const uint8_t* data = png + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!memcmp(type, "IHDR", 4)) {
      w = get_be32(data); h = get_be32(data + 4);
      depth = data[8]; color = data[9];
      if (data[12] != 0) return -3;  // no interlace support
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (color != 0 || (depth != 8 && depth != 16)) return -4;
  // pixel-count check in 64-bit: crafted IHDR dims (e.g. 65536x65537)
  // overflow 32-bit w*h to a small value and bypass the cap
  if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
      static_cast<int64_t>(w) * static_cast<int64_t>(h) >
          static_cast<int64_t>(max_pixels))
    return -5;
  const int bpp = depth / 8;
  const size_t rowbytes = static_cast<size_t>(w) * bpp;
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (rowbytes + 1));
  uLongf rawlen = raw.size();
  if (uncompress(raw.data(), &rawlen, idat.data(), idat.size()) != Z_OK)
    return -6;

  std::vector<uint8_t> prev(rowbytes, 0), cur(rowbytes);
  for (int y = 0; y < h; y++) {
    const uint8_t* src = raw.data() + static_cast<size_t>(y) * (rowbytes + 1);
    int f = src[0];
    const uint8_t* row = src + 1;
    for (size_t i = 0; i < rowbytes; i++) {
      int a = i >= static_cast<size_t>(bpp) ? cur[i - bpp] : 0;
      int b = prev[i];
      int c = i >= static_cast<size_t>(bpp) ? prev[i - bpp] : 0;
      int recon;
      switch (f) {
        case 0: recon = row[i]; break;
        case 1: recon = row[i] + a; break;
        case 2: recon = row[i] + b; break;
        case 3: recon = row[i] + ((a + b) >> 1); break;
        case 4: recon = row[i] + paeth(a, b, c); break;
        default: return -7;
      }
      cur[i] = static_cast<uint8_t>(recon);
    }
    uint16_t* dst = out + static_cast<size_t>(y) * w;
    if (depth == 16) {
      for (int x = 0; x < w; x++)
        dst[x] = (uint16_t(cur[2 * x]) << 8) | cur[2 * x + 1];
    } else {
      for (int x = 0; x < w; x++) dst[x] = uint16_t(cur[x]) << 8 | cur[x];
    }
    std::swap(prev, cur);
  }
  *out_h = h; *out_w = w;
  return 0;
}

// ---------------------------------------------------------------------
// persistent thread pool for batch encode-to-file
// ---------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* pool() {
  static Pool p(std::max(2u, std::thread::hardware_concurrency() / 2));
  return &p;
}

}  // namespace

extern "C" {

size_t v3d_png16_encode(const uint16_t* img, int h, int w, int zlevel,
                        uint8_t** out_buf) {
  return encode16(img, h, w, zlevel, out_buf);
}

void v3d_png_free(uint8_t* buf) { free(buf); }

int v3d_png16_decode(const uint8_t* png, size_t len, uint16_t* out,
                     int* out_h, int* out_w, int max_pixels) {
  return decode16(png, len, out, out_h, out_w, max_pixels);
}

// Encode `n` images (contiguous batch, each h*w uint16) and write them to
// the given NUL-separated file paths in parallel. Returns number of
// failures; blocks until all files are on disk.
int v3d_png16_encode_batch_to_files(const uint16_t* batch, int n, int h,
                                    int w, int zlevel, const char* paths) {
  // Completion state lives on the heap, shared by workers and waiter:
  // with stack-allocated mu/cv the waiter can observe done==n and return
  // while the last worker is still about to touch the (destroyed) cv.
  struct BatchState {
    std::atomic<int> failures{0};
    int done = 0;
    std::mutex mu;
    std::condition_variable cv;
  };
  auto st = std::make_shared<BatchState>();
  const char* p = paths;
  for (int i = 0; i < n; i++) {
    const char* path = p;
    p += strlen(p) + 1;
    const uint16_t* img = batch + static_cast<size_t>(i) * h * w;
    pool()->submit([=] {
      uint8_t* buf = nullptr;
      size_t len = encode16(img, h, w, zlevel, &buf);
      bool ok = len > 0;
      if (ok) {
        FILE* f = fopen(path, "wb");
        ok = f && fwrite(buf, 1, len, f) == len;
        if (f) fclose(f);
      }
      if (buf) free(buf);
      if (!ok) st->failures.fetch_add(1);
      {
        std::lock_guard<std::mutex> lk(st->mu);
        st->done++;
        st->cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(st->mu);
  st->cv.wait(lk, [&] { return st->done == n; });
  return st->failures.load();
}

}  // extern "C"
