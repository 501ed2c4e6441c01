// gslam_native: native runtime pieces for the TPU SLAM framework.
//
// The reference framework's entire runtime is C++ (SURVEY.md section 2);
// in the TPU re-design the compute path is XLA but the host data path
// stays native: this library provides
//   * self-contained image decoders (PGM/PPM binary, BMP 24/32, PNG
//     gray8/gray16/RGB8 via zlib inflate + unfilter), no OpenCV/PIL
//     dependency on the hot path;
//   * grayscale-f32 conversion (BT.601) done during decode;
//   * a multi-threaded readahead loader: worker threads decode a file
//     list ahead of the consumer into a bounded ring (the reference's
//     DatasetPlayer+imdecode pipeline, minus the global interpreter
//     lock).
// C ABI for ctypes binding (gslam_tpu/datasets/native_loader.py).
//
// Build: g++ -O3 -march=native -shared -fPIC gslam_native.cpp -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, ch = 0, bitdepth = 8;
  std::vector<uint8_t> data;  // raw interleaved, native bitdepth
};

// ---------------------------------------------------------------- helpers
bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  const std::streamsize n = f.tellg();
  out->resize(static_cast<size_t>(n));
  f.seekg(0);
  return static_cast<bool>(f.read(reinterpret_cast<char*>(out->data()), n));
}

// ---------------------------------------------------------------- PNM
bool decode_pnm(const std::vector<uint8_t>& buf, Image* img) {
  if (buf.size() < 10 || buf[0] != 'P') return false;
  const char kind = static_cast<char>(buf[1]);
  if (kind != '5' && kind != '6') return false;  // binary gray / RGB
  size_t pos = 2;
  int fields[3] = {0, 0, 0};
  for (int fi = 0; fi < 3; ++fi) {
    // skip whitespace + comments
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') ++pos;
      } else if (isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
    int v = 0;
    while (pos < buf.size() && isdigit(buf[pos])) {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
    }
    fields[fi] = v;
  }
  ++pos;  // single whitespace after maxval
  img->w = fields[0];
  img->h = fields[1];
  img->ch = (kind == '5') ? 1 : 3;
  img->bitdepth = fields[2] > 255 ? 16 : 8;
  const size_t need = static_cast<size_t>(img->w) * img->h * img->ch *
                      (img->bitdepth / 8);
  if (buf.size() - pos < need) return false;
  img->data.assign(buf.begin() + pos, buf.begin() + pos + need);
  return true;
}

// ---------------------------------------------------------------- BMP
bool decode_bmp(const std::vector<uint8_t>& buf, Image* img) {
  if (buf.size() < 54 || buf[0] != 'B' || buf[1] != 'M') return false;
  auto rd32 = [&](size_t o) {
    return static_cast<uint32_t>(buf[o]) | (buf[o + 1] << 8) |
           (buf[o + 2] << 16) | (buf[o + 3] << 24);
  };
  auto rd16 = [&](size_t o) {
    return static_cast<uint16_t>(buf[o] | (buf[o + 1] << 8));
  };
  const uint32_t off = rd32(10);
  const int32_t w = static_cast<int32_t>(rd32(18));
  const int32_t h = static_cast<int32_t>(rd32(22));
  const uint16_t bpp = rd16(28);
  if (rd32(30) != 0) return false;  // compressed unsupported
  if (bpp != 24 && bpp != 32) return false;
  const bool flip = h > 0;
  const int ah = h > 0 ? h : -h;
  const int sb = bpp / 8;
  const size_t stride = (static_cast<size_t>(w) * sb + 3) & ~size_t{3};
  img->w = w;
  img->h = ah;
  img->ch = 3;
  img->bitdepth = 8;
  img->data.resize(static_cast<size_t>(w) * ah * 3);
  for (int y = 0; y < ah; ++y) {
    const int sy = flip ? ah - 1 - y : y;
    const uint8_t* row = buf.data() + off + stride * sy;
    uint8_t* dst = img->data.data() + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      dst[3 * x + 0] = row[sb * x + 2];  // BGR -> RGB
      dst[3 * x + 1] = row[sb * x + 1];
      dst[3 * x + 2] = row[sb * x + 0];
    }
  }
  return true;
}

// ---------------------------------------------------------------- PNG
int paeth(int a, int b, int c) {
  const int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const std::vector<uint8_t>& buf, Image* img) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (buf.size() < 8 || memcmp(buf.data(), sig, 8) != 0) return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  int w = 0, h = 0, depth = 0, color = 0;
  auto rd32 = [&](size_t o) {
    return (static_cast<uint32_t>(buf[o]) << 24) | (buf[o + 1] << 16) |
           (buf[o + 2] << 8) | buf[o + 3];
  };
  while (pos + 8 <= buf.size()) {
    const uint32_t len = rd32(pos);
    const char* type = reinterpret_cast<const char*>(buf.data() + pos + 4);
    const size_t dpos = pos + 8;
    if (dpos + len > buf.size()) return false;
    if (!memcmp(type, "IHDR", 4)) {
      w = static_cast<int>(rd32(dpos));
      h = static_cast<int>(rd32(dpos + 4));
      depth = buf[dpos + 8];
      color = buf[dpos + 9];
      if (buf[dpos + 10] != 0 || buf[dpos + 11] != 0 || buf[dpos + 12] != 0)
        return false;  // only deflate / no interlace
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), buf.begin() + dpos, buf.begin() + dpos + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos = dpos + len + 4;  // skip CRC
  }
  int ch;
  if (color == 0) ch = 1;        // gray
  else if (color == 2) ch = 3;   // RGB
  else if (color == 4) ch = 2;   // gray+alpha
  else if (color == 6) ch = 4;   // RGBA
  else return false;
  if (depth != 8 && depth != 16) return false;

  const int bypp = ch * depth / 8;  // bytes per pixel
  const size_t stride = static_cast<size_t>(w) * bypp;
  std::vector<uint8_t> raw(( stride + 1) * h);
  uLongf rawlen = raw.size();
  if (uncompress(raw.data(), &rawlen, idat.data(), idat.size()) != Z_OK)
    return false;

  img->w = w;
  img->h = h;
  img->ch = ch;
  img->bitdepth = depth;
  img->data.resize(stride * h);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < h; ++y) {
    const uint8_t f = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = img->data.data() + stride * y;
    for (size_t x = 0; x < stride; ++x) {
      const int a = x >= static_cast<size_t>(bypp) ? dst[x - bypp] : 0;
      const int b = prev[x];
      const int c = x >= static_cast<size_t>(bypp) ? prev[x - bypp] : 0;
      int v = src[x];
      switch (f) {
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: break;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
    memcpy(prev.data(), dst, stride);
  }
  return true;
}

bool decode_any(const std::vector<uint8_t>& buf, Image* img) {
  return decode_png(buf, img) || decode_pnm(buf, img) ||
         decode_bmp(buf, img);
}

// gray f32 conversion (BT.601; 16-bit scaled to [0,1])
void to_gray_f32(const Image& img, float* out) {
  const size_t n = static_cast<size_t>(img.w) * img.h;
  if (img.bitdepth == 16) {
    // PNG 16-bit is big-endian
    const float s = 1.0f / 65535.0f;
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = img.data.data() + i * 2 * img.ch;
      uint32_t acc = 0;
      // first channel only for 16-bit (depth images)
      acc = (static_cast<uint32_t>(p[0]) << 8) | p[1];
      out[i] = acc * s;
    }
    return;
  }
  const float s = 1.0f / 255.0f;
  if (img.ch == 1) {
    for (size_t i = 0; i < n; ++i) out[i] = img.data[i] * s;
  } else {
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = img.data.data() + i * img.ch;
      out[i] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) * s;
    }
  }
}

// ---------------------------------------------------------------- loader
struct Slot {
  int64_t index = -1;
  Image img;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> paths;
  size_t ring = 8;
  std::deque<Slot> queue;   // decoded, ordered by index
  std::atomic<int64_t> next_to_decode{0};
  int64_t next_to_emit = 0;
  std::mutex mu;
  std::condition_variable cv_room, cv_data;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      if (stop.load()) return;
      const int64_t i = next_to_decode.fetch_add(1);
      if (i >= static_cast<int64_t>(paths.size())) return;
      Slot s;
      s.index = i;
      std::vector<uint8_t> buf;
      s.ok = read_file(paths[i], &buf) && decode_any(buf, &s.img);
      std::unique_lock<std::mutex> lk(mu);
      cv_room.wait(lk, [&] {
        return stop.load() || queue.size() < ring + workers.size();
      });
      if (stop.load()) return;
      queue.push_back(std::move(s));
      cv_data.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// one-shot decode: returns 1 on success; fills w/h/ch. Call with
// out=null to query dims, then again with a buffer (decode cached? no —
// callers use gslam_decode_gray below for the common path).
int gslam_decode_gray_f32(const char* path, float* out, int64_t capacity,
                          int* w, int* h) {
  std::vector<uint8_t> buf;
  Image img;
  if (!read_file(path, &buf) || !decode_any(buf, &img)) return 0;
  *w = img.w;
  *h = img.h;
  if (out == nullptr) return 1;
  if (static_cast<int64_t>(img.w) * img.h > capacity) return 0;
  to_gray_f32(img, out);
  return 1;
}

int gslam_decode_rgb_u8(const char* path, uint8_t* out, int64_t capacity,
                        int* w, int* h, int* ch) {
  std::vector<uint8_t> buf;
  Image img;
  if (!read_file(path, &buf) || !decode_any(buf, &img)) return 0;
  *w = img.w;
  *h = img.h;
  *ch = img.ch;
  if (out == nullptr) return 1;
  const int64_t need =
      static_cast<int64_t>(img.w) * img.h * img.ch * (img.bitdepth / 8);
  if (need > capacity) return 0;
  memcpy(out, img.data.data(), need);
  return 1;
}

void* gslam_loader_create(const char** paths, int64_t n, int n_threads,
                          int ring) {
  auto* ld = new Loader();
  ld->paths.assign(paths, paths + n);
  ld->ring = ring > 0 ? ring : 8;
  const int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

// Blocks until the next-in-order frame is decoded. Returns 1 ok,
// 0 decode failure for this frame, -1 end of sequence.
int gslam_loader_next(void* handle, float* out, int64_t capacity, int* w,
                      int* h) {
  auto* ld = static_cast<Loader*>(handle);
  if (ld->next_to_emit >= static_cast<int64_t>(ld->paths.size())) return -1;
  std::unique_lock<std::mutex> lk(ld->mu);
  for (;;) {
    for (auto it = ld->queue.begin(); it != ld->queue.end(); ++it) {
      if (it->index == ld->next_to_emit) {
        Slot s = std::move(*it);
        ld->queue.erase(it);
        ld->cv_room.notify_all();
        ld->next_to_emit++;
        lk.unlock();
        if (!s.ok) return 0;
        *w = s.img.w;
        *h = s.img.h;
        if (static_cast<int64_t>(s.img.w) * s.img.h > capacity) return 0;
        to_gray_f32(s.img, out);
        return 1;
      }
    }
    ld->cv_data.wait(lk);
  }
}

void gslam_loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  ld->stop.store(true);
  ld->cv_room.notify_all();
  ld->cv_data.notify_all();
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
