// Native data-loading runtime for the TPU VIO framework.
//
// The reference's host runtime is C++ (MeasurementProcessor CSV/image
// ingestion, src/utility/measurement_processor.cpp, plus the worker-side
// ring buffer, web/js/vio-worker.js:72-165). This library provides the
// TPU-host equivalents:
//   * fast EuRoC CSV parsing (IMU + image index) with malformed-line
//     skipping and filename sanitization;
//   * grayscale image decoding (8-bit PNG via zlib inflate + defilter, and
//     binary PGM) without an OpenCV dependency;
//   * a prefetching image pipeline: a background decoder thread keeps a
//     bounded ring of decoded frames ahead of the consumer, overlapping
//     disk/decode latency with TPU compute.
//
// Exposed through a plain C API consumed via ctypes
// (mobile_slam_tpu/io/native_loader.py).

#include <zlib.h>

#include <atomic>
#include <cctype>
#include <cmath>
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

// ---------------------------------------------------------------------------
// PNG (8-bit grayscale / RGB / RGBA -> gray) decoding
// ---------------------------------------------------------------------------

struct Image {
  int width = 0;
  int height = 0;
  std::vector<uint8_t> gray;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  std::vector<uint8_t> buf(1 << 18);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(),
               buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

bool decode_png(const std::vector<uint8_t>& data, Image* img) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (data.size() < 8 || std::memcmp(data.data(), sig, 8) != 0) return false;

  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    if (pos + 12 + len > data.size()) return false;
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const uint8_t* body = &data[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;
      w = be32(body);
      h = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || bit_depth != 8 || interlace != 0) return false;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return false;        // palette unsupported
  }

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;
  const size_t stride = size_t(w) * channels;
  if (raw.size() < (stride + 1) * h) return false;

  img->width = int(w);
  img->height = int(h);
  img->gray.resize(size_t(w) * h);
  std::vector<uint8_t> prev(stride, 0), cur(stride);
  for (uint32_t y = 0; y < h; y++) {
    const uint8_t* row = &raw[(stride + 1) * y];
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= size_t(channels) ? cur[x - channels] : 0;
      int b = prev[x];
      int c = x >= size_t(channels) ? prev[x - channels] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      cur[x] = uint8_t(v);
    }
    uint8_t* dst = &img->gray[size_t(w) * y];
    if (channels == 1) {
      std::memcpy(dst, cur.data(), w);
    } else {
      for (uint32_t x = 0; x < w; x++) {
        const uint8_t* px = &cur[size_t(x) * channels];
        if (channels >= 3) {
          // BT.601 luma, integer arithmetic.
          dst[x] = uint8_t((299 * px[0] + 587 * px[1] + 114 * px[2]) / 1000);
        } else {
          dst[x] = px[0];  // gray+alpha
        }
      }
    }
    std::swap(prev, cur);
  }
  return true;
}

bool decode_pgm(const std::vector<uint8_t>& data, Image* img) {
  if (data.size() < 10 || data[0] != 'P' || data[1] != '5') return false;
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < data.size()) {
      if (data[pos] == '#') {
        while (pos < data.size() && data[pos] != '\n') pos++;
      } else if (std::isspace(data[pos])) {
        pos++;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    while (pos < data.size() && std::isdigit(data[pos]))
      v = v * 10 + (data[pos++] - '0');
    return v;
  };
  long w = read_int(), h = read_int(), maxv = read_int();
  pos++;  // single whitespace after maxval
  if (w <= 0 || h <= 0 || maxv != 255) return false;
  if (data.size() < pos + size_t(w) * h) return false;
  img->width = int(w);
  img->height = int(h);
  img->gray.assign(data.begin() + pos, data.begin() + pos + size_t(w) * h);
  return true;
}

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  auto size = f.tellg();
  f.seekg(0);
  out->resize(size_t(size));
  return bool(f.read(reinterpret_cast<char*>(out->data()), size));
}

bool decode_image_file(const std::string& path, Image* img) {
  std::vector<uint8_t> data;
  if (!read_file(path, &data)) return false;
  if (decode_png(data, img)) return true;
  return decode_pgm(data, img);
}

// ---------------------------------------------------------------------------
// Filename sanitization (measurement_processor.cpp:157-176 parity)
// ---------------------------------------------------------------------------

bool safe_filename(const std::string& name) {
  if (name.empty() || name[0] == '/' || name[0] == '\\') return false;
  std::string part;
  for (size_t i = 0; i <= name.size(); i++) {
    char c = i < name.size() ? name[i] : '/';
    if (c == '/' || c == '\\') {
      if (part == "..") return false;
      part.clear();
    } else {
      part += c;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
  std::string dir;
  std::vector<std::string> names;
  int width = 0, height = 0;
  size_t capacity = 4;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<std::pair<long, Image>> ready;  // ordered by index
  size_t next_decode = 0;
  std::atomic<bool> stop{false};

  void run() {
    for (size_t i = 0; i < names.size() && !stop.load(); i++) {
      Image img;
      bool ok = decode_image_file(dir + "/" + names[i], &img);
      std::unique_lock<std::mutex> lk(mu);
      cv_produce.wait(lk, [&] { return ready.size() < capacity || stop; });
      if (stop) return;
      ready.emplace_back(ok ? long(i) : -2, std::move(img));
      cv_consume.notify_one();
    }
    std::unique_lock<std::mutex> lk(mu);
    ready.emplace_back(-1, Image{});  // end marker
    cv_consume.notify_one();
  }
};

}  // namespace

extern "C" {

// Parse an EuRoC CSV with `cols` numeric columns (timestamps included).
// Returns row count; data written as row-major doubles into a malloc'd
// buffer returned through *out (caller frees with msp_free). Malformed
// lines are skipped.
long msp_parse_csv(const char* path, int cols, double** out) {
  std::ifstream f(path);
  if (!f) return -1;
  std::vector<double> rows;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::vector<double> vals;
    size_t start = 0;
    bool ok = true;
    while (start <= line.size() && int(vals.size()) < cols) {
      size_t comma = line.find(',', start);
      std::string tok = line.substr(
          start, comma == std::string::npos ? std::string::npos
                                            : comma - start);
      try {
        size_t used = 0;
        double v = std::stod(tok, &used);
        if (used == 0 || !std::isfinite(v)) { ok = false; break; }
        vals.push_back(v);
      } catch (...) {
        ok = false;
        break;
      }
      if (comma == std::string::npos) break;
      start = comma + 1;
    }
    if (ok && int(vals.size()) == cols)
      rows.insert(rows.end(), vals.begin(), vals.end());
  }
  long n = long(rows.size()) / cols;
  *out = static_cast<double*>(std::malloc(rows.size() * sizeof(double)));
  std::memcpy(*out, rows.data(), rows.size() * sizeof(double));
  return n;
}

// Parse cam0/data.csv: timestamps -> *ts (malloc'd, count entries),
// filenames -> *names (malloc'd, '\n'-separated, sanitized).
long msp_parse_image_csv(const char* path, double** ts, char** names) {
  std::ifstream f(path);
  if (!f) return -1;
  std::vector<double> t;
  std::string joined;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    size_t comma = line.find(',');
    if (comma == std::string::npos) continue;
    double v;
    try {
      v = std::stod(line.substr(0, comma));
    } catch (...) {
      continue;
    }
    std::string name = line.substr(comma + 1);
    while (!name.empty() && (name.back() == '\r' || name.back() == ' '))
      name.pop_back();
    if (!safe_filename(name)) continue;
    t.push_back(v * 1e-9);
    joined += name;
    joined += '\n';
  }
  *ts = static_cast<double*>(std::malloc(t.size() * sizeof(double)));
  std::memcpy(*ts, t.data(), t.size() * sizeof(double));
  *names = static_cast<char*>(std::malloc(joined.size() + 1));
  std::memcpy(*names, joined.c_str(), joined.size() + 1);
  return long(t.size());
}

// Decode one grayscale image (PNG or PGM) into out (w*h bytes).
// Returns 0 ok, -1 io/decode error, -2 size mismatch.
int msp_decode_image(const char* path, unsigned char* out, int width,
                     int height) {
  Image img;
  if (!decode_image_file(path, &img)) return -1;
  if (img.width != width || img.height != height) return -2;
  std::memcpy(out, img.gray.data(), size_t(width) * height);
  return 0;
}

void* msp_open(const char* dir, const char* names_joined, int width,
               int height, int prefetch) {
  auto* l = new Loader();
  l->dir = dir;
  l->width = width;
  l->height = height;
  l->capacity = prefetch > 0 ? size_t(prefetch) : 4;
  std::string cur;
  for (const char* p = names_joined;; p++) {
    if (*p == '\n' || *p == '\0') {
      if (!cur.empty() && safe_filename(cur)) l->names.push_back(cur);
      cur.clear();
      if (*p == '\0') break;
    } else {
      cur += *p;
    }
  }
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// Blocks for the next sequential frame. Returns its index, -1 at end of
// stream, -2 on a decode error (frame skipped by caller).
long msp_next(void* handle, unsigned char* out) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_consume.wait(lk, [&] { return !l->ready.empty(); });
  auto item = std::move(l->ready.front());
  l->ready.pop_front();
  l->cv_produce.notify_one();
  if (item.first >= 0) {
    if (item.second.width == l->width && item.second.height == l->height) {
      std::memcpy(out, item.second.gray.data(),
                  size_t(l->width) * l->height);
    } else {
      return -2;
    }
  }
  return item.first;
}

void msp_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop = true;
  l->cv_produce.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

void msp_free(void* p) { std::free(p); }

}  // extern "C"
