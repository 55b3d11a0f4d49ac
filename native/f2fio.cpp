// f2fio — native host I/O runtime for frame2frame_tpu.
//
// TPU-native counterpart of the reference's C I/O layer (tvl1flow/iio.c and
// the per-frame Python readers at blind_denoising.py:170-209): Middlebury
// .flo codec, PGM/PNG grayscale decode to float32, and a multi-threaded
// prefetch ring that keeps the streaming denoiser's host side ahead of device
// compute (the double-buffered I/O of BASELINE.json config 5). Exposed via a
// C ABI for ctypes.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links libpng + pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

namespace {

constexpr float kFloMagic = 202021.25f;

// ---------------------------------------------------------------- .flo codec

bool read_flo_file(const char* path, std::vector<float>* data, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  float magic = 0.f;
  int32_t wi = 0, hi = 0;
  bool ok = fread(&magic, 4, 1, f) == 1 && magic == kFloMagic &&
            fread(&wi, 4, 1, f) == 1 && fread(&hi, 4, 1, f) == 1;
  if (ok) {
    data->resize(static_cast<size_t>(wi) * hi * 2);
    ok = fread(data->data(), 4, data->size(), f) == data->size();
  }
  fclose(f);
  if (ok) {
    *w = wi;
    *h = hi;
  }
  return ok;
}

bool write_flo_file(const char* path, const float* data, int w, int h) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  int32_t wi = w, hi = h;
  bool ok = fwrite(&kFloMagic, 4, 1, f) == 1 && fwrite(&wi, 4, 1, f) == 1 &&
            fwrite(&hi, 4, 1, f) == 1 &&
            fwrite(data, 4, static_cast<size_t>(w) * h * 2, f) ==
                static_cast<size_t>(w) * h * 2;
  fclose(f);
  return ok;
}

// -------------------------------------------------------------- image decode

// Grayscale float32 in [0, 255]; RGB collapses with rec.601 luma
// (matching io/image.py read_gray semantics x255).
bool read_png_gray(const char* path, std::vector<float>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);

  std::vector<uint8_t> row(width * channels);
  out->resize(static_cast<size_t>(width) * height);
  for (png_uint_32 y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data() + static_cast<size_t>(y) * width;
    if (channels == 1) {
      for (png_uint_32 x = 0; x < width; ++x) dst[x] = row[x];
    } else {
      for (png_uint_32 x = 0; x < width; ++x) {
        const uint8_t* p = &row[x * channels];
        dst[x] = 0.2125f * p[0] + 0.7154f * p[1] + 0.0721f * p[2];
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  return true;
}

bool read_pgm_gray(const char* path, std::vector<float>* out, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char magic[3] = {0};
  int wi = 0, hi = 0, maxval = 0;
  bool ok = fscanf(f, "%2s %d %d %d", magic, &wi, &hi, &maxval) == 4 &&
            std::strcmp(magic, "P5") == 0;
  if (ok) {
    fgetc(f);  // single whitespace after maxval
    std::vector<uint8_t> buf(static_cast<size_t>(wi) * hi);
    ok = fread(buf.data(), 1, buf.size(), f) == buf.size();
    if (ok) {
      out->resize(buf.size());
      for (size_t i = 0; i < buf.size(); ++i) (*out)[i] = buf[i];
    }
  }
  fclose(f);
  if (ok) {
    *w = wi;
    *h = hi;
  }
  return ok;
}

bool read_image_gray(const char* path, std::vector<float>* out, int* w, int* h) {
  const char* dot = std::strrchr(path, '.');
  if (dot && (std::strcmp(dot, ".pgm") == 0 || std::strcmp(dot, ".PGM") == 0))
    return read_pgm_gray(path, out, w, h);
  return read_png_gray(path, out, w, h);
}

// ------------------------------------------------------------- prefetch ring

struct Frame {
  int index = -1;
  int w = 0, h = 0;
  std::vector<float> pixels;
  std::vector<float> flow;  // optional, 2*w*h
  bool ok = false;
};

struct Prefetcher {
  std::vector<std::string> frame_paths;
  std::vector<std::string> flow_paths;  // may be empty
  size_t capacity;
  std::atomic<size_t> next_to_read{0};

  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  // frames completed by workers, delivered strictly in order
  std::vector<Frame> done;  // indexed slots
  std::vector<uint8_t> ready;
  size_t next_to_deliver = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  explicit Prefetcher(size_t n) : done(n), ready(n, 0) {}

  void worker() {
    while (!stop.load()) {
      size_t idx = next_to_read.fetch_add(1);
      if (idx >= frame_paths.size()) return;
      {
        // bound the lookahead window to `capacity`
        std::unique_lock<std::mutex> lk(mu);
        cv_put.wait(lk, [&] {
          return stop.load() || idx < next_to_deliver + capacity;
        });
        if (stop.load()) return;
      }
      Frame fr;
      fr.index = static_cast<int>(idx);
      fr.ok = read_image_gray(frame_paths[idx].c_str(), &fr.pixels, &fr.w, &fr.h);
      if (fr.ok && idx < flow_paths.size() && !flow_paths[idx].empty()) {
        int fw = 0, fh = 0;
        fr.ok = read_flo_file(flow_paths[idx].c_str(), &fr.flow, &fw, &fh) &&
                fw == fr.w && fh == fr.h;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done[idx] = std::move(fr);
        ready[idx] = 1;
      }
      cv_get.notify_all();
    }
  }

  bool get(size_t idx, Frame** out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_get.wait(lk, [&] { return stop.load() || ready[idx]; });
    if (stop.load() && !ready[idx]) return false;
    *out = &done[idx];
    next_to_deliver = idx + 1;
    cv_put.notify_all();
    return true;
  }
};

}  // namespace

extern "C" {

// .flo codec
int f2f_read_flo(const char* path, float* out, int max_elems, int* w, int* h) {
  std::vector<float> data;
  if (!read_flo_file(path, &data, w, h)) return -1;
  if (static_cast<int>(data.size()) > max_elems) return -2;
  std::memcpy(out, data.data(), data.size() * 4);
  return static_cast<int>(data.size());
}

int f2f_write_flo(const char* path, const float* data, int w, int h) {
  return write_flo_file(path, data, w, h) ? 0 : -1;
}

// grayscale decode (png/pgm) -> float32 [0,255]
int f2f_read_gray(const char* path, float* out, int max_elems, int* w, int* h) {
  std::vector<float> data;
  if (!read_image_gray(path, &data, w, h)) return -1;
  if (static_cast<int>(data.size()) > max_elems) return -2;
  std::memcpy(out, data.data(), data.size() * 4);
  return static_cast<int>(data.size());
}

// prefetcher
void* f2f_prefetch_open(const char** frame_paths, const char** flow_paths,
                        int n, int capacity, int nthreads) {
  auto* p = new Prefetcher(static_cast<size_t>(n));
  p->capacity = capacity > 0 ? capacity : 4;
  for (int i = 0; i < n; ++i) {
    p->frame_paths.emplace_back(frame_paths[i]);
    p->flow_paths.emplace_back(flow_paths && flow_paths[i] ? flow_paths[i] : "");
  }
  int nt = nthreads > 0 ? nthreads : 2;
  for (int i = 0; i < nt; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Blocks until frame `idx` is decoded. Returns 0 on success; fills w/h and
// copies pixels (w*h floats) and, if present, flow (2*w*h floats; has_flow=1).
int f2f_prefetch_get(void* handle, int idx, float* pixels, int max_pix,
                     float* flow, int max_flow, int* w, int* h, int* has_flow) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (idx < 0 || idx >= static_cast<int>(p->done.size())) return -1;
  Frame* fr = nullptr;
  if (!p->get(static_cast<size_t>(idx), &fr) || !fr->ok) return -2;
  if (static_cast<int>(fr->pixels.size()) > max_pix) return -3;
  std::memcpy(pixels, fr->pixels.data(), fr->pixels.size() * 4);
  *w = fr->w;
  *h = fr->h;
  *has_flow = 0;
  if (!fr->flow.empty()) {
    if (static_cast<int>(fr->flow.size()) > max_flow) return -4;
    std::memcpy(flow, fr->flow.data(), fr->flow.size() * 4);
    *has_flow = 1;
  }
  return 0;
}

void f2f_prefetch_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_put.notify_all();
  p->cv_get.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
