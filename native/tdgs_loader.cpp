// tdgs native data loader: JPEG/PNG decode + box-downsample + threaded
// prefetch. The TPU-native counterpart of the reference's torch DataLoader
// worker processes (the reference JIT-builds its native code at import,
// gsplat/cuda/_backend.py — this library is built the same way by
// tdgs/datasets/_native.py and bound via ctypes).
//
// Build: g++ -O3 -shared -fPIC tdgs_loader.cpp -o libtdgs_loader.so \
//        -ljpeg -lpng -lz -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

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

namespace {

struct Image {
  uint8_t* data = nullptr;  // RGB8, row-major
  int width = 0;
  int height = 0;
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->data = (uint8_t*)malloc((size_t)out->width * out->height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data + (size_t)cinfo.output_scanline * out->width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png(const char* path, Image* out) {
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
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->data = (uint8_t*)malloc((size_t)out->width * out->height * 3);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data + (size_t)y * out->width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool decode_any(const char* path, Image* out) {
  std::string p(path);
  if (ends_with(p, ".png")) return decode_png(path, out);
  if (ends_with(p, ".jpg") || ends_with(p, ".jpeg"))
    return decode_jpeg(path, out);
  // sniff magic
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
    return decode_jpeg(path, out);
  if (got >= 4 && magic[1] == 'P' && magic[2] == 'N' && magic[3] == 'G')
    return decode_png(path, out);
  return false;
}

// box-filter downsample by integer factor (the reference's images_{factor})
void downsample(const Image& src, int factor, Image* dst) {
  dst->width = src.width / factor;
  dst->height = src.height / factor;
  dst->data = (uint8_t*)malloc((size_t)dst->width * dst->height * 3);
  for (int y = 0; y < dst->height; ++y) {
    for (int x = 0; x < dst->width; ++x) {
      int acc[3] = {0, 0, 0};
      for (int dy = 0; dy < factor; ++dy) {
        const uint8_t* row =
            src.data + ((size_t)(y * factor + dy) * src.width + x * factor) * 3;
        for (int dx = 0; dx < factor; ++dx) {
          acc[0] += row[dx * 3 + 0];
          acc[1] += row[dx * 3 + 1];
          acc[2] += row[dx * 3 + 2];
        }
      }
      uint8_t* o = dst->data + ((size_t)y * dst->width + x) * 3;
      int n = factor * factor;
      o[0] = (uint8_t)(acc[0] / n);
      o[1] = (uint8_t)(acc[1] / n);
      o[2] = (uint8_t)(acc[2] / n);
    }
  }
}

// ---------------------------------------------------------------------------
// threaded prefetcher
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  int factor = 1;
  std::vector<Image> slots;
  std::vector<std::atomic<int>> state;  // 0 empty, 1 loading, 2 ready
  std::mutex mu;
  std::condition_variable cv;
  std::queue<int> work;
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};

  Prefetcher(const char** ps, int n, int factor_, int n_threads)
      : paths(ps, ps + n), factor(factor_), slots(n), state(n) {
    for (auto& s : state) s.store(0);
    for (int i = 0; i < n_threads; ++i)
      threads.emplace_back([this] { worker(); });
  }

  ~Prefetcher() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : threads) t.join();
    for (auto& im : slots) free(im.data);
  }

  void request(int idx) {
    int expect = 0;
    if (!state[idx].compare_exchange_strong(expect, 1)) return;
    {
      std::lock_guard<std::mutex> g(mu);
      work.push(idx);
    }
    cv.notify_one();
  }

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> g(mu);
        cv.wait(g, [this] { return stop.load() || !work.empty(); });
        if (stop.load()) return;
        idx = work.front();
        work.pop();
      }
      Image im;
      if (decode_any(paths[idx].c_str(), &im)) {
        if (factor > 1) {
          Image small;
          downsample(im, factor, &small);
          free(im.data);
          im = small;
        }
      }
      slots[idx] = im;
      state[idx].store(2);
      cv.notify_all();
    }
  }

  // blocks until ready; transfers ownership of the buffer to the caller
  bool get(int idx, uint8_t** data, int* w, int* h) {
    request(idx);
    std::unique_lock<std::mutex> g(mu);
    cv.wait(g, [&] { return state[idx].load() == 2; });
    Image& im = slots[idx];
    *data = im.data;
    *w = im.width;
    *h = im.height;
    im.data = nullptr;
    state[idx].store(0);
    return *data != nullptr;
  }
};

}  // namespace

extern "C" {

int tdgs_decode_image(const char* path, int factor, uint8_t** out_data,
                      int* out_w, int* out_h) {
  Image im;
  if (!decode_any(path, &im)) return 0;
  if (factor > 1) {
    Image small;
    downsample(im, factor, &small);
    free(im.data);
    im = small;
  }
  *out_data = im.data;
  *out_w = im.width;
  *out_h = im.height;
  return 1;
}

void tdgs_free(uint8_t* p) { free(p); }

void* tdgs_prefetcher_create(const char** paths, int n, int factor,
                             int n_threads) {
  return new Prefetcher(paths, n, factor, n_threads);
}

void tdgs_prefetcher_request(void* h, int idx) {
  ((Prefetcher*)h)->request(idx);
}

int tdgs_prefetcher_get(void* h, int idx, uint8_t** data, int* w, int* hgt) {
  return ((Prefetcher*)h)->get(idx, data, w, hgt) ? 1 : 0;
}

void tdgs_prefetcher_destroy(void* h) { delete (Prefetcher*)h; }

}  // extern "C"
