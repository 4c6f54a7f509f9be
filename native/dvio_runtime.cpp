// dvio_runtime — native runtime for the TPU dynamic-VIO engine.
//
// Capability parity with the reference's C++ I/O runtime:
//   * Dataloader (utils/io/dataloader.cpp): directory-fed stereo image
//     stream with pacing/backpressure,
//   * SemanticImageQueue / FeatureQueue (basic/*.h): bounded
//     mutex+condvar queues decoupling pipeline stages.
//
// Here: a multi-worker prefetching image decoder (PNG via libpng, JPEG
// via libjpeg, PGM) pushing decoded grayscale frames into a bounded
// in-order queue, exposed through a C ABI for Python ctypes. The
// decode workers run outside the GIL, overlapping disk+decode with
// JAX compute on the TPU — the role the reference's ImageProcess
// thread plays for its pipeline.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC -lpng -ljpeg -lz).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Frame {
  int index = -1;
  int height = 0;
  int width = 0;
  std::vector<uint8_t> gray;
  bool ok = false;
};

// ---------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------

bool decode_png(FILE* f, Frame* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr,
               nullptr, nullptr);

  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB ||
      color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  out->width = static_cast<int>(w);
  out->height = static_cast<int>(h);
  out->gray.resize(static_cast<size_t>(w) * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->gray.data() + static_cast<size_t>(y) * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_jpeg(FILE* f, Frame* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->gray.resize(static_cast<size_t>(out->width) * out->height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->gray.data() +
                   static_cast<size_t>(cinfo.output_scanline) * out->width;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_pgm(FILE* f, Frame* out) {
  char magic[3] = {0};
  int w = 0, h = 0, maxv = 0;
  if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4) return false;
  if (strcmp(magic, "P5") != 0 || maxv > 255) return false;
  fgetc(f);  // single whitespace
  out->width = w;
  out->height = h;
  out->gray.resize(static_cast<size_t>(w) * h);
  return fread(out->gray.data(), 1, out->gray.size(), f) ==
         out->gray.size();
}

bool decode_file(const std::string& path, Frame* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png(f, out);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg(f, out);
  else if (magic[0] == 'P' && magic[1] == '5')
    ok = decode_pgm(f, out);
  fclose(f);
  out->ok = ok;
  return ok;
}

// ---------------------------------------------------------------------
// bounded in-order prefetch queue
// ---------------------------------------------------------------------

class Loader {
 public:
  Loader(std::vector<std::string> paths, int workers, int capacity)
      : paths_(std::move(paths)), capacity_(capacity) {
    next_to_fetch_.store(0);
    for (int i = 0; i < workers; ++i)
      threads_.emplace_back([this] { Work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_has_space_.notify_all();
    cv_has_item_.notify_all();
    for (auto& t : threads_) t.join();
  }

  // Blocks until frame `next_out_` is ready; returns false at end.
  bool Next(Frame* out) {
    std::unique_lock<std::mutex> lk(mu_);
    const int want = next_out_;
    if (want >= static_cast<int>(paths_.size())) return false;
    cv_has_item_.wait(lk, [this, want] {
      return stop_ || done_.count(want) > 0;
    });
    if (stop_) return false;
    *out = std::move(done_[want]);
    done_.erase(want);
    ++next_out_;
    cv_has_space_.notify_all();
    return true;
  }

 private:
  void Work() {
    for (;;) {
      const int idx = next_to_fetch_.fetch_add(1);
      if (idx >= static_cast<int>(paths_.size())) return;
      Frame fr;
      fr.index = idx;
      decode_file(paths_[idx], &fr);
      std::unique_lock<std::mutex> lk(mu_);
      cv_has_space_.wait(lk, [this, idx] {
        // in-order bounded window: don't run ahead of the consumer
        return stop_ || idx < next_out_ + capacity_;
      });
      if (stop_) return;
      done_[idx] = std::move(fr);
      cv_has_item_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  const int capacity_;
  std::atomic<int> next_to_fetch_;
  int next_out_ = 0;
  bool stop_ = false;
  std::map<int, Frame> done_;
  std::mutex mu_;
  std::condition_variable cv_has_item_;
  std::condition_variable cv_has_space_;
  std::vector<std::thread> threads_;
};

}  // namespace

extern "C" {

void* dvio_loader_create(const char** paths, int n, int workers,
                         int capacity) {
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p),
                    workers > 0 ? workers : 2,
                    capacity > 0 ? capacity : 8);
}

// Returns the frame index (>=0) and fills dims; -1 at end of stream,
// -2 decode failure. `out` must hold max_bytes; frame is copied in
// row-major uint8.
int dvio_loader_next(void* handle, uint8_t* out, long max_bytes,
                     int* height, int* width) {
  auto* loader = static_cast<Loader*>(handle);
  Frame fr;
  if (!loader->Next(&fr)) return -1;
  if (!fr.ok) {
    *height = *width = 0;
    return -2;
  }
  const long need = static_cast<long>(fr.height) * fr.width;
  if (need > max_bytes) return -2;
  memcpy(out, fr.gray.data(), need);
  *height = fr.height;
  *width = fr.width;
  return fr.index;
}

void dvio_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

// Standalone single-image decode (for tests / random access).
int dvio_decode(const char* path, uint8_t* out, long max_bytes,
                int* height, int* width) {
  Frame fr;
  if (!decode_file(path, &fr)) return -1;
  const long need = static_cast<long>(fr.height) * fr.width;
  if (need > max_bytes) return -2;
  memcpy(out, fr.gray.data(), need);
  *height = fr.height;
  *width = fr.width;
  return 0;
}

}  // extern "C"
