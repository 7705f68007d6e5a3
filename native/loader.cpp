// Native data-ingestion runtime for the TPU MSCKF framework.
//
// The reference implements its dataset layer in C++ (asl_readers.cpp,
// penncosy_readers.cpp: eager CSV parse + lazy per-frame cv::imread). This is
// the TPU-native equivalent: the host-side feeder that keeps a TPU-resident
// filter fleet supplied with sensor arrays. Two components:
//
//  1. a zero-copy CSV parser (mmap + branch-light float scanning) for the
//     EuRoC/ASL data.csv files — the whole 200 Hz IMU / GT tables parse in
//     one pass into a caller-provided double buffer;
//  2. an asynchronous image pipeline: a thread pool decodes grayscale
//     PNG/PGM/JPEG frames ahead of the consumer into a bounded ring of
//     slots, so image decode (the only per-frame host cost once the filter
//     is device-resident) overlaps with TPU execution.
//
// Pure C ABI; Python binds with ctypes (msckf_mono_tpu/data/native_loader.py).
// No OpenCV, no ROS.

#include <atomic>
#include <cctype>
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

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// CSV parsing
// ---------------------------------------------------------------------------

// Count data rows (non-empty, not starting with '#') in a CSV file.
// Returns -1 on IO error.
long long csv_count_rows(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return st.st_size == 0 ? 0 : -1;
  }
  const char* data =
      (const char*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;

  long long rows = 0;
  const char* p = data;
  const char* end = data + st.st_size;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line_end = nl ? nl : end;
    // skip leading whitespace
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q < line_end && *q != '#') rows++;
    p = nl ? nl + 1 : end;
  }
  munmap((void*)data, st.st_size);
  return rows;
}

// Parse a numeric CSV (comma or whitespace separated) into out[rows*cols],
// row-major. Lines starting with '#' are skipped. Short rows are zero-padded;
// extra columns are ignored. Returns number of rows parsed, or -1 on error.
long long csv_parse(const char* path, double* out, long long max_rows,
                    int cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  if (st.st_size == 0) {
    close(fd);
    return 0;
  }
  const char* data =
      (const char*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;

  long long row = 0;
  const char* p = data;
  const char* end = data + st.st_size;
  while (p < end && row < max_rows) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line_end = nl ? nl : end;
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q >= line_end || *q == '#') {
      p = nl ? nl + 1 : end;
      continue;
    }
    double* dst = out + row * cols;
    int c = 0;
    while (q < line_end && c < cols) {
      // strtod stops at the separator; it may read past line_end only into
      // the next line's digits if the line lacks a terminator, which cannot
      // happen for '\n'-separated rows (strtod stops at '\n' or ',').
      char* next = nullptr;
      double v = strtod(q, &next);
      if (next == q) break;  // no progress: malformed token
      dst[c++] = v;
      q = next;
      while (q < line_end &&
             (*q == ',' || *q == ' ' || *q == '\t' || *q == '\r'))
        q++;
    }
    while (c < cols) dst[c++] = 0.0;
    row++;
    p = nl ? nl + 1 : end;
  }
  munmap((void*)data, st.st_size);
  return row;
}

// Parse column `col` of a CSV as exact int64 (EuRoC nanosecond timestamps
// exceed double's 53-bit mantissa). Rows counted like csv_parse. Returns rows
// parsed or -1.
long long csv_parse_i64_col(const char* path, int col, long long* out,
                            long long max_rows) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  if (st.st_size == 0) {
    close(fd);
    return 0;
  }
  const char* data =
      (const char*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -1;

  long long row = 0;
  const char* p = data;
  const char* end = data + st.st_size;
  while (p < end && row < max_rows) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line_end = nl ? nl : end;
    const char* q = p;
    while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
    if (q >= line_end || *q == '#') {
      p = nl ? nl + 1 : end;
      continue;
    }
    // skip to the target column
    for (int c = 0; c < col && q < line_end; c++) {
      const char* comma = (const char*)memchr(q, ',', line_end - q);
      if (!comma) {
        q = line_end;
        break;
      }
      q = comma + 1;
    }
    long long v = 0;
    if (q < line_end) v = strtoll(q, nullptr, 10);
    out[row++] = v;
    p = nl ? nl + 1 : end;
  }
  munmap((void*)data, st.st_size);
  return row;
}

// ---------------------------------------------------------------------------
// Grayscale image decode (PNG / PGM / JPEG by magic bytes)
// ---------------------------------------------------------------------------

namespace {

struct Image {
  std::vector<uint8_t> pixels;
  int width = 0;
  int height = 0;
  bool ok = false;
};

Image decode_png(FILE* f) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    img.ok = false;
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize to 8-bit gray (cv::imread IMREAD_GRAYSCALE equivalent)
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    // ITU-R BT.601 luma, the same coefficients OpenCV uses
    png_set_rgb_to_gray_fixed(png, 1, 29900, 58700);
  png_read_update_info(png, info);

  img.width = (int)w;
  img.height = (int)h;
  img.pixels.resize((size_t)w * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++) rows[y] = img.pixels.data() + (size_t)y * w;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  img.width = cinfo.output_width;
  img.height = cinfo.output_height;
  img.pixels.resize((size_t)img.width * img.height);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = img.pixels.data() + (size_t)cinfo.output_scanline * img.width;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_pgm(FILE* f) {
  Image img;
  int w = 0, h = 0, maxv = 0;
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) return img;
  // skip whitespace/comments
  auto next_int = [&](int* out) -> bool {
    int c;
    for (;;) {
      c = fgetc(f);
      if (c == '#') {
        while (c != '\n' && c != EOF) c = fgetc(f);
      } else if (!isspace(c)) {
        break;
      }
    }
    if (c == EOF) return false;
    ungetc(c, f);
    return fscanf(f, "%d", out) == 1;
  };
  if (!next_int(&w) || !next_int(&h) || !next_int(&maxv)) return img;
  fgetc(f);  // single whitespace after maxval
  img.width = w;
  img.height = h;
  img.pixels.resize((size_t)w * h);
  if (maxv < 256) {
    if (fread(img.pixels.data(), 1, img.pixels.size(), f) != img.pixels.size())
      return img;
  } else {
    std::vector<uint8_t> raw((size_t)w * h * 2);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return img;
    for (size_t i = 0; i < img.pixels.size(); i++)
      img.pixels[i] = (uint8_t)((raw[2 * i] << 8 | raw[2 * i + 1]) * 255 / maxv);
  }
  img.ok = true;
  return img;
}

Image decode_image_file(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  rewind(f);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    img = decode_png(f);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 2 && magic[0] == 'P' && magic[1] == '5') {
    img = decode_pgm(f);
  }
  fclose(f);
  return img;
}

}  // namespace

// Decode one grayscale image into out (caller-allocated, w*h bytes).
// Returns 0 on success, -1 on decode failure, -2 on size mismatch.
int image_decode_gray(const char* path, uint8_t* out, int width, int height) {
  Image img = decode_image_file(path);
  if (!img.ok) return -1;
  if (img.width != width || img.height != height) return -2;
  memcpy(out, img.pixels.data(), (size_t)width * height);
  return 0;
}

// Probe an image's dimensions. Returns 0 on success.
int image_probe(const char* path, int* width, int* height) {
  Image img = decode_image_file(path);
  if (!img.ok) return -1;
  *width = img.width;
  *height = img.height;
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetching image loader (thread pool + bounded lookahead ring)
// ---------------------------------------------------------------------------

namespace {

struct Prefetcher {
  std::vector<std::string> paths;
  int width = 0, height = 0;
  int lookahead = 0;

  std::mutex mu;
  std::condition_variable cv_worker;   // signaled when work may be available
  std::condition_variable cv_consumer; // signaled when a slot completes
  std::vector<std::thread> workers;

  // slot state per frame index within [head, head+lookahead)
  struct Slot {
    std::vector<uint8_t> data;
    int status = 0;  // 0 = empty, 1 = in-flight, 2 = ready, <0 = error
    long long frame = -1;
  };
  std::vector<Slot> ring;
  long long head = 0;     // next frame index the consumer will take
  long long scheduled = 0;  // next frame index to hand to a worker
  bool stop = false;

  Slot& slot(long long frame) { return ring[frame % ring.size()]; }

  void worker_loop() {
    std::unique_lock<std::mutex> lk(mu);
    while (true) {
      while (!stop &&
             (scheduled >= (long long)paths.size() ||
              scheduled >= head + lookahead))
        cv_worker.wait(lk);
      if (stop) return;
      long long frame = scheduled++;
      Slot& s = slot(frame);
      s.status = 1;
      s.frame = frame;
      lk.unlock();

      Image img = decode_image_file(paths[frame].c_str());
      int st;
      if (!img.ok)
        st = -1;
      else if (img.width != width || img.height != height)
        st = -2;
      else
        st = 2;

      lk.lock();
      Slot& s2 = slot(frame);
      if (s2.frame == frame) {  // not invalidated by a seek
        if (st == 2) s2.data = std::move(img.pixels);
        s2.status = st;
        cv_consumer.notify_all();
      }
    }
  }
};

}  // namespace

// Create a prefetching grayscale loader over n_paths image files.
// All images must match (width, height). Returns an opaque handle.
void* prefetcher_create(const char** file_paths, long long n_paths, int width,
                        int height, int n_threads, int lookahead) {
  auto* p = new Prefetcher();
  p->paths.reserve(n_paths);
  for (long long i = 0; i < n_paths; i++) p->paths.emplace_back(file_paths[i]);
  p->width = width;
  p->height = height;
  p->lookahead = lookahead < 1 ? 1 : lookahead;
  p->ring.resize(p->lookahead);
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; t++)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

// Blocking fetch of frame `index` into out (width*height bytes).
// Sequential access is the fast path; a backward/forward seek flushes the
// ring. Returns 0 ok, -1 decode error, -2 size mismatch, -3 bad index.
int prefetcher_get(void* handle, long long index, uint8_t* out) {
  auto* p = (Prefetcher*)handle;
  if (index < 0 || index >= (long long)p->paths.size()) return -3;
  std::unique_lock<std::mutex> lk(p->mu);
  if (index < p->head || index >= p->head + p->lookahead) {
    // seek: invalidate ring and restart scheduling from `index`
    for (auto& s : p->ring) {
      s.status = 0;
      s.frame = -1;
    }
    p->head = index;
    p->scheduled = index;
  } else if (index > p->head) {
    // consumer advanced: frames before `index` are dead; slots recycle
    // naturally since scheduled only moves forward
    p->head = index;
    if (p->scheduled < p->head) p->scheduled = p->head;
  }
  p->cv_worker.notify_all();

  Prefetcher::Slot& s = p->slot(index);
  while (!(s.frame == index && (s.status == 2 || s.status < 0)))
    p->cv_consumer.wait(lk);
  if (s.status < 0) return s.status;
  memcpy(out, s.data.data(), (size_t)p->width * p->height);
  // mark consumed so the slot can host a future frame
  s.status = 0;
  s.frame = -1;
  p->head = index + 1;
  p->cv_worker.notify_all();
  return 0;
}

void prefetcher_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_worker.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
