// Native frame loader: multi-threaded PNG decode for the ingest pipeline.
//
// The reference's ingest hot loop is a single-threaded Python generator
// calling cv2.imread under the GIL (reference src/raite_loader.py:129-153);
// SURVEY.md section 3.1 flags it as the throughput ceiling. This library is
// the native decode stage of the TPU ingest pipeline: a persistent worker
// pool decodes PNG files straight into a caller-provided contiguous uint8
// batch buffer (ready for one host->HBM DMA), fully outside the GIL.
//
// Scope: baseline 8-bit PNG, color types 0 (gray), 2 (RGB), 3 (palette),
// 4 (gray+alpha), 6 (RGBA), non-interlaced (inflate from zlib); plus
// baseline/progressive JPEG via libjpeg (format sniffed from the magic
// bytes). Output is always tightly packed RGB8. Anything else (16-bit PNG,
// interlaced) falls back to the Python/cv2 path — see data/native.py.
//
// C API (ctypes-friendly):
//   void* fl_pool_create(int num_threads);
//   void  fl_pool_destroy(void* pool);
//   int   fl_decode_png(const char* path, unsigned char* out, int out_cap,
//                       int* width, int* height);            // single, RGB8
//   int   fl_decode_batch(void* pool, const char** paths, int n,
//                         unsigned char* out, int frame_h, int frame_w,
//                         unsigned char* ok_flags);           // parallel
// Returns 0 on success, negative error codes otherwise. Batch frames whose
// native size differs from (frame_h, frame_w) are nearest-resized into place
// (the antialiased resize happens on the TPU; this path is only used when
// the dataset is already at target resolution or for quick previews).

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

#include <csetjmp>

#include <jpeglib.h>
#include <zlib.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrInflate = -3;
constexpr int kErrUnsupported = -4;
constexpr int kErrTooSmall = -5;
constexpr int kErrExcept = -6;

// Matches the Python decode_png path's IHDR probe cap (data/native.py): a
// hostile IHDR must not drive a multi-GB allocation.
constexpr int64_t kMaxPixels = 64LL * 1024 * 1024;

struct Image {
  int width = 0;
  int height = 0;
  std::vector<uint8_t> rgb;  // packed RGB8
};

inline uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a baseline PNG byte stream into packed RGB8.
int decode_png_bytes(const uint8_t* data, size_t size, Image* out) {
  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  if (size < 8 || std::memcmp(data, kSig, 8) != 0) return kErrFormat;

  size_t pos = 8;
  int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples for color type 3

  while (pos + 8 <= size) {
    uint32_t len = read_be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return kErrFormat;

    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return kErrFormat;
      width = int(read_be32(body));
      height = int(read_be32(body + 4));
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
      if (bit_depth != 8 || interlace != 0) return kErrUnsupported;
      if (color_type != 0 && color_type != 2 && color_type != 3 && color_type != 4 &&
          color_type != 6)
        return kErrUnsupported;
    } else if (std::memcmp(type, "PLTE", 4) == 0) {
      palette.assign(body, body + len);
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0 || idat.empty()) return kErrFormat;
  if (int64_t(width) * int64_t(height) > kMaxPixels) return kErrUnsupported;

  const int channels = (color_type == 2) ? 3
                       : (color_type == 6) ? 4
                       : (color_type == 4) ? 2
                                           : 1;  // gray or palette index
  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return kErrInflate;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  int zret = inflate(&zs, Z_FINISH);
  const size_t inflated = zs.total_out;
  inflateEnd(&zs);
  // A truncated IDAT stream leaves zret == Z_OK (or Z_BUF_ERROR) with the
  // output short; the undecoded remainder would silently load as black
  // scanlines. Require a complete stream that filled every scanline, like
  // cv2's imread->None contract for corrupt files.
  if (zret != Z_STREAM_END || inflated != raw.size()) return kErrInflate;

  // Per-scanline unfiltering (filters 0-4).
  std::vector<uint8_t> cur(stride), prev(stride, 0);
  out->width = width;
  out->height = height;
  out->rgb.resize(size_t(width) * height * 3);

  const size_t ch = size_t(channels);
  for (int y = 0; y < height; ++y) {
    const uint8_t* line = raw.data() + size_t(y) * (stride + 1);
    const int filter = line[0];
    const uint8_t* src = line + 1;
    // filter specialized outside the inner loop (the per-byte branchy version
    // was ~5x slower than libpng)
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:  // Sub
        std::memcpy(cur.data(), src, ch);
        for (size_t x = ch; x < stride; ++x) cur[x] = uint8_t(src[x] + cur[x - ch]);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) cur[x] = uint8_t(src[x] + prev[x]);
        break;
      case 3:  // Average
        for (size_t x = 0; x < ch; ++x) cur[x] = uint8_t(src[x] + (prev[x] >> 1));
        for (size_t x = ch; x < stride; ++x)
          cur[x] = uint8_t(src[x] + ((cur[x - ch] + prev[x]) >> 1));
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < ch; ++x) cur[x] = uint8_t(src[x] + prev[x]);
        for (size_t x = ch; x < stride; ++x)
          cur[x] = uint8_t(src[x] + paeth(cur[x - ch], prev[x], prev[x - ch]));
        break;
      default:
        return kErrFormat;
    }
    // expand to RGB
    uint8_t* dst = out->rgb.data() + size_t(y) * width * 3;
    for (int x = 0; x < width; ++x) {
      const uint8_t* px = cur.data() + size_t(x) * channels;
      switch (color_type) {
        case 0:  // gray
          dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = px[0];
          break;
        case 2:  // RGB
          dst[3 * x] = px[0];
          dst[3 * x + 1] = px[1];
          dst[3 * x + 2] = px[2];
          break;
        case 3: {  // palette
          const size_t pi = size_t(px[0]) * 3;
          if (pi + 2 < palette.size()) {
            dst[3 * x] = palette[pi];
            dst[3 * x + 1] = palette[pi + 1];
            dst[3 * x + 2] = palette[pi + 2];
          } else {
            dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = 0;
          }
          break;
        }
        case 4:  // gray + alpha
          dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = px[0];
          break;
        case 6:  // RGBA
          dst[3 * x] = px[0];
          dst[3 * x + 1] = px[1];
          dst[3 * x + 2] = px[2];
          break;
      }
    }
    std::swap(cur, prev);
  }
  return 0;
}

// libjpeg's default error handler calls exit(); trap errors with longjmp so
// a corrupt JPEG flags ok=0 instead of killing the process.
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg_bytes(const uint8_t* data, size_t size, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrFormat;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return kErrFormat;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int width = int(cinfo.output_width);
  const int height = int(cinfo.output_height);
  if (width <= 0 || height <= 0 ||
      int64_t(width) * int64_t(height) > kMaxPixels) {
    jpeg_destroy_decompress(&cinfo);
    return kErrUnsupported;
  }
  out->width = width;
  out->height = height;
  out->rgb.resize(size_t(width) * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->rgb.data() + size_t(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

inline bool is_jpeg(const uint8_t* data, size_t size) {
  return size >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF;
}

int decode_image_bytes(const uint8_t* data, size_t size, Image* out) {
  if (is_jpeg(data, size)) return decode_jpeg_bytes(data, size, out);
  return decode_png_bytes(data, size, out);
}

int decode_png_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    std::fclose(f);
    return kErrOpen;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(fsize), f);
  std::fclose(f);
  if (got != size_t(fsize)) return kErrOpen;
  return decode_image_bytes(buf.data(), buf.size(), out);
}

// Nearest-neighbor placement into a fixed (h, w) RGB8 frame slot.
void place_resized(const Image& img, uint8_t* dst, int h, int w) {
  if (img.height == h && img.width == w) {
    std::memcpy(dst, img.rgb.data(), size_t(h) * w * 3);
    return;
  }
  for (int y = 0; y < h; ++y) {
    const int sy = int((int64_t(y) * img.height) / h);
    const uint8_t* srow = img.rgb.data() + size_t(sy) * img.width * 3;
    uint8_t* drow = dst + size_t(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      const int sx = int((int64_t(x) * img.width) / w);
      std::memcpy(drow + 3 * x, srow + 3 * sx, 3);
    }
  }
}

class WorkerPool {
 public:
  explicit WorkerPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      threads_.emplace_back([this] { this->Run(); });
    }
  }
  ~WorkerPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        fn = std::move(queue_.front());
        queue_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> queue_;
  std::vector<std::thread> threads_;
  bool stop_;
};

}  // namespace

extern "C" {

// Header-only probe: (width, height) without decoding. PNG IHDR, or JPEG
// SOF marker walk. Segment lengths are followed with fseek, so EXIF/ICC
// blobs of any size (camera JPEGs routinely push SOF past 64 KB) cost no
// reads; the walk is bounded by a segment count, not a byte budget.
int fl_png_dims(const char* path, int* width, int* height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  uint8_t hdr[32];
  size_t got = std::fread(hdr, 1, sizeof(hdr), f);
  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  if (got >= 29 && std::memcmp(hdr, kSig, 8) == 0 &&
      std::memcmp(hdr + 12, "IHDR", 4) == 0) {
    *width = int(read_be32(hdr + 16));
    *height = int(read_be32(hdr + 20));
    std::fclose(f);
    return 0;
  }
  if (got >= 4 && is_jpeg(hdr, got)) {
    if (std::fseek(f, 2, SEEK_SET) != 0) {  // right after SOI
      std::fclose(f);
      return kErrFormat;
    }
    for (int seg = 0; seg < 4096; ++seg) {
      int c = std::fgetc(f);
      if (c == EOF) break;
      if (c != 0xFF) break;
      int marker = std::fgetc(f);
      while (marker == 0xFF) marker = std::fgetc(f);  // fill bytes
      if (marker == EOF) break;
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        continue;  // standalone markers (SOI, RSTn)
      }
      uint8_t lb[2];
      if (std::fread(lb, 1, 2, f) != 2) break;
      const size_t seg_len = (size_t(lb[0]) << 8) | lb[1];
      if (seg_len < 2) break;
      const bool is_sof = marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
                          marker != 0xC8 && marker != 0xCC;
      if (is_sof) {
        uint8_t p[5];  // precision(1) + height(2) + width(2)
        if (std::fread(p, 1, 5, f) != 5) break;
        *height = int((size_t(p[1]) << 8) | p[2]);
        *width = int((size_t(p[3]) << 8) | p[4]);
        std::fclose(f);
        return 0;
      }
      if (marker == 0xDA) break;  // start of scan: SOF should have appeared
      if (std::fseek(f, long(seg_len - 2), SEEK_CUR) != 0) break;
    }
    std::fclose(f);
    return kErrFormat;
  }
  std::fclose(f);
  return kErrFormat;
}

void* fl_pool_create(int num_threads) {
  if (num_threads <= 0) num_threads = int(std::thread::hardware_concurrency());
  return new WorkerPool(num_threads);
}

void fl_pool_destroy(void* pool) { delete static_cast<WorkerPool*>(pool); }

int fl_decode_png(const char* path, unsigned char* out, int out_cap, int* width,
                  int* height) {
  Image img;
  int rc = decode_png_file(path, &img);
  if (rc != 0) return rc;
  const size_t need = size_t(img.width) * img.height * 3;
  if (out_cap >= 0 && size_t(out_cap) < need) {
    *width = img.width;
    *height = img.height;
    return kErrTooSmall;
  }
  std::memcpy(out, img.rgb.data(), need);
  *width = img.width;
  *height = img.height;
  return 0;
}

int fl_decode_batch(void* pool_ptr, const char** paths, int n, unsigned char* out,
                    int frame_h, int frame_w, unsigned char* ok_flags) {
  WorkerPool* pool = static_cast<WorkerPool*>(pool_ptr);
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;
  const size_t frame_bytes = size_t(frame_h) * frame_w * 3;

  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      // An escaping exception (e.g. std::bad_alloc on a hostile IHDR) would
      // cross the worker-thread boundary and std::terminate the whole
      // process; contain it and flag the frame as failed instead.
      int rc;
      try {
        Image img;
        rc = decode_png_file(paths[i], &img);
        if (rc == 0) place_resized(img, out + size_t(i) * frame_bytes, frame_h, frame_w);
      } catch (...) {
        rc = kErrExcept;
      }
      if (rc == 0) {
        ok_flags[i] = 1;
      } else {
        std::memset(out + size_t(i) * frame_bytes, 0, frame_bytes);
        ok_flags[i] = 0;
      }
      // The decrement must happen UNDER the mutex: decrementing first would
      // let the waiter observe remaining==0 (spurious wakeup), return, and
      // destroy done_mu/done_cv on its stack while this thread is about to
      // lock/notify them (use-after-free). With the decrement inside the
      // lock, the waiter can only see 0 after this thread releases the
      // mutex — its last touch of either object.
      {
        std::lock_guard<std::mutex> lk(done_mu);
        if (remaining.fetch_sub(1) == 1) done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return 0;
}

}  // extern "C"
