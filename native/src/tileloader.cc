// Native tile loader: threaded JPEG/TIFF decode + 1024px tile slicing.
//
// The host-side hot path feeding the TPU: the reference stages this work
// through GDAL translate + separate processes (reference:
// src/load_data/tile_tifs.py); here a C++ thread pool decodes images and
// slices the tile grid directly into caller-provided batch buffers, so
// Python only moves pointers. Exposed as a minimal C ABI consumed via
// ctypes (aquaculture_tpu/data/native_loader.py).
//
// Build: make -C native   ->  native/libaquatile.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <tiffio.h>

#include <csetjmp>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // h * w * 3
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// scale_num8 in [1,8]: decode at scale_num8/8 of full size in the DCT
// domain (libjpeg scale_num/scale_denom) — decoding 1024px tiles at 5/8
// emits 640px directly, skipping ~60% of the IDCT + colorspace work the
// full decode would spend on pixels the model's resize throws away
// (reference serving staged full-size JPEGs: src/load_data/tile_tifs.py:50-74).
bool decode_jpeg(const uint8_t* data, size_t len, Image* out, int scale_num8 = 8) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (scale_num8 >= 1 && scale_num8 < 8) {
    cinfo.scale_num = scale_num8;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------- TIFF

bool decode_tiff(const char* path, Image* out) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return false;
  uint32_t w = 0, h = 0;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
  std::vector<uint32_t> raster(size_t(w) * h);
  // Top-left orientation so row 0 is the image top (matches PIL/numpy).
  if (!TIFFReadRGBAImageOriented(tif, w, h, raster.data(), ORIENTATION_TOPLEFT, 0)) {
    TIFFClose(tif);
    return false;
  }
  TIFFClose(tif);
  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  for (size_t i = 0; i < raster.size(); ++i) {
    uint32_t px = raster[i];
    out->rgb[i * 3 + 0] = TIFFGetR(px);
    out->rgb[i * 3 + 1] = TIFFGetG(px);
    out->rgb[i * 3 + 2] = TIFFGetB(px);
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  bool ok = fread(out->data(), 1, n, f) == size_t(n);
  fclose(f);
  return ok;
}

// Whole-image bilinear resize (uint8 RGB). Scaled-mode fallback for
// formats without DCT-domain scaling (TIFF) when the loader is driven
// through the raw C API. This 2-tap operator is NOT mAP-gated (the gated
// scaled operators are the JPEG DCT box decode and the Python loader's
// PIL resize), so the Python wrapper (data/native_loader.py
// native_tile_batches) routes non-JPEG scaled decodes to the PIL twin
// and never reaches this path in production.
void resize_bilinear(const Image& src, int dst_w, int dst_h, Image* out) {
  out->w = dst_w;
  out->h = dst_h;
  out->rgb.resize(size_t(dst_w) * dst_h * 3);
  const double sx = double(src.w) / dst_w, sy = double(src.h) / dst_h;
  for (int y = 0; y < dst_h; ++y) {
    // pixel-center sampling (align with jax.image.resize/PIL conventions)
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = int(fy) - (fy < 0);
    double wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), src.h - 1);
    int y1c = std::min(y0 + 1, src.h - 1);
    if (y1c < 0) y1c = 0;
    for (int x = 0; x < dst_w; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = int(fx) - (fx < 0);
      double wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), src.w - 1);
      int x1c = std::min(x0 + 1, src.w - 1);
      if (x1c < 0) x1c = 0;
      const uint8_t* p00 = src.rgb.data() + (size_t(y0c) * src.w + x0c) * 3;
      const uint8_t* p01 = src.rgb.data() + (size_t(y0c) * src.w + x1c) * 3;
      const uint8_t* p10 = src.rgb.data() + (size_t(y1c) * src.w + x0c) * 3;
      const uint8_t* p11 = src.rgb.data() + (size_t(y1c) * src.w + x1c) * 3;
      uint8_t* dst = out->rgb.data() + (size_t(y) * dst_w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        double v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                   wy * ((1 - wx) * p10[c] + wx * p11[c]);
        dst[c] = uint8_t(v + 0.5);
      }
    }
  }
}

// scale_num8 = 8 decodes full size. Otherwise JPEGs scale in the DCT
// domain; other formats decode full then resize to ceil(dim*scale/8)
// (matching libjpeg's jpeg_calc_output_dimensions rounding, so JPEG and
// TIFF corpora produce identically-shaped tiles).
bool decode_any(const char* path, Image* out, int scale_num8 = 8) {
  std::vector<uint8_t> data;
  if (!read_file(path, &data) || data.size() < 4) return false;
  if (data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data.data(), data.size(), out, scale_num8);
  if ((data[0] == 'I' && data[1] == 'I') || (data[0] == 'M' && data[1] == 'M')) {
    if (!decode_tiff(path, out)) return false;
    if (scale_num8 >= 1 && scale_num8 < 8) {
      Image scaled;
      int dw = (out->w * scale_num8 + 7) / 8;
      int dh = (out->h * scale_num8 + 7) / 8;
      resize_bilinear(*out, dw, dh, &scaled);
      *out = std::move(scaled);
    }
    return true;
  }
  return false;
}

// ---------------------------------------------------------------- loader

struct TileRec {
  std::vector<uint8_t> pixels;  // tile*tile*3 (zero-padded)
  int path_idx, x_off, y_off;
};

struct Loader {
  std::vector<std::string> paths;
  int tile;
  int out_tile = 0;  // 0 = emit source-resolution tiles; >0 = decode at
                     // out_tile/tile scale (8*out_tile % tile == 0) and emit
                     // out_tile px tiles with offsets still in SOURCE pixels
  int queue_depth;

  std::deque<TileRec> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<size_t> next_path{0};
  std::atomic<int> live_workers{0};
  std::atomic<bool> stopping{false};
  std::vector<std::thread> workers;
  bool done = false;

  void worker() {
    Image img;
    // Scaled mode: the whole raster decodes at out_tile/tile scale, the
    // grid slices at out_tile in SCALED space, and offsets report in
    // SOURCE pixels (tx * tile) so TileSpec/geocode math is unchanged.
    const int eff = out_tile > 0 ? out_tile : tile;
    const int scale_n = out_tile > 0 ? 8 * out_tile / tile : 8;
    while (!stopping) {
      size_t i = next_path.fetch_add(1);
      if (i >= paths.size()) break;
      img.rgb.clear();
      if (!decode_any(paths[i].c_str(), &img, scale_n)) continue;
      int nx = img.w <= eff ? 1 : img.w / eff;
      int ny = img.h <= eff ? 1 : img.h / eff;
      for (int tx = 0; tx < nx && !stopping; ++tx) {
        for (int ty = 0; ty < ny && !stopping; ++ty) {
          TileRec rec;
          rec.path_idx = int(i);
          rec.x_off = tx * tile;
          rec.y_off = ty * tile;
          rec.pixels.assign(size_t(eff) * eff * 3, 0);
          int sx = tx * eff, sy = ty * eff;
          int copy_w = std::min(eff, img.w - sx);
          int copy_h = std::min(eff, img.h - sy);
          for (int r = 0; r < copy_h; ++r) {
            std::memcpy(rec.pixels.data() + size_t(r) * eff * 3,
                        img.rgb.data() + (size_t(sy + r) * img.w + sx) * 3,
                        size_t(copy_w) * 3);
          }
          std::unique_lock<std::mutex> lk(mu);
          cv_push.wait(lk, [&] { return stopping || int(queue.size()) < queue_depth; });
          if (stopping) break;
          queue.push_back(std::move(rec));
          cv_pop.notify_one();
        }
      }
    }
    if (live_workers.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lk(mu);
      done = true;
      cv_pop.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// Decode one image file to RGB8. Caller passes a buffer of cap bytes;
// returns 0 on success and writes w/h, -1 on decode failure, -2 if the
// buffer is too small (w/h still written so the caller can retry).
int aq_decode_image(const char* path, uint8_t* out, long cap, int* w, int* h) {
  Image img;
  if (!decode_any(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  if (long(img.rgb.size()) > cap) return -2;
  std::memcpy(out, img.rgb.data(), img.rgb.size());
  return 0;
}

static void* loader_create_impl(const char** paths, int n_paths, int tile,
                                int out_tile, int n_threads, int queue_depth) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->tile = tile;
  l->out_tile = out_tile;
  l->queue_depth = queue_depth > 0 ? queue_depth : 64;
  int nt = n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, 64));
  l->live_workers = nt;
  for (int i = 0; i < nt; ++i) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

void* aq_loader_create(const char** paths, int n_paths, int tile, int n_threads,
                       int queue_depth) {
  return loader_create_impl(paths, n_paths, tile, 0, n_threads, queue_depth);
}

// Pop up to cap tiles into images (cap*tile*tile*3 bytes) and per-tile
// metadata arrays. Blocks until at least one tile or end of stream.
// Returns the tile count (0 = end of stream, -1 = null handle).
// Scaled-decode variants. aq_decode_image_scaled decodes with DCT-domain
// downscale to the largest N/8 scale whose max side stays >= target
// (target <= 0 = full size). aq_loader_create2 adds out_tile (see Loader).
int aq_decode_image_scaled(const char* path, uint8_t* out, long cap, int* w,
                           int* h, int target) {
  Image img;
  int scale_n = 8;
  if (target > 0) {
    // peek dimensions from the header to pick the scale
    std::vector<uint8_t> data;
    if (!read_file(path, &data) || data.size() < 4) return -1;
    if (data[0] == 0xFF && data[1] == 0xD8) {
      jpeg_decompress_struct cinfo;
      JpegErr jerr;
      cinfo.err = jpeg_std_error(&jerr.mgr);
      jerr.mgr.error_exit = jpeg_err_exit;
      if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
      }
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, data.data(), data.size());
      jpeg_read_header(&cinfo, TRUE);
      int full = std::max(int(cinfo.image_width), int(cinfo.image_height));
      jpeg_destroy_decompress(&cinfo);
      if (full > target) scale_n = std::min(8, (8 * target + full - 1) / full);
      if (scale_n < 1) scale_n = 1;
    }
  }
  if (!decode_any(path, &img, scale_n)) return -1;
  *w = img.w;
  *h = img.h;
  if (long(img.rgb.size()) > cap) return -2;
  std::memcpy(out, img.rgb.data(), img.rgb.size());
  return 0;
}

void* aq_loader_create2(const char** paths, int n_paths, int tile,
                        int out_tile, int n_threads, int queue_depth) {
  if (out_tile > 0 && (out_tile >= tile || (8 * out_tile) % tile != 0)) {
    return nullptr;  // scale must be a proper N/8 fraction of the tile
  }
  return loader_create_impl(paths, n_paths, tile, out_tile, n_threads,
                            queue_depth);
}

int aq_loader_next(void* handle, uint8_t* images, int cap, int* path_idx,
                   int* x_off, int* y_off) {
  // aq_loader_create/create2 return nullptr on invalid arguments; a raw
  // C caller that skips that check must get an error, not a segfault.
  if (handle == nullptr) return -1;
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_pop.wait(lk, [&] { return !l->queue.empty() || l->done; });
  int n = 0;
  const int eff = l->out_tile > 0 ? l->out_tile : l->tile;
  size_t tile_bytes = size_t(eff) * eff * 3;
  while (n < cap && !l->queue.empty()) {
    TileRec& rec = l->queue.front();
    std::memcpy(images + size_t(n) * tile_bytes, rec.pixels.data(), tile_bytes);
    path_idx[n] = rec.path_idx;
    x_off[n] = rec.x_off;
    y_off[n] = rec.y_off;
    l->queue.pop_front();
    ++n;
  }
  l->cv_push.notify_all();
  return n;
}

void aq_loader_destroy(void* handle) {
  if (handle == nullptr) return;  // destroying a failed create is a no-op
  auto* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stopping = true;  // workers exit their loops instead of refilling
    l->queue.clear();
  }
  l->cv_push.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
