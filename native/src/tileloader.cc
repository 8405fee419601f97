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

bool decode_jpeg(const uint8_t* data, size_t len, Image* out) {
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

bool decode_any(const char* path, Image* out) {
  std::vector<uint8_t> data;
  if (!read_file(path, &data) || data.size() < 4) return false;
  if (data[0] == 0xFF && data[1] == 0xD8) return decode_jpeg(data.data(), data.size(), out);
  if ((data[0] == 'I' && data[1] == 'I') || (data[0] == 'M' && data[1] == 'M'))
    return decode_tiff(path, out);
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
    while (!stopping) {
      size_t i = next_path.fetch_add(1);
      if (i >= paths.size()) break;
      img.rgb.clear();
      if (!decode_any(paths[i].c_str(), &img)) continue;
      int nx = img.w <= tile ? 1 : img.w / tile;
      int ny = img.h <= tile ? 1 : img.h / tile;
      for (int tx = 0; tx < nx && !stopping; ++tx) {
        for (int ty = 0; ty < ny && !stopping; ++ty) {
          TileRec rec;
          rec.path_idx = int(i);
          rec.x_off = tx * tile;
          rec.y_off = ty * tile;
          rec.pixels.assign(size_t(tile) * tile * 3, 0);
          int copy_w = std::min(tile, img.w - rec.x_off);
          int copy_h = std::min(tile, img.h - rec.y_off);
          for (int r = 0; r < copy_h; ++r) {
            std::memcpy(rec.pixels.data() + size_t(r) * tile * 3,
                        img.rgb.data() + (size_t(rec.y_off + r) * img.w + rec.x_off) * 3,
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

void* aq_loader_create(const char** paths, int n_paths, int tile, int n_threads,
                       int queue_depth) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_paths);
  l->tile = tile;
  l->queue_depth = queue_depth > 0 ? queue_depth : 64;
  int nt = n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, 64));
  l->live_workers = nt;
  for (int i = 0; i < nt; ++i) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Pop up to cap tiles into images (cap*tile*tile*3 bytes) and per-tile
// metadata arrays. Blocks until at least one tile or end of stream.
// Returns the tile count (0 = end of stream).
int aq_loader_next(void* handle, uint8_t* images, int cap, int* path_idx,
                   int* x_off, int* y_off) {
  auto* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_pop.wait(lk, [&] { return !l->queue.empty() || l->done; });
  int n = 0;
  size_t tile_bytes = size_t(l->tile) * l->tile * 3;
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
