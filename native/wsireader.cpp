// wsireader — native whole-slide-image reader for stamp_tpu.
//
// Replaces the OpenSlide dependency of the reference pipeline (reference
// src/stamp/preprocessing/tiling.py:24) with a small, self-contained reader:
//   * TiffSlide — libtiff-based pyramidal TIFF / Aperio SVS / Hamamatsu NDPI
//     (JPEG / LZW / Deflate compressed; JPEG2000-coded SVS is exposed through
//     the raw-tile interface and decoded host-side by Pillow/openjpeg).
//   * MiraxSlide — 3DHISTECH MIRAX (.mrxs) multi-file container (mirax.cpp).
// Exposed as a C ABI consumed from Python via ctypes
// (stamp_tpu/preprocessing/wsi.py).
//
// Design notes:
//  * read_region decodes only the tiles intersecting the request and copies
//    them into the caller-provided RGBA buffer — no full-level decode.
//  * per-handle state is NOT thread safe (libtiff handles are not); callers
//    that want parallel reads open one handle per worker thread.  Handles are
//    cheap (no pixel data is touched at open time).
//  * pyramid levels are TIFF directories whose aspect ratio matches level 0;
//    thumbnails read the smallest sufficient level.

#include "islide.h"
#include "j2k.h"
#include "jxr.h"

#include <tiffio.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <exception>
#include <mutex>
#include <string>
#include <thread>
#include <utility>
#include <vector>

namespace {

thread_local std::string g_last_error;

struct Level {
  uint16_t dir_index;
  int64_t width;
  int64_t height;
};

bool is_supported_compression(TIFF* tif) {
  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &comp);
  // 33003/33005: Aperio JPEG2000 — not decodable by stock libtiff.
  if (comp == 33003 || comp == 33005) return false;
  return TIFFIsCODECConfigured(comp) != 0;
}

class TiffSlide : public ISlide {
 public:
  static TiffSlide* open(const char* path);
  ~TiffSlide() override {
    if (tif_) TIFFClose(tif_);
  }

  int64_t width() const override { return levels_[0].width; }
  int64_t height() const override { return levels_[0].height; }
  int32_t level_count() const override { return (int32_t)levels_.size(); }
  int64_t level_width(int32_t level) const override {
    if (level < 0 || level >= (int32_t)levels_.size()) return -1;
    return levels_[level].width;
  }
  int64_t level_height(int32_t level) const override {
    if (level < 0 || level >= (int32_t)levels_.size()) return -1;
    return levels_[level].height;
  }
  const std::string& description() const override { return description_; }
  double mpp() const override { return mpp_; }
  int32_t compression() const override { return (int32_t)compression_; }
  bool raw_only() const override { return raw_only_; }

  int32_t tile_width(int32_t level) override {
    if (!set_dir(level) || !TIFFIsTiled(tif_)) return 0;
    uint32_t tw = 0;
    TIFFGetField(tif_, TIFFTAG_TILEWIDTH, &tw);
    return (int32_t)tw;
  }
  int32_t tile_height(int32_t level) override {
    if (!set_dir(level) || !TIFFIsTiled(tif_)) return 0;
    uint32_t th = 0;
    TIFFGetField(tif_, TIFFTAG_TILELENGTH, &th);
    return (int32_t)th;
  }

  int64_t read_raw_tile(int32_t level, int64_t x, int64_t y, void* buf,
                        int64_t bufsize) override;
  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override;
  int32_t read_level(int32_t level, void* out) override;

 private:
  bool set_dir(int32_t level) {
    if (level < 0 || level >= (int32_t)levels_.size()) return false;
    return TIFFSetDirectory(tif_, levels_[level].dir_index) != 0;
  }
  void parse_mpp();

  // Read the raw J2K codestream of the tile containing (x, y) at `level`.
  // Touches the shared TIFF handle — callers serialize via tiff_mu_.
  bool read_j2k_raw(int32_t level, int64_t x, int64_t y,
                    std::vector<uint8_t>* raw, std::string* err);

  // Decode every J2K tile intersecting the level-`level` rectangle
  // [rx, rx+rw) x [ry, ry+rh) and blit into dst (RGBA rh x rw, top-left
  // origin, already background-filled).  Codestream reads are serial
  // (libtiff handle); decodes fan out over hardware threads — J2K entropy
  // decode dominates the cost and tiles are independent.
  int32_t j2k_blit(int32_t level, int64_t rx, int64_t ry, int64_t rw,
                   int64_t rh, uint8_t* dst);

  TIFF* tif_ = nullptr;
  std::vector<Level> levels_;  // sorted by size, levels[0] = full resolution
  std::string description_;
  double mpp_ = -1.0;
  uint16_t compression_ = 0;  // level-0 compression tag
  bool raw_only_ = false;     // codec not configured (e.g. Aperio JPEG2000
                              // without libopenjp2): only raw tile access
                              // works; the Python layer decodes host-side
  bool j2k_ = false;          // Aperio 33003/33005 decoded natively via
                              // the system libopenjp2 (native/j2k.cpp)
  std::mutex tiff_mu_;        // serializes TIFF access during j2k_blit
};

void TiffSlide::parse_mpp() {
  // Aperio SVS: "...|MPP = 0.2529|..."
  const std::string& d = description_;
  size_t pos = d.find("MPP");
  if (pos != std::string::npos) {
    pos = d.find('=', pos);
    if (pos != std::string::npos) {
      try {
        double v = std::stod(d.substr(pos + 1));
        if (v > 0 && v < 1000) {
          mpp_ = v;
          return;
        }
      } catch (...) {
      }
    }
  }
  // Generic TIFF resolution tags.
  TIFFSetDirectory(tif_, levels_[0].dir_index);
  float xres = 0.0f;
  uint16_t res_unit = RESUNIT_INCH;
  if (TIFFGetField(tif_, TIFFTAG_XRESOLUTION, &xres) && xres > 0) {
    TIFFGetFieldDefaulted(tif_, TIFFTAG_RESOLUTIONUNIT, &res_unit);
    if (res_unit == RESUNIT_CENTIMETER) {
      mpp_ = 10000.0 / xres;  // px per cm → µm per px
    } else if (res_unit == RESUNIT_INCH) {
      mpp_ = 25400.0 / xres;
    }
  }
}

TiffSlide* TiffSlide::open(const char* path) {
  TIFF* tif = TIFFOpen(path, "rm");  // m: no mmap (large files)
  if (!tif) {
    set_wsi_error("libtiff could not open the file");
    return nullptr;
  }

  TiffSlide* s = new TiffSlide;
  s->tif_ = tif;

  // Enumerate directories.
  struct DirInfo {
    uint16_t idx;
    int64_t w, h;
  };
  std::vector<DirInfo> dirs;
  uint16_t idx = 0;
  do {
    uint32_t w = 0, h = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    if (w > 0 && h > 0) {
      dirs.push_back({idx, (int64_t)w, (int64_t)h});
    }
    if (idx == 0) {
      char* desc = nullptr;
      if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc) {
        s->description_ = desc;
      }
    }
    idx++;
  } while (TIFFReadDirectory(tif));

  if (dirs.empty()) {
    set_wsi_error("no usable TIFF directories");
    delete s;
    return nullptr;
  }

  // Full resolution = largest directory.
  auto main_it = std::max_element(
      dirs.begin(), dirs.end(),
      [](const DirInfo& a, const DirInfo& b) { return a.w * a.h < b.w * b.h; });
  const double aspect = (double)main_it->w / (double)main_it->h;

  for (const auto& d : dirs) {
    const double a = (double)d.w / (double)d.h;
    // keep directories on the same pyramid (aspect within 5%)
    if (std::abs(a - aspect) / aspect < 0.05) {
      s->levels_.push_back({d.idx, d.w, d.h});
    }
  }
  std::sort(s->levels_.begin(), s->levels_.end(),
            [](const Level& a, const Level& b) {
              return a.width * a.height > b.width * b.height;
            });

  TIFFSetDirectory(tif, s->levels_[0].dir_index);
  TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &s->compression_);
  if (!is_supported_compression(tif)) {
    if ((s->compression_ == 33003 || s->compression_ == 33005) &&
        TIFFIsTiled(tif) && j2k::available()) {
      // Aperio JPEG2000: decode the tile codestreams natively through the
      // system libopenjp2 (native/j2k.cpp) — the dominant TCGA encoding.
      s->j2k_ = true;
    } else if (TIFFIsTiled(tif)) {
      // Unconfigured codec (or no libopenjp2): keep the handle open for
      // raw tile access; pixel decode happens host-side (PIL/openjpeg).
      s->raw_only_ = true;
    } else {
      set_wsi_error("unsupported TIFF compression on a non-tiled image");
      delete s;
      return nullptr;
    }
  }

  s->parse_mpp();
  return s;
}

// Raw (undecoded) tile bytes of tile containing (x, y) at `level`; returns
// byte count, or -1 on error, or -needed if the buffer is too small.
int64_t TiffSlide::read_raw_tile(int32_t level, int64_t x, int64_t y, void* buf,
                                 int64_t bufsize) {
  if (!set_dir(level) || !TIFFIsTiled(tif_)) return -1;
  uint32_t tile_index = TIFFComputeTile(tif_, (uint32_t)x, (uint32_t)y, 0, 0);
  tmsize_t size = TIFFTileSize64(tif_);
  uint64_t* bytecounts = nullptr;
  if (TIFFGetField(tif_, TIFFTAG_TILEBYTECOUNTS, &bytecounts) && bytecounts) {
    size = (tmsize_t)bytecounts[tile_index];
  }
  if (size > bufsize) return -(int64_t)size;
  tmsize_t n = TIFFReadRawTile(tif_, tile_index, buf, size);
  return (int64_t)n;
}

bool TiffSlide::read_j2k_raw(int32_t level, int64_t x, int64_t y,
                             std::vector<uint8_t>* raw, std::string* err) {
  if (!set_dir(level) || !TIFFIsTiled(tif_)) {
    *err = "J2K tile read on a non-tiled directory";
    return false;
  }
  const uint32_t tile_index =
      TIFFComputeTile(tif_, (uint32_t)x, (uint32_t)y, 0, 0);
  tmsize_t size = TIFFTileSize64(tif_);
  uint64_t* bytecounts = nullptr;
  if (TIFFGetField(tif_, TIFFTAG_TILEBYTECOUNTS, &bytecounts) && bytecounts) {
    size = (tmsize_t)bytecounts[tile_index];
  }
  // corrupt-file guard, same bound the MIRAX backend uses per tile payload
  if (size <= 0 || size > (tmsize_t)(256ll << 20)) {
    *err = "J2K tile has an implausible codestream size";
    return false;
  }
  raw->resize((size_t)size);
  tmsize_t n = TIFFReadRawTile(tif_, tile_index, raw->data(), size);
  if (n <= 0) {
    *err = "could not read the raw J2K tile codestream";
    return false;
  }
  raw->resize((size_t)n);
  return true;
}

int32_t TiffSlide::j2k_blit(int32_t level, int64_t rx, int64_t ry, int64_t rw,
                            int64_t rh, uint8_t* dst) {
  uint32_t tw = 0, th = 0;
  {
    std::lock_guard<std::mutex> lk(tiff_mu_);
    if (!set_dir(level)) return 2;
    TIFFGetField(tif_, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif_, TIFFTAG_TILELENGTH, &th);
  }
  if (tw == 0 || th == 0) return 3;

  const Level& lvl = levels_[level];
  const int64_t x0 = std::max<int64_t>(rx, 0);
  const int64_t y0 = std::max<int64_t>(ry, 0);
  const int64_t x1 = std::min<int64_t>(rx + rw, lvl.width);
  const int64_t y1 = std::min<int64_t>(ry + rh, lvl.height);
  if (x0 >= x1 || y0 >= y1) return 0;

  std::vector<std::pair<int64_t, int64_t>> jobs;
  for (int64_t ty = (y0 / th) * th; ty < y1; ty += th)
    for (int64_t tx = (x0 / tw) * tw; tx < x1; tx += tw)
      jobs.emplace_back(tx, ty);

  const j2k::ColorSpace space = compression_ == 33003
                                    ? j2k::ColorSpace::kYCbCr
                                    : j2k::ColorSpace::kRGB;
  std::atomic<size_t> next{0};
  std::atomic<bool> failed{false};
  std::mutex err_mu;
  std::string first_err;

  auto worker = [&]() {
    std::vector<uint8_t> raw, rgb;
    std::string err;
    while (!failed.load(std::memory_order_relaxed)) {
      const size_t i = next.fetch_add(1);
      if (i >= jobs.size()) break;
      const int64_t tx = jobs[i].first, ty = jobs[i].second;
      {
        std::lock_guard<std::mutex> lk(tiff_mu_);
        if (!read_j2k_raw(level, tx, ty, &raw, &err)) {
          std::lock_guard<std::mutex> ek(err_mu);
          if (first_err.empty()) first_err = err;
          failed = true;
          return;
        }
      }
      int dw = 0, dh = 0;
      if (!j2k::decode(raw.data(), raw.size(), space, &rgb, &dw, &dh, &err)) {
        std::lock_guard<std::mutex> ek(err_mu);
        if (first_err.empty()) first_err = "J2K tile decode failed: " + err;
        failed = true;
        return;
      }
      // blit the decoded tile's intersection with the request (regions of
      // distinct tiles are disjoint in dst, so no synchronization needed)
      const int64_t cx0 = std::max<int64_t>(tx, x0);
      const int64_t cx1 = std::min<int64_t>({tx + tw, x1, tx + dw});
      const int64_t cy0 = std::max<int64_t>(ty, y0);
      const int64_t cy1 = std::min<int64_t>({ty + th, y1, ty + dh});
      for (int64_t iy = cy0; iy < cy1; ++iy) {
        const uint8_t* src = rgb.data() + ((iy - ty) * dw + (cx0 - tx)) * 3;
        uint8_t* dst_row = dst + ((iy - ry) * rw + (cx0 - rx)) * 4;
        for (int64_t ix = cx0; ix < cx1; ++ix, src += 3, dst_row += 4) {
          dst_row[0] = src[0];
          dst_row[1] = src[1];
          dst_row[2] = src[2];
          dst_row[3] = 0xFF;
        }
      }
    }
  };

  size_t hw = std::max<size_t>(std::thread::hardware_concurrency(), 1);
  if (const char* env = std::getenv("WSI_J2K_THREADS")) {
    const long v = std::strtol(env, nullptr, 10);
    if (v >= 1 && v <= 256) hw = (size_t)v;
  }
  const size_t n_threads = std::min(hw, jobs.size());
  if (n_threads <= 1) {
    worker();  // single core / single tile: no thread spawn overhead
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (size_t i = 0; i < n_threads; ++i) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  if (failed.load()) {
    set_wsi_error(first_err.empty() ? "J2K decode failed" : first_err);
    return 4;
  }
  return 0;
}

// Read a level-0 region into out (RGBA, h×w×4, row-major top-left origin).
// Out-of-bounds areas are filled with opaque white (OpenSlide fills
// transparent black; white matches the background-rejection expectations of
// the tiling stage).
int32_t TiffSlide::read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                               void* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  const Level& lvl = levels_[0];
  if (!TIFFSetDirectory(tif_, lvl.dir_index)) return 2;

  uint8_t* dst = (uint8_t*)out;
  // background fill: white, opaque
  std::memset(dst, 0xFF, (size_t)w * h * 4);

  const int64_t x0 = std::max<int64_t>(x, 0);
  const int64_t y0 = std::max<int64_t>(y, 0);
  const int64_t x1 = std::min<int64_t>(x + w, lvl.width);
  const int64_t y1 = std::min<int64_t>(y + h, lvl.height);
  if (x0 >= x1 || y0 >= y1) return 0;  // fully outside

  if (TIFFIsTiled(tif_)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif_, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif_, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;

    if (j2k_) {
      // Aperio JPEG2000 path: decode intersecting tile codestreams natively
      // in parallel (top-down RGB8, unlike libtiff's bottom-up RGBA raster).
      return j2k_blit(0, x, y, w, h, dst);
    }

    std::vector<uint32_t> tile((size_t)tw * th);
    for (int64_t ty = (y0 / th) * th; ty < y1; ty += th) {
      for (int64_t tx = (x0 / tw) * tw; tx < x1; tx += tw) {
        if (!TIFFReadRGBATile(tif_, (uint32_t)tx, (uint32_t)ty, tile.data())) {
          return 4;
        }
        // TIFFReadRGBATile returns bottom-up rows; raster row r corresponds
        // to image row ty + (th - 1 - r).
        const int64_t cx0 = std::max<int64_t>(tx, x0);
        const int64_t cx1 = std::min<int64_t>(tx + tw, x1);
        const int64_t cy0 = std::max<int64_t>(ty, y0);
        const int64_t cy1 = std::min<int64_t>(ty + th, y1);
        for (int64_t iy = cy0; iy < cy1; ++iy) {
          const int64_t raster_row = th - 1 - (iy - ty);
          const uint32_t* src_row = tile.data() + raster_row * tw + (cx0 - tx);
          uint8_t* dst_row = dst + ((iy - y) * w + (cx0 - x)) * 4;
          std::memcpy(dst_row, src_row, (size_t)(cx1 - cx0) * 4);
        }
      }
    }
  } else {
    // Strip-organized TIFF (e.g. Hamamatsu NDPI).
    uint32_t rows_per_strip = 0;
    TIFFGetFieldDefaulted(tif_, TIFFTAG_ROWSPERSTRIP, &rows_per_strip);
    if (rows_per_strip == 0) rows_per_strip = (uint32_t)lvl.height;
    // guard: a single-strip gigapixel level would need an absurd buffer
    if ((uint64_t)lvl.width * rows_per_strip * 4 > (1ull << 32)) return 6;
    std::vector<uint32_t> strip((size_t)lvl.width * rows_per_strip);
    for (int64_t sy = (y0 / rows_per_strip) * rows_per_strip; sy < y1;
         sy += rows_per_strip) {
      if (!TIFFReadRGBAStrip(tif_, (uint32_t)sy, strip.data())) return 5;
      const int64_t rows = std::min<int64_t>(rows_per_strip, lvl.height - sy);
      const int64_t cy0 = std::max<int64_t>(sy, y0);
      const int64_t cy1 = std::min<int64_t>(sy + rows, y1);
      for (int64_t iy = cy0; iy < cy1; ++iy) {
        const int64_t raster_row = rows - 1 - (iy - sy);
        const uint32_t* src_row = strip.data() + raster_row * lvl.width + x0;
        uint8_t* dst_row = dst + ((iy - y) * w + (x0 - x)) * 4;
        std::memcpy(dst_row, src_row, (size_t)(x1 - x0) * 4);
      }
    }
  }
  return 0;
}

// Read an entire pyramid level into out (RGBA, levelheight×levelwidth×4).
int32_t TiffSlide::read_level(int32_t level, void* out) {
  if (!out || level < 0 || level >= (int32_t)levels_.size()) return 1;
  const Level& lvl = levels_[level];
  if (!TIFFSetDirectory(tif_, lvl.dir_index)) return 2;

  if (j2k_ && TIFFIsTiled(tif_)) {
    // thumbnail levels of Aperio J2K slides are J2K-tiled too
    uint8_t* dst = (uint8_t*)out;
    std::memset(dst, 0xFF, (size_t)lvl.width * lvl.height * 4);
    return j2k_blit(level, 0, 0, lvl.width, lvl.height, dst);
  }

  // TIFFReadRGBAImageOriented fills top-left origin directly.
  if (!TIFFReadRGBAImageOriented(tif_, (uint32_t)lvl.width,
                                 (uint32_t)lvl.height, (uint32_t*)out,
                                 ORIENTATION_TOPLEFT, 0)) {
    return 3;
  }
  return 0;
}

bool has_suffix_ci(const char* path, const char* suffix) {
  size_t lp = std::strlen(path), ls = std::strlen(suffix);
  if (lp < ls) return false;
  for (size_t i = 0; i < ls; ++i) {
    char a = path[lp - ls + i], b = suffix[i];
    if (std::tolower((unsigned char)a) != std::tolower((unsigned char)b))
      return false;
  }
  return true;
}

}  // namespace

void set_wsi_error(const std::string& msg) { g_last_error = msg; }

ISlide* open_tiff_slide(const char* path) { return TiffSlide::open(path); }

extern "C" {

// The ABI below is called from Python via ctypes: a C++ exception escaping
// it (bad_alloc/length_error from a corrupt file's claimed sizes) would
// std::terminate the *host process* — the caller's per-slide fail-safe
// never gets a chance.  Every entry point that can allocate converts
// exceptions into the named-error contract instead.

void* wsi_open(const char* path) try {
  set_wsi_error("");
  if (has_suffix_ci(path, ".mrxs")) return open_mirax_slide(path);
  if (has_suffix_ci(path, ".vms") || has_suffix_ci(path, ".vmu"))
    return open_vms_slide(path);
  if (has_suffix_ci(path, ".czi")) return open_czi_slide(path);
  if (has_suffix_ci(path, ".scn")) {
    // Leica collection semantics (macro exclusion, main-image stitch);
    // an .scn without the collection XML falls through to generic TIFF
    bool applicable = false;
    ISlide* s = open_scn_slide(path, &applicable);
    if (applicable || s) return s;  // nullptr on a real, named error
  }
  if (has_suffix_ci(path, ".bif")) {
    // Ventana semantics (iScan mpp, level markers, loud multi-AOI refusal)
    bool applicable = false;
    ISlide* s = open_bif_slide(path, &applicable);
    if (applicable || s) return s;
  }
  if (has_suffix_ci(path, ".qptiff") || has_suffix_ci(path, ".qptif")) {
    // Akoya semantics (ImageType pyramid, loud multiplexed-IF refusal)
    bool applicable = false;
    ISlide* s = open_qptiff_slide(path, &applicable);
    if (applicable || s) return s;
  }
  if (has_suffix_ci(path, ".ndpi")) {
    // classic-TIFF NDPI files over 4 GiB carry wrapped 32-bit offsets that
    // libtiff mis-reads; route them to the offset-reconstructing backend
    FILE* probe = std::fopen(path, "rb");
    if (probe) {
#ifdef _WIN32
      _fseeki64(probe, 0, SEEK_END);
      const int64_t size = _ftelli64(probe);
#else
      fseeko(probe, 0, SEEK_END);
      const int64_t size = (int64_t)ftello(probe);
#endif
      std::fclose(probe);
      if (size >= (int64_t)1 << 32) return open_ndpi_slide(path);
    }
    // levels beyond JPEG's 65535-px SOF limit need restart-marker
    // reconstruction (ndpihuge.cpp); ordinary files fall through
    bool applicable = false;
    ISlide* s = open_ndpi_huge_slide(path, &applicable);
    if (applicable) return s;  // may be nullptr on a real error
  }
  return open_tiff_slide(path);
} catch (const std::exception& e) {
  set_wsi_error(std::string("open failed: ") + e.what());
  return nullptr;
}

const char* wsi_last_error() { return g_last_error.c_str(); }

void wsi_close(void* handle) { delete (ISlide*)handle; }

int64_t wsi_width(void* handle) { return ((ISlide*)handle)->width(); }
int64_t wsi_height(void* handle) { return ((ISlide*)handle)->height(); }
int32_t wsi_level_count(void* handle) {
  return ((ISlide*)handle)->level_count();
}
int64_t wsi_level_width(void* handle, int32_t level) {
  return ((ISlide*)handle)->level_width(level);
}
int64_t wsi_level_height(void* handle, int32_t level) {
  return ((ISlide*)handle)->level_height(level);
}
const char* wsi_description(void* handle) {
  return ((ISlide*)handle)->description().c_str();
}
double wsi_mpp(void* handle) { return ((ISlide*)handle)->mpp(); }
int32_t wsi_compression(void* handle) {
  return ((ISlide*)handle)->compression();
}
int32_t wsi_raw_only(void* handle) {
  return ((ISlide*)handle)->raw_only() ? 1 : 0;
}
int64_t wsi_decode_errors(void* handle) {
  return ((ISlide*)handle)->decode_errors();
}
int32_t wsi_tile_width(void* handle, int32_t level) {
  return ((ISlide*)handle)->tile_width(level);
}
int32_t wsi_tile_height(void* handle, int32_t level) {
  return ((ISlide*)handle)->tile_height(level);
}
int64_t wsi_read_raw_tile(void* handle, int32_t level, int64_t x, int64_t y,
                          void* buf, int64_t bufsize) try {
  return ((ISlide*)handle)->read_raw_tile(level, x, y, buf, bufsize);
} catch (const std::exception& e) {
  set_wsi_error(std::string("raw tile read failed: ") + e.what());
  return -1;
}
int32_t wsi_read_region(void* handle, int64_t x, int64_t y, int64_t w,
                        int64_t h, void* out) try {
  if (!handle) return 1;
  return ((ISlide*)handle)->read_region(x, y, w, h, out);
} catch (const std::exception& e) {
  set_wsi_error(std::string("region read failed: ") + e.what());
  return 9;
}
int32_t wsi_read_level(void* handle, int32_t level, void* out) try {
  if (!handle) return 1;
  return ((ISlide*)handle)->read_level(level, out);
} catch (const std::exception& e) {
  set_wsi_error(std::string("level read failed: ") + e.what());
  return 9;
}

// --- JPEG XR codec surface (native/jxr.cpp) ---------------------------------
// Fixture encoding + direct decode for the tests; czi.cpp uses the C++ API.

// kind: 0 = packed RGB8, 1 = Gray8, 2 = Gray16 (native-endian u16).
// Returns the encoded size and stores a malloc'd buffer in *out, or -1.
int64_t wsi_jxr_encode(const void* data, int32_t w, int32_t h, int32_t kind,
                       int32_t internal_clr, int32_t bands, int32_t overlap,
                       int32_t qp, int32_t trim, uint8_t** out) try {
  set_wsi_error("");
  jxr::EncodeParams p;
  p.internal_clr = internal_clr;
  p.bands = bands;
  p.overlap = overlap;
  p.qp_dc = p.qp_lp = p.qp_hp = qp;
  p.trim_flexbits = trim;
  std::vector<uint8_t> enc;
  std::string err;
  bool ok = false;
  if (kind == 0)
    ok = jxr::encode_rgb8((const uint8_t*)data, w, h, p, &enc, &err);
  else if (kind == 1)
    ok = jxr::encode_gray8((const uint8_t*)data, w, h, p, &enc, &err);
  else if (kind == 2)
    ok = jxr::encode_gray16((const uint16_t*)data, w, h, p, &enc, &err);
  else
    err = "unknown input kind";
  if (!ok) {
    set_wsi_error("JPEG-XR encode failed: " + err);
    return -1;
  }
  *out = (uint8_t*)std::malloc(enc.size());
  if (!*out) return -1;
  std::memcpy(*out, enc.data(), enc.size());
  return (int64_t)enc.size();
} catch (const std::exception& e) {
  set_wsi_error(std::string("JPEG-XR encode failed: ") + e.what());
  return -1;
}

// Decodes a .jxr container / bare codestream to packed RGB8 in *out
// (malloc'd); returns 0 and fills w/h, or 1 with the named error set.
int32_t wsi_jxr_decode(const uint8_t* data, int64_t len, uint8_t** out,
                       int32_t* w, int32_t* h) try {
  set_wsi_error("");
  std::vector<uint8_t> rgb;
  int dw = 0, dh = 0;
  std::string err;
  if (!jxr::decode(data, (size_t)len, &rgb, &dw, &dh, &err)) {
    set_wsi_error(err);
    return 1;
  }
  *out = (uint8_t*)std::malloc(rgb.size());
  if (!*out) return 1;
  std::memcpy(*out, rgb.data(), rgb.size());
  *w = dw;
  *h = dh;
  return 0;
} catch (const std::exception& e) {
  set_wsi_error(std::string("JPEG-XR decode failed: ") + e.what());
  return 1;
}

void wsi_jxr_free(uint8_t* p) { std::free(p); }

// PIL-exact L24 grayscale (libImaging Convert.c coefficients, fixed-point
// round-half-up).  The tiling hot loop scores supertiles on this plane;
// computing it here instead of in numpy ufuncs keeps the Python GIL
// released for the whole conversion (ctypes drops it for the call), which
// is what lets tiling worker threads scale across host cores.  The loop
// auto-vectorizes under -O3.
void wsi_luma_l24(const uint8_t* rgb, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    out[i] = (uint8_t)((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
  }
}

int32_t wsi_jxr_selftest() try { return jxr::selftest(); } catch (...) {
  return -1;
}

}  // extern "C"
