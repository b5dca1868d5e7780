// ndpihuge.cpp — NDPI levels whose JPEG streams exceed JPEG's 65535-px
// dimension limit.
//
// Hamamatsu writes each NDPI pyramid level as one JPEG-compressed strip.
// When a level is wider (or taller) than the SOF dimension fields can
// express, the scanner stores zeros there and the true size only exists in
// the TIFF ImageWidth/ImageLength tags; libjpeg then refuses the stream,
// which is why stock libtiff (wsireader.cpp) cannot decode these levels.
// OpenSlide — the reference's reader for .ndpi (reference
// src/stamp/preprocessing/__init__.py:43-56) — reconstructs them through
// the JPEG restart-marker mechanism.  This backend does the same via
// RtJpeg (jpegrt.h): scan the restart chunks once, then decode any chunk
// as a standalone mini-JPEG with the SOF patched to the chunk size.  The
// vendor's NDPI_MCU_STARTS offset table (tag 65426) is deliberately not
// trusted; the standards-based scan costs one sequential pass per level,
// paid lazily on that level's first read.
//
// Files stay below 4 GiB on this path (larger ones carry wrapped offsets
// and route to ndpi.cpp); libtiff remains usable for the *tags* and for
// decoding the pyramid levels that are ordinary-sized.

#include "islide.h"

#include <tiffio.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "jpegrt.h"
#include "rtutil.h"

namespace {

constexpr int64_t kJpegDimLimit = 65500;  // libjpeg's hard per-axis cap

struct HugeLevel {
  uint16_t dir_index = 0;
  int64_t width = 0, height = 0;
  bool huge_jpeg = false;      // needs restart-marker reconstruction
  int64_t strip_off = 0, strip_len = 0;
  std::unique_ptr<RtJpeg> jpeg;  // lazy; only for huge_jpeg levels
  bool jpeg_failed = false;      // scan failed once — don't retry
};

class NdpiHugeSlide : public ISlide {
 public:
  // nullptr when the file has no huge-JPEG level (caller falls through to
  // the ordinary libtiff slide) OR on a real open error (wsi error set).
  static NdpiHugeSlide* open(const char* path, bool* applicable);
  ~NdpiHugeSlide() override {
    if (tif_) TIFFClose(tif_);
  }

  int64_t width() const override { return levels_[0].width; }
  int64_t height() const override { return levels_[0].height; }
  int32_t level_count() const override { return (int32_t)levels_.size(); }
  int64_t level_width(int32_t l) const override {
    return valid(l) ? levels_[l].width : -1;
  }
  int64_t level_height(int32_t l) const override {
    return valid(l) ? levels_[l].height : -1;
  }
  const std::string& description() const override { return description_; }
  double mpp() const override { return mpp_; }
  int64_t decode_errors() const override { return decode_errors_; }

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override {
    return read_from(0, x, y, w, h, (uint8_t*)out);
  }
  int32_t read_level(int32_t l, void* out) override {
    if (!valid(l)) return 1;
    if (levels_[l].huge_jpeg)
      return read_from(l, 0, 0, levels_[l].width, levels_[l].height,
                       (uint8_t*)out);
    if (!TIFFSetDirectory(tif_, levels_[l].dir_index)) return 2;
    if (!TIFFReadRGBAImageOriented(tif_, (uint32_t)levels_[l].width,
                                   (uint32_t)levels_[l].height,
                                   (uint32_t*)out, ORIENTATION_TOPLEFT, 0))
      return 3;
    return 0;
  }

 private:
  NdpiHugeSlide() : cache_(128u << 20) {}

  bool valid(int32_t l) const { return l >= 0 && l < (int32_t)levels_.size(); }
  RtJpeg* level_jpeg(int32_t l);
  int32_t read_from(int32_t l, int64_t x, int64_t y, int64_t w, int64_t h,
                    uint8_t* out);
  const std::vector<uint8_t>* chunk(int32_t l, RtJpeg& j, int32_t cx,
                                    int32_t cy);

  TIFF* tif_ = nullptr;
  std::string path_;
  std::vector<HugeLevel> levels_;  // sorted by area, levels_[0] = full res
  std::string description_;
  double mpp_ = -1.0;
  int64_t decode_errors_ = 0;
  WsiChunkCache cache_;
};

// Lazily scan the level's embedded stream (one sequential pass).
RtJpeg* NdpiHugeSlide::level_jpeg(int32_t l) {
  HugeLevel& lvl = levels_[l];
  if (lvl.jpeg) return lvl.jpeg.get();
  if (lvl.jpeg_failed) return nullptr;
  auto j = std::make_unique<RtJpeg>();
  std::string err;
  if (!j->open_span(path_, lvl.strip_off, lvl.strip_len, lvl.width,
                    lvl.height, &err)) {
    set_wsi_error("NDPI huge level: " + err);
    lvl.jpeg_failed = true;
    return nullptr;
  }
  lvl.jpeg = std::move(j);
  return lvl.jpeg.get();
}

const std::vector<uint8_t>* NdpiHugeSlide::chunk(int32_t l, RtJpeg& j,
                                                 int32_t cx, int32_t cy) {
  const uint64_t key = ((uint64_t)(uint32_t)l << 56) |
                       ((uint64_t)(uint32_t)cy << 24) | (uint32_t)cx;
  if (const auto* hit = cache_.get(key)) return hit;
  std::vector<uint8_t> rgb;
  if (!j.decode_chunk(cx, cy, &rgb)) {
    ++decode_errors_;
    set_wsi_error("NDPI: undecodable restart chunk, rendered as background");
    return nullptr;
  }
  return cache_.put(key, std::move(rgb));
}

int32_t NdpiHugeSlide::read_from(int32_t l, int64_t x, int64_t y, int64_t w,
                                 int64_t h, uint8_t* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  wsi_fill_white(out, w * h);
  HugeLevel& lvl = levels_[l];
  if (!lvl.huge_jpeg) return 4;  // read_from is only for huge levels
  RtJpeg* j = level_jpeg(l);
  if (!j) return 5;
  const int64_t x0 = std::max<int64_t>(0, x);
  const int64_t y0 = std::max<int64_t>(0, y);
  const int64_t x1 = std::min<int64_t>(lvl.width, x + w);
  const int64_t y1 = std::min<int64_t>(lvl.height, y + h);
  if (x0 >= x1 || y0 >= y1) return 0;
  const int32_t cx0 = (int32_t)(x0 / j->chunk_w());
  const int32_t cy0 = (int32_t)(y0 / j->chunk_h());
  const int32_t cx1 = (int32_t)((x1 - 1) / j->chunk_w());
  const int32_t cy1 = (int32_t)((y1 - 1) / j->chunk_h());
  for (int32_t cy = cy0; cy <= cy1; ++cy) {
    for (int32_t cx = cx0; cx <= cx1; ++cx) {
      const auto* rgb = chunk(l, *j, cx, cy);
      if (!rgb) continue;  // background stays — resilience over abort
      wsi_blit_rgb(rgb->data(), j->chunk_px_w(cx), j->chunk_px_h(cy),
                   (int64_t)cx * j->chunk_w(), (int64_t)cy * j->chunk_h(),
                   x, y, w, h, out);
    }
  }
  return 0;
}

NdpiHugeSlide* NdpiHugeSlide::open(const char* path, bool* applicable) {
  *applicable = false;
  TIFF* tif = TIFFOpen(path, "rm");
  if (!tif) return nullptr;  // let the ordinary open report the error

  struct DirInfo {
    uint16_t idx;
    int64_t w, h;
    bool huge;
    int64_t off, len;
  };
  std::vector<DirInfo> dirs;
  uint16_t idx = 0;
  std::string description;
  do {
    uint32_t w = 0, h = 0;
    uint16_t comp = COMPRESSION_NONE;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    TIFFGetFieldDefaulted(tif, TIFFTAG_COMPRESSION, &comp);
    if (idx == 0) {
      char* desc = nullptr;
      if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc)
        description = desc;
    }
    if (w > 0 && h > 0) {
      DirInfo d{idx, (int64_t)w, (int64_t)h, false, 0, 0};
      // a huge level: JPEG-in-one-strip with at least one axis beyond what
      // the SOF fields can express
      if ((comp == COMPRESSION_JPEG || comp == COMPRESSION_OJPEG) &&
          !TIFFIsTiled(tif) &&
          ((int64_t)w > kJpegDimLimit || (int64_t)h > kJpegDimLimit)) {
        uint64_t* offs = nullptr;
        uint64_t* cnts = nullptr;
        uint32_t nstrips = TIFFNumberOfStrips(tif);
        if (nstrips == 1 &&
            TIFFGetField(tif, TIFFTAG_STRIPOFFSETS, &offs) &&
            TIFFGetField(tif, TIFFTAG_STRIPBYTECOUNTS, &cnts)) {
          d.huge = true;
          d.off = (int64_t)offs[0];
          d.len = (int64_t)cnts[0];
        }
      }
      dirs.push_back(d);
    }
    idx++;
  } while (TIFFReadDirectory(tif));

  const bool any_huge =
      std::any_of(dirs.begin(), dirs.end(),
                  [](const DirInfo& d) { return d.huge; });
  if (dirs.empty() || !any_huge) {
    TIFFClose(tif);
    return nullptr;  // ordinary file — libtiff path handles it
  }
  *applicable = true;

  // keep directories on level 0's pyramid (aspect within 5%), same policy
  // as the ordinary TIFF slide
  auto main_it = std::max_element(
      dirs.begin(), dirs.end(), [](const DirInfo& a, const DirInfo& b) {
        return a.w * a.h < b.w * b.h;
      });
  const double aspect = (double)main_it->w / (double)main_it->h;

  NdpiHugeSlide* s = new NdpiHugeSlide();
  s->tif_ = tif;
  s->path_ = path;
  s->description_ = description;
  for (const auto& d : dirs) {
    const double a = (double)d.w / (double)d.h;
    if (std::abs(a - aspect) / aspect >= 0.05) continue;
    HugeLevel lvl;
    lvl.dir_index = d.idx;
    lvl.width = d.w;
    lvl.height = d.h;
    lvl.huge_jpeg = d.huge;
    lvl.strip_off = d.off;
    lvl.strip_len = d.len;
    s->levels_.push_back(std::move(lvl));
  }
  std::sort(s->levels_.begin(), s->levels_.end(),
            [](const HugeLevel& a, const HugeLevel& b) {
              return a.width * a.height > b.width * b.height;
            });
  if (s->levels_.empty() || !s->levels_[0].huge_jpeg) {
    // pyramid shape we don't understand — fail loudly rather than guess
    set_wsi_error("NDPI: huge-JPEG level outside the main pyramid");
    delete s;
    return nullptr;
  }

  // NDPI stores resolution in px/cm on every level
  TIFFSetDirectory(tif, s->levels_[0].dir_index);
  float xres = 0.0f;
  uint16_t unit = RESUNIT_INCH;
  if (TIFFGetField(tif, TIFFTAG_XRESOLUTION, &xres) && xres > 0) {
    TIFFGetFieldDefaulted(tif, TIFFTAG_RESOLUTIONUNIT, &unit);
    if (unit == RESUNIT_CENTIMETER)
      s->mpp_ = 10000.0 / xres;
    else if (unit == RESUNIT_INCH)
      s->mpp_ = 25400.0 / xres;
  }
  return s;
}

}  // namespace

ISlide* open_ndpi_huge_slide(const char* path, bool* applicable) {
  return NdpiHugeSlide::open(path, applicable);
}
