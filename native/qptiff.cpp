// qptiff.cpp — Akoya/PerkinElmer QPTIFF (.qptiff) vendor semantics.
//
// The reference lists .qptiff among its OpenSlide-opened extensions
// (reference preprocessing/__init__.py:43-56).  A QPTIFF is a pyramidal
// TIFF whose directories each carry a `<PerkinElmer-QPI-ImageDescription>`
// XML document with an `<ImageType>` element classifying the directory:
//
//   FullResolution    — level-0 image (one per channel in multiplexed IF)
//   ReducedResolution — pyramid level (again one per channel for IF)
//   Thumbnail / Overview / Label — auxiliary images
//
// What generic-TIFF reading gets wrong, and what this backend fixes:
//   * Multiplexed immunofluorescence exports carry one SAME-SIZED grayscale
//     directory per band at every level.  The generic size/aspect pyramid
//     selector would stack all of them as duplicate "levels" and read an
//     arbitrary band as the slide — silently wrong for an H&E pipeline.
//     We refuse loudly by name instead (the per-slide fail-safe in
//     extract_ names the slide and the cohort continues).
//   * The Thumbnail directory has the same aspect as the pyramid (it is a
//     downsample of it) so the aspect filter cannot exclude it; the
//     ImageType marker can.  Thumbnails are resampled captures, not exact
//     pyramid levels, so they must not be selectable for tiling.
//   * Brightfield RGB files read normally: pyramid = FullResolution +
//     ReducedResolution directories, mpp from the standard TIFF resolution
//     tags (QPTIFF writes px/cm), auxiliaries excluded.
//
// Zero-egress caveat (same class as native/bif.cpp): no real Akoya file
// exists in this environment; the element names follow Akoya's published
// QPTIFF layout documentation.  Unknown layouts fail by name, never
// silently wrong.

#include "islide.h"
#include "tiffblit.h"

#include <tiffio.h>

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct QpLevel {
  uint16_t dir_index;
  int64_t width;
  int64_t height;
};

// Extract the text of a simple XML element (<name>text</name>) from raw
// document text.  Returns the empty string when absent.
std::string element_text(const std::string& xml, const char* name) {
  const std::string open = std::string("<") + name + ">";
  const std::string close = std::string("</") + name + ">";
  const size_t at = xml.find(open);
  if (at == std::string::npos) return "";
  const size_t start = at + open.size();
  const size_t end = xml.find(close, start);
  if (end == std::string::npos) return "";
  return xml.substr(start, end - start);
}

class QptiffSlide : public ISlide {
 public:
  static QptiffSlide* open(const char* path, bool* applicable);
  ~QptiffSlide() override {
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

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override {
    return region_at_level(0, x, y, w, h, (uint8_t*)out);
  }
  int32_t read_level(int32_t level, void* out) override {
    if (level < 0 || level >= (int32_t)levels_.size()) return 1;
    return region_at_level(level, 0, 0, levels_[level].width,
                           levels_[level].height, (uint8_t*)out);
  }

 private:
  int32_t region_at_level(int32_t level, int64_t x, int64_t y, int64_t w,
                          int64_t h, uint8_t* dst) {
    const QpLevel& lvl = levels_[level];
    if (!TIFFSetDirectory(tif_, lvl.dir_index)) return 2;
    return tiff_rgba_region(tif_, lvl.width, lvl.height, x, y, w, h, dst);
  }

  TIFF* tif_ = nullptr;
  std::vector<QpLevel> levels_;  // size-sorted, levels_[0] = full resolution
  std::string description_;
  double mpp_ = -1.0;
};

QptiffSlide* QptiffSlide::open(const char* path, bool* applicable) {
  *applicable = false;
  TIFF* tif = TIFFOpen(path, "rm");
  if (!tif) {
    set_wsi_error("libtiff could not open the file");
    return nullptr;
  }

  // sniff: directory 0 must carry the QPI description document
  {
    char* desc = nullptr;
    if (!TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) || !desc ||
        !std::strstr(desc, "PerkinElmer-QPI")) {
      TIFFClose(tif);  // not a QPI export: fall through to generic TIFF
      return nullptr;
    }
  }
  *applicable = true;

  // classify every directory by its ImageType element
  struct DirInfo {
    uint16_t idx;
    int64_t w, h;
    uint16_t samples;
    std::string image_type;
  };
  std::vector<DirInfo> dirs;
  uint16_t idx = 0;
  std::string dir0_desc;
  do {
    uint32_t w = 0, h = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    uint16_t samples = 1;
    TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &samples);
    char* d = nullptr;
    std::string dd;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &d) && d) dd = d;
    if (idx == 0) dir0_desc = dd;
    if (w > 0 && h > 0)
      dirs.push_back(
          {idx, (int64_t)w, (int64_t)h, samples, element_text(dd, "ImageType")});
    ++idx;
  } while (TIFFReadDirectory(tif));

  int full_res = 0;
  bool full_res_gray = false;
  for (const auto& d : dirs) {
    if (d.image_type == "FullResolution") {
      ++full_res;
      if (d.samples < 3) full_res_gray = true;
    }
  }
  if (full_res == 0) {
    set_wsi_error(
        "QPTIFF: no FullResolution directory — unrecognized QPI layout");
    TIFFClose(tif);
    return nullptr;
  }
  // one grayscale directory per band at each level: multiplexed IF; the
  // raw directory grid has no RGB rendering an H&E pipeline could tile
  if (full_res > 1 || full_res_gray) {
    set_wsi_error(
        "QPTIFF: multiplexed immunofluorescence export (" +
        std::to_string(full_res) +
        " FullResolution band(s), grayscale) — this pipeline tiles "
        "brightfield RGB slides; export a brightfield/RGB QPTIFF instead");
    TIFFClose(tif);
    return nullptr;
  }

  QptiffSlide* s = new QptiffSlide;
  s->tif_ = tif;
  s->description_ = dir0_desc;

  for (const auto& d : dirs) {
    if (d.image_type == "FullResolution" ||
        d.image_type == "ReducedResolution")
      s->levels_.push_back({d.idx, d.w, d.h});
    // Thumbnail / Overview / Label (and unmarked extras) are auxiliary
  }
  std::sort(s->levels_.begin(), s->levels_.end(),
            [](const QpLevel& a, const QpLevel& b) {
              return a.width * a.height > b.width * b.height;
            });

  // mpp: QPTIFF writes standard resolution tags in pixels/cm
  TIFFSetDirectory(tif, s->levels_[0].dir_index);
  float xres = 0.0f;
  uint16_t res_unit = RESUNIT_INCH;
  if (TIFFGetField(tif, TIFFTAG_XRESOLUTION, &xres) && xres > 0) {
    TIFFGetFieldDefaulted(tif, TIFFTAG_RESOLUTIONUNIT, &res_unit);
    if (res_unit == RESUNIT_CENTIMETER)
      s->mpp_ = 10000.0 / xres;
    else if (res_unit == RESUNIT_INCH)
      s->mpp_ = 25400.0 / xres;
  }
  return s;
}

}  // namespace

// Returns nullptr with *applicable=false when directory 0 carries no
// PerkinElmer-QPI description (caller falls back to the generic TIFF
// backend); nullptr with *applicable=true is a real, named QPTIFF error.
ISlide* open_qptiff_slide(const char* path, bool* applicable) {
  return QptiffSlide::open(path, applicable);
}
