// bif.cpp — Ventana/Roche BIF (.bif) vendor semantics for the native reader.
//
// The reference reads .bif through OpenSlide's ventana driver
// (reference preprocessing/__init__.py:43-56 lists the extension).  A BIF
// is a (Big)TIFF whose first directory carries an `iScan` XML element
// (ImageDescription or the XMP packet, tag 700) with scanner metadata:
//
//   <iScan ScanRes="0.465" Magnification="20" ...>
//     <AOIScanned ...> / <SlideStitchInfo><ImageInfo .../> ...
//   </iScan>
//
// Semantics implemented:
//   * mpp from the `ScanRes` attribute (µm/px; BIF files do not carry
//     meaningful generic TIFF resolution tags).
//   * Pyramid levels from directories whose ImageDescription carries the
//     Ventana "level=N" marker; auxiliary images ("Thumbnail", "Label
//     Image", "Probability...") are excluded.  Files without level
//     markers fall back to largest-directory pyramid selection with the
//     same auxiliary-name exclusion.
//   * Unstitched multi-AOI mosaics fail LOUDLY by name: when the iScan
//     XML reports more than one scanned area-of-interest with nonzero
//     joint overlaps, correct level-0 geometry requires the per-joint
//     overlap corrections OpenSlide's ventana driver applies; silently
//     reading the raw directory grid would emit wrong coordinates.  We
//     refuse with an actionable error instead (the per-slide fail-safe in
//     extract_ names the slide and continues the cohort).
//
// Zero-egress caveat (same class as native/jxr.cpp): no real Ventana file
// exists in this environment.  The attribute and marker names follow the
// publicly documented OpenSlide ventana driver behavior; the conservative
// failure mode above bounds the blast radius of any mismatch — a real
// file either reads with correct stitched geometry or errors by name,
// never silently wrong.

#include "islide.h"
#include "tiffblit.h"

#include <tiffio.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct BifLevel {
  uint16_t dir_index;
  int64_t width;
  int64_t height;
  long level_marker;  // value of "level=N" in the description, -1 if absent
};

// Case-insensitive substring search.
bool contains_ci(const std::string& hay, const char* needle) {
  const size_t nlen = std::strlen(needle);
  if (nlen == 0 || hay.size() < nlen) return false;
  for (size_t i = 0; i + nlen <= hay.size(); ++i) {
    size_t j = 0;
    for (; j < nlen; ++j) {
      if (std::tolower((unsigned char)hay[i + j]) !=
          std::tolower((unsigned char)needle[j]))
        break;
    }
    if (j == nlen) return true;
  }
  return false;
}

// Extract a double attribute value (attr="1.23") from raw XML text.
bool attr_double(const std::string& xml, const char* name, double* out) {
  const std::string pat = std::string(name) + "=\"";
  const size_t at = xml.find(pat);
  if (at == std::string::npos) return false;
  const char* start = xml.c_str() + at + pat.size();
  char* end = nullptr;
  const double v = std::strtod(start, &end);
  if (end == start) return false;
  *out = v;
  return true;
}

// Count occurrences of an element/attribute marker in raw XML text.
int count_of(const std::string& xml, const char* needle) {
  int n = 0;
  size_t at = 0;
  const size_t len = std::strlen(needle);
  while ((at = xml.find(needle, at)) != std::string::npos) {
    ++n;
    at += len;
  }
  return n;
}

class BifSlide : public ISlide {
 public:
  static BifSlide* open(const char* path, bool* applicable);
  ~BifSlide() override {
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
                          int64_t h, uint8_t* dst);

  TIFF* tif_ = nullptr;
  std::vector<BifLevel> levels_;
  std::string description_;
  double mpp_ = -1.0;
};

int32_t BifSlide::region_at_level(int32_t level, int64_t x, int64_t y,
                                  int64_t w, int64_t h, uint8_t* dst) {
  const BifLevel& lvl = levels_[level];
  if (!TIFFSetDirectory(tif_, lvl.dir_index)) return 2;
  return tiff_rgba_region(tif_, lvl.width, lvl.height, x, y, w, h, dst);
}

BifSlide* BifSlide::open(const char* path, bool* applicable) {
  *applicable = false;
  TIFF* tif = TIFFOpen(path, "rm");
  if (!tif) {
    set_wsi_error("libtiff could not open the file");
    return nullptr;
  }

  // the iScan XML lives in ImageDescription or the XMP packet of dir 0
  std::string iscan;
  {
    char* desc = nullptr;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc &&
        std::strstr(desc, "iScan"))
      iscan = desc;
    if (iscan.empty()) {
      uint32_t xmp_len = 0;
      void* xmp = nullptr;
      if (TIFFGetField(tif, TIFFTAG_XMLPACKET, &xmp_len, &xmp) && xmp &&
          xmp_len > 0 && xmp_len < (64u << 20)) {
        std::string packet((const char*)xmp, xmp_len);
        if (packet.find("iScan") != std::string::npos) iscan = packet;
      }
    }
  }
  if (iscan.empty()) {
    TIFFClose(tif);  // not a Ventana BIF: fall through to generic TIFF
    return nullptr;
  }
  *applicable = true;

  // unstitched multi-AOI mosaics need per-joint overlap corrections;
  // reading the raw grid would be silently wrong — refuse by name.
  // OpenSlide's ventana driver reads these from <SlideStitchInfo>
  // <ImageInfo> entries (one per AOI) with nonzero joint overlaps.
  const int aois = std::max(count_of(iscan, "<AOIScanned"),
                            count_of(iscan, "<ImageInfo"));
  double overlap = 0.0;
  attr_double(iscan, "OverlapX", &overlap);
  double overlap_y = 0.0;
  attr_double(iscan, "OverlapY", &overlap_y);
  overlap = std::max(overlap, overlap_y);
  if (aois > 1 && overlap > 0.0) {
    set_wsi_error(
        "Ventana BIF: unstitched multi-AOI mosaic (joint overlap "
        "corrections required) — this file needs OpenSlide's ventana "
        "stitcher; re-export as stitched BIF or pyramidal TIFF");
    TIFFClose(tif);
    return nullptr;
  }

  BifSlide* s = new BifSlide;
  s->tif_ = tif;
  s->description_ = iscan;
  attr_double(iscan, "ScanRes", &s->mpp_);

  // enumerate directories; Ventana marks pyramid levels "level=N" in the
  // per-directory description and names auxiliary images
  std::vector<BifLevel> with_marker, without_marker;
  uint16_t idx = 0;
  do {
    uint32_t w = 0, h = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &h);
    if (w == 0 || h == 0) {
      ++idx;
      continue;
    }
    char* d = nullptr;
    std::string dd;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &d) && d) dd = d;
    const bool aux = contains_ci(dd, "Thumbnail") ||
                     contains_ci(dd, "Label") ||
                     contains_ci(dd, "Probability") ||
                     contains_ci(dd, "Overview");
    if (!aux) {
      long marker = -1;
      const size_t at = dd.find("level=");
      if (at != std::string::npos)
        marker = std::strtol(dd.c_str() + at + 6, nullptr, 10);
      BifLevel lvl{idx, (int64_t)w, (int64_t)h, marker};
      (marker >= 0 ? with_marker : without_marker).push_back(lvl);
    }
    ++idx;
  } while (TIFFReadDirectory(tif));

  // Pyramid selection is size-driven over the non-auxiliary directories
  // (aspect-filtered on the largest), with the "level=N" markers used only
  // as a consistency check — real files vary in whether the full-res
  // directory itself carries a marker, but sizes are unambiguous.
  std::vector<BifLevel> candidates = std::move(with_marker);
  candidates.insert(candidates.end(), without_marker.begin(),
                    without_marker.end());
  if (candidates.empty()) {
    set_wsi_error("Ventana BIF: no image directories");
    delete s;
    return nullptr;
  }
  auto main_it = std::max_element(
      candidates.begin(), candidates.end(),
      [](const BifLevel& a, const BifLevel& b) {
        return a.width * a.height < b.width * b.height;
      });
  const double aspect = (double)main_it->width / (double)main_it->height;
  for (const auto& d : candidates) {
    const double a = (double)d.width / (double)d.height;
    if (std::abs(a - aspect) / aspect < 0.05) s->levels_.push_back(d);
  }
  std::sort(s->levels_.begin(), s->levels_.end(),
            [](const BifLevel& a, const BifLevel& b) {
              return a.width * a.height > b.width * b.height;
            });

  // marker consistency: where markers exist, their order must match the
  // size order (a violation means we misread the layout — fail by name)
  long prev_marker = -1;
  for (const auto& lvl : s->levels_) {
    if (lvl.level_marker < 0) continue;
    if (lvl.level_marker < prev_marker) {
      set_wsi_error("Ventana BIF: level markers disagree with image sizes");
      delete s;
      return nullptr;
    }
    prev_marker = lvl.level_marker;
  }
  return s;
}

}  // namespace

// Returns nullptr with *applicable=false when the file carries no iScan
// metadata (caller falls back to the generic TIFF backend); nullptr with
// *applicable=true is a real, named BIF error.
ISlide* open_bif_slide(const char* path, bool* applicable) {
  return BifSlide::open(path, applicable);
}
