// scn.cpp — Leica SCN (.scn) vendor semantics for the native WSI reader.
//
// The reference reads .scn through OpenSlide's leica driver
// (reference preprocessing/__init__.py:43-56 lists the extension; OpenSlide
// supplies the semantics).  A Leica SCN file is a (Big)TIFF whose first
// directory carries a collection XML in ImageDescription:
//
//   <scn xmlns="http://www.leica-microsystems.com/scn/2010/10/01">
//     <collection sizeX=".." sizeY="..">          <!-- nanometers -->
//       <image name="..">
//         <view sizeX=".." sizeY=".." offsetX=".." offsetY=".."/>  <!-- nm -->
//         <pixels sizeX=".." sizeY="..">
//           <dimension sizeX=".." sizeY=".." r="0" ifd="3"/>  <!-- per level -->
//           ...
//         </pixels>
//       </image>
//       ...
//     </collection>
//   </scn>
//
// Semantics implemented (matching the OpenSlide leica driver's behavior):
//   * The macro overview — the image whose view covers the entire collection
//     — is excluded from the main plane (OpenSlide exposes it as an
//     associated image; the pipeline only consumes the main plane).
//   * All remaining ("main") images are composed onto one plane in
//     collection space: level L's canvas covers the union of their views,
//     each image blitted at its view offset scaled by that level's px/nm.
//     Real scanners emit one main image or a row of grid-aligned ones.
//   * Levels = resolution ranks (`r`) present in EVERY main image, so the
//     pyramid is consistent across the stitch.
//   * mpp = view.sizeX nm / level-0 pixels / 1000 (the generic TIFF
//     resolution tags are absent in SCN files).
//   * Fluorescence images (<dimension c="..">) fail loudly by name.
//
// Reading a region fans out over the per-image TIFF directories through
// libtiff's RGBA tile/strip interface; gaps between images stay the white
// background, as the tiling stage expects.

#include "islide.h"

#include <tiffio.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal XML DOM parser — enough for the SCN collection document: elements,
// attributes, text, comments/PIs/doctype skipped, basic entities decoded.
// Namespace prefixes are stripped from element and attribute names.
// ---------------------------------------------------------------------------

struct XmlNode {
  std::string name;
  std::map<std::string, std::string> attrs;
  std::vector<XmlNode> children;
  std::string text;

  const XmlNode* child(const std::string& n) const {
    for (const auto& c : children)
      if (c.name == n) return &c;
    return nullptr;
  }
  std::vector<const XmlNode*> all(const std::string& n) const {
    std::vector<const XmlNode*> out;
    for (const auto& c : children)
      if (c.name == n) out.push_back(&c);
    return out;
  }
  const std::string& attr(const std::string& n) const {
    static const std::string kEmpty;
    auto it = attrs.find(n);
    return it == attrs.end() ? kEmpty : it->second;
  }
};

std::string strip_prefix(const std::string& name) {
  const size_t colon = name.find(':');
  return colon == std::string::npos ? name : name.substr(colon + 1);
}

std::string decode_entities(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  for (size_t i = 0; i < s.size();) {
    if (s[i] != '&') {
      out += s[i++];
      continue;
    }
    const size_t semi = s.find(';', i);
    if (semi == std::string::npos || semi - i > 12) {
      out += s[i++];
      continue;
    }
    const std::string ent = s.substr(i + 1, semi - i - 1);
    if (ent == "amp") out += '&';
    else if (ent == "lt") out += '<';
    else if (ent == "gt") out += '>';
    else if (ent == "quot") out += '"';
    else if (ent == "apos") out += '\'';
    else if (!ent.empty() && ent[0] == '#') {
      const long code = std::strtol(
          ent.c_str() + (ent.size() > 1 && ent[1] == 'x' ? 2 : 1), nullptr,
          ent.size() > 1 && ent[1] == 'x' ? 16 : 10);
      if (code > 0 && code < 128) out += (char)code;  // ASCII subset suffices
    }
    i = semi + 1;
  }
  return out;
}

class XmlParser {
 public:
  XmlParser(const char* src, size_t len) : p_(src), end_(src + len) {}

  bool parse(XmlNode* root, std::string* err) {
    skip_misc();
    if (!parse_element(root, err)) return false;
    return true;
  }

 private:
  const char* p_;
  const char* end_;

  void skip_ws() {
    while (p_ < end_ && std::isspace((unsigned char)*p_)) ++p_;
  }
  bool starts_with(const char* s) {
    const size_t n = std::strlen(s);
    return (size_t)(end_ - p_) >= n && std::memcmp(p_, s, n) == 0;
  }
  bool skip_until(const char* s) {
    const size_t n = std::strlen(s);
    while ((size_t)(end_ - p_) >= n) {
      if (std::memcmp(p_, s, n) == 0) {
        p_ += n;
        return true;
      }
      ++p_;
    }
    return false;
  }
  // skip whitespace, <?..?>, <!--..-->, <!DOCTYPE ..>
  void skip_misc() {
    for (;;) {
      skip_ws();
      if (starts_with("<?")) {
        if (!skip_until("?>")) return;
      } else if (starts_with("<!--")) {
        if (!skip_until("-->")) return;
      } else if (starts_with("<!")) {
        if (!skip_until(">")) return;
      } else {
        return;
      }
    }
  }
  bool parse_name(std::string* out) {
    const char* start = p_;
    while (p_ < end_ && !std::isspace((unsigned char)*p_) && *p_ != '>' &&
           *p_ != '/' && *p_ != '=')
      ++p_;
    if (p_ == start) return false;
    *out = std::string(start, p_);
    return true;
  }
  bool parse_element(XmlNode* node, std::string* err) {
    if (p_ >= end_ || *p_ != '<') {
      *err = "expected element";
      return false;
    }
    ++p_;
    std::string raw_name;
    if (!parse_name(&raw_name)) {
      *err = "bad element name";
      return false;
    }
    node->name = strip_prefix(raw_name);
    // attributes
    for (;;) {
      skip_ws();
      if (p_ >= end_) {
        *err = "unterminated start tag";
        return false;
      }
      if (*p_ == '/') {
        ++p_;
        if (p_ >= end_ || *p_ != '>') {
          *err = "malformed self-closing tag";
          return false;
        }
        ++p_;
        return true;  // self-closing: no content
      }
      if (*p_ == '>') {
        ++p_;
        break;
      }
      std::string attr_name;
      if (!parse_name(&attr_name)) {
        *err = "bad attribute name";
        return false;
      }
      skip_ws();
      if (p_ >= end_ || *p_ != '=') {
        *err = "attribute missing '='";
        return false;
      }
      ++p_;
      skip_ws();
      if (p_ >= end_ || (*p_ != '"' && *p_ != '\'')) {
        *err = "attribute value not quoted";
        return false;
      }
      const char quote = *p_++;
      const char* vstart = p_;
      while (p_ < end_ && *p_ != quote) ++p_;
      if (p_ >= end_) {
        *err = "unterminated attribute value";
        return false;
      }
      node->attrs[strip_prefix(attr_name)] =
          decode_entities(std::string(vstart, p_));
      ++p_;
    }
    // content: text and child elements until </name>
    for (;;) {
      const char* tstart = p_;
      while (p_ < end_ && *p_ != '<') ++p_;
      if (p_ > tstart)
        node->text += decode_entities(std::string(tstart, p_));
      if (p_ >= end_) {
        *err = "unterminated element <" + node->name + ">";
        return false;
      }
      if (starts_with("</")) {
        p_ += 2;
        std::string close;
        if (!parse_name(&close) || strip_prefix(close) != node->name) {
          *err = "mismatched close tag for <" + node->name + ">";
          return false;
        }
        skip_ws();
        if (p_ >= end_ || *p_ != '>') {
          *err = "malformed close tag";
          return false;
        }
        ++p_;
        return true;
      }
      if (starts_with("<!--")) {
        if (!skip_until("-->")) {
          *err = "unterminated comment";
          return false;
        }
        continue;
      }
      if (starts_with("<![CDATA[")) {
        p_ += 9;
        const char* cstart = p_;
        if (!skip_until("]]>")) {
          *err = "unterminated CDATA";
          return false;
        }
        node->text += std::string(cstart, p_ - 3);
        continue;
      }
      if (starts_with("<?")) {
        if (!skip_until("?>")) {
          *err = "unterminated processing instruction";
          return false;
        }
        continue;
      }
      node->children.emplace_back();
      if (!parse_element(&node->children.back(), err)) return false;
    }
  }
};

int64_t attr_i64(const XmlNode& n, const std::string& name, int64_t dflt) {
  const std::string& v = n.attr(name);
  if (v.empty()) return dflt;
  return (int64_t)std::strtoll(v.c_str(), nullptr, 10);
}

// ---------------------------------------------------------------------------
// SCN model
// ---------------------------------------------------------------------------

struct ScnDim {
  int64_t w = 0, h = 0;
  int64_t r = 0;     // resolution rank, 0 = full resolution
  uint16_t ifd = 0;  // TIFF directory index
};

struct ScnImage {
  int64_t view_x = 0, view_y = 0;  // view offset in collection, nm
  int64_t view_w = 0, view_h = 0;  // view size, nm
  std::map<int64_t, ScnDim> by_rank;
};

// per-level placement of one image on the composed plane
struct ScnPlacement {
  uint16_t ifd;
  int64_t x, y;  // top-left on the canvas, px
  int64_t w, h;  // image pixels at this level
};

struct ScnLevel {
  int64_t width = 0, height = 0;  // canvas size, px
  std::vector<ScnPlacement> images;
};

// Blit the intersection of canvas-space rect [x,y,w,h) with one placed TIFF
// directory into dst (RGBA, dst rect origin at (x, y), row stride w).
// Returns 0 on success.
int32_t blit_placed_dir(TIFF* tif, const ScnPlacement& pl, int64_t x,
                        int64_t y, int64_t w, int64_t h, uint8_t* dst) {
  const int64_t cx0 = std::max(x, pl.x);
  const int64_t cy0 = std::max(y, pl.y);
  const int64_t cx1 = std::min(x + w, pl.x + pl.w);
  const int64_t cy1 = std::min(y + h, pl.y + pl.h);
  if (cx0 >= cx1 || cy0 >= cy1) return 0;
  if (!TIFFSetDirectory(tif, pl.ifd)) return 2;

  // image-local rect
  const int64_t lx0 = cx0 - pl.x, ly0 = cy0 - pl.y;
  const int64_t lx1 = cx1 - pl.x, ly1 = cy1 - pl.y;

  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;
    std::vector<uint32_t> tile((size_t)tw * th);
    for (int64_t ty = (ly0 / th) * th; ty < ly1; ty += th) {
      for (int64_t tx = (lx0 / tw) * tw; tx < lx1; tx += tw) {
        if (!TIFFReadRGBATile(tif, (uint32_t)tx, (uint32_t)ty, tile.data()))
          return 4;
        const int64_t bx0 = std::max<int64_t>(tx, lx0);
        const int64_t bx1 = std::min<int64_t>(tx + tw, lx1);
        const int64_t by0 = std::max<int64_t>(ty, ly0);
        const int64_t by1 = std::min<int64_t>(ty + th, ly1);
        for (int64_t iy = by0; iy < by1; ++iy) {
          // TIFFReadRGBATile rasters are bottom-up
          const int64_t raster_row = th - 1 - (iy - ty);
          const uint32_t* src = tile.data() + raster_row * tw + (bx0 - tx);
          uint8_t* drow =
              dst + ((pl.y + iy - y) * w + (pl.x + bx0 - x)) * 4;
          std::memcpy(drow, src, (size_t)(bx1 - bx0) * 4);
        }
      }
    }
  } else {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (rps == 0) rps = (uint32_t)pl.h;
    if ((uint64_t)pl.w * rps * 4 > (1ull << 32)) return 6;
    std::vector<uint32_t> strip((size_t)pl.w * rps);
    for (int64_t sy = (ly0 / rps) * rps; sy < ly1; sy += rps) {
      if (!TIFFReadRGBAStrip(tif, (uint32_t)sy, strip.data())) return 5;
      const int64_t rows = std::min<int64_t>(rps, pl.h - sy);
      const int64_t by0 = std::max<int64_t>(sy, ly0);
      const int64_t by1 = std::min<int64_t>(sy + rows, ly1);
      for (int64_t iy = by0; iy < by1; ++iy) {
        const int64_t raster_row = rows - 1 - (iy - sy);
        const uint32_t* src = strip.data() + raster_row * pl.w + lx0;
        uint8_t* drow = dst + ((pl.y + iy - y) * w + (pl.x + lx0 - x)) * 4;
        std::memcpy(drow, src, (size_t)(lx1 - lx0) * 4);
      }
    }
  }
  return 0;
}

class ScnSlide : public ISlide {
 public:
  static ScnSlide* open(const char* path, bool* applicable);
  ~ScnSlide() override {
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
    const ScnLevel& lvl = levels_[level];
    return region_at_level(level, 0, 0, lvl.width, lvl.height,
                           (uint8_t*)out);
  }

 private:
  int32_t region_at_level(int32_t level, int64_t x, int64_t y, int64_t w,
                          int64_t h, uint8_t* dst) {
    if (!dst || w <= 0 || h <= 0) return 1;
    std::memset(dst, 0xFF, (size_t)w * h * 4);  // white background
    for (const auto& pl : levels_[level].images) {
      const int32_t rc = blit_placed_dir(tif_, pl, x, y, w, h, dst);
      if (rc != 0) return rc;
    }
    return 0;
  }

  TIFF* tif_ = nullptr;
  std::vector<ScnLevel> levels_;  // [0] = full resolution
  std::string description_;
  double mpp_ = -1.0;
};

ScnSlide* ScnSlide::open(const char* path, bool* applicable) {
  *applicable = false;
  TIFF* tif = TIFFOpen(path, "rm");
  if (!tif) {
    set_wsi_error("libtiff could not open the file");
    return nullptr;
  }
  char* desc = nullptr;
  if (!TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) || !desc ||
      std::strstr(desc, "<scn") == nullptr) {
    TIFFClose(tif);  // not an SCN collection: caller falls back to generic
    return nullptr;
  }
  *applicable = true;
  const std::string xml_src = desc;

  XmlNode root;
  std::string err;
  XmlParser parser(xml_src.data(), xml_src.size());
  if (!parser.parse(&root, &err) || root.name != "scn") {
    set_wsi_error("Leica SCN: malformed collection XML (" + err + ")");
    TIFFClose(tif);
    return nullptr;
  }
  const XmlNode* collection = root.child("collection");
  if (!collection) {
    set_wsi_error("Leica SCN: collection element missing");
    TIFFClose(tif);
    return nullptr;
  }
  const int64_t coll_w = attr_i64(*collection, "sizeX", 0);
  const int64_t coll_h = attr_i64(*collection, "sizeY", 0);

  // parse images
  std::vector<ScnImage> mains;
  for (const XmlNode* img : collection->all("image")) {
    const XmlNode* view = img->child("view");
    const XmlNode* pixels = img->child("pixels");
    if (!view || !pixels) {
      set_wsi_error("Leica SCN: image missing view/pixels");
      TIFFClose(tif);
      return nullptr;
    }
    ScnImage si;
    si.view_x = attr_i64(*view, "offsetX", 0);
    si.view_y = attr_i64(*view, "offsetY", 0);
    si.view_w = attr_i64(*view, "sizeX", 0);
    si.view_h = attr_i64(*view, "sizeY", 0);
    for (const XmlNode* dim : pixels->all("dimension")) {
      if (!dim->attr("c").empty()) {
        set_wsi_error(
            "Leica SCN: fluorescence (multi-channel) images are not "
            "supported");
        TIFFClose(tif);
        return nullptr;
      }
      ScnDim d;
      d.w = attr_i64(*dim, "sizeX", 0);
      d.h = attr_i64(*dim, "sizeY", 0);
      d.r = attr_i64(*dim, "r", 0);
      d.ifd = (uint16_t)attr_i64(*dim, "ifd", 0);
      if (d.w <= 0 || d.h <= 0) continue;
      auto it = si.by_rank.find(d.r);
      if (it == si.by_rank.end() || (int64_t)d.w * d.h > it->second.w * it->second.h)
        si.by_rank[d.r] = d;
    }
    if (si.by_rank.empty() || si.view_w <= 0 || si.view_h <= 0) continue;
    // the macro overview covers the whole collection — exclude it from the
    // main plane (it is what OpenSlide exposes as an associated image)
    const bool is_macro =
        si.view_x == 0 && si.view_y == 0 && si.view_w == coll_w &&
        si.view_h == coll_h;
    if (!is_macro) mains.push_back(std::move(si));
  }
  if (mains.empty()) {
    set_wsi_error("Leica SCN: no main image in the collection");
    TIFFClose(tif);
    return nullptr;
  }

  // ranks present in every main image, ascending (r=0 = full resolution)
  std::vector<int64_t> ranks;
  for (const auto& kv : mains[0].by_rank) {
    bool everywhere = true;
    for (const auto& m : mains)
      if (!m.by_rank.count(kv.first)) everywhere = false;
    if (everywhere) ranks.push_back(kv.first);
  }
  std::sort(ranks.begin(), ranks.end());
  if (ranks.empty()) {
    set_wsi_error("Leica SCN: main images share no resolution level");
    TIFFClose(tif);
    return nullptr;
  }

  // union of the main views in collection space
  int64_t ux0 = INT64_MAX, uy0 = INT64_MAX, ux1 = INT64_MIN, uy1 = INT64_MIN;
  for (const auto& m : mains) {
    ux0 = std::min(ux0, m.view_x);
    uy0 = std::min(uy0, m.view_y);
    ux1 = std::max(ux1, m.view_x + m.view_w);
    uy1 = std::max(uy1, m.view_y + m.view_h);
  }

  ScnSlide* s = new ScnSlide;
  s->tif_ = tif;
  s->description_ = xml_src;

  for (const int64_t r : ranks) {
    // px per nm at this rank; all images must agree (within rounding)
    const ScnDim& d0 = mains[0].by_rank.at(r);
    const double ppn = (double)d0.w / (double)mains[0].view_w;
    bool consistent = true;
    for (const auto& m : mains) {
      const ScnDim& d = m.by_rank.at(r);
      const double p = (double)d.w / (double)m.view_w;
      if (std::abs(p - ppn) / ppn > 0.02) consistent = false;
    }
    if (!consistent) {
      set_wsi_error(
          "Leica SCN: main images disagree on resolution at a shared rank");
      delete s;  // closes tif_
      return nullptr;
    }
    ScnLevel lvl;
    lvl.width = (int64_t)((double)(ux1 - ux0) * ppn + 0.5);
    lvl.height = (int64_t)((double)(uy1 - uy0) * ppn + 0.5);
    for (const auto& m : mains) {
      const ScnDim& d = m.by_rank.at(r);
      ScnPlacement pl;
      pl.ifd = d.ifd;
      pl.x = (int64_t)((double)(m.view_x - ux0) * ppn + 0.5);
      pl.y = (int64_t)((double)(m.view_y - uy0) * ppn + 0.5);
      pl.w = d.w;
      pl.h = d.h;
      lvl.images.push_back(pl);
    }
    // canvas must cover every placement (rounding safety)
    for (const auto& pl : lvl.images) {
      lvl.width = std::max(lvl.width, pl.x + pl.w);
      lvl.height = std::max(lvl.height, pl.y + pl.h);
    }
    s->levels_.push_back(std::move(lvl));
  }

  // µm per px at full resolution, from the physical view size
  const ScnDim& d0 = mains[0].by_rank.at(ranks[0]);
  s->mpp_ = (double)mains[0].view_w / (double)d0.w / 1000.0;

  // validate the referenced IFDs exist
  const uint16_t n_dirs = TIFFNumberOfDirectories(tif);
  for (const auto& lvl : s->levels_) {
    for (const auto& pl : lvl.images) {
      if (pl.ifd >= n_dirs) {
        set_wsi_error("Leica SCN: dimension references a missing IFD");
        delete s;
        return nullptr;
      }
    }
  }
  return s;
}

}  // namespace

// Returns nullptr with *applicable=false when the file is a TIFF without an
// SCN collection XML (caller falls back to the generic TIFF backend);
// nullptr with *applicable=true is a real, named SCN error.
ISlide* open_scn_slide(const char* path, bool* applicable) {
  return ScnSlide::open(path, applicable);
}
