// vms.cpp — Hamamatsu VMS/VMU backend for the native WSI reader.
//
// The reference pipeline opens these through OpenSlide (reference
// src/stamp/preprocessing/__init__.py:43-56).  Both formats are a small
// Windows-INI stub next to the actual image data:
//
//   .vms  [Virtual Microscope Specimen] — the specimen is one huge baseline
//         JPEG, optionally split into a NoJpegColumns × NoJpegRows grid of
//         JPEG files (`ImageFile`, `ImageFile(col,row)`).  Every JPEG uses
//         restart markers for random access (jpegrt.h); the
//         OptimisationFile offset table is redundant with a standards-based
//         scan and is deliberately ignored.  `MapFile` is a low-res
//         overview JPEG, exposed here as pyramid level 1.
//
//   .vmu  [Uncompressed Virtual Microscope Specimen] — the specimen is an
//         NGR raster: "GN" magic, little-endian int32 width/height/column-
//         width at offsets 4/8/12 and the pixel-data offset at 24, then
//         16-bit little-endian RGB samples stored in vertical strips of
//         `column_width` pixels (row-major inside a strip).  Samples are
//         mapped to 8-bit by taking the high byte.  NGR layout follows
//         OpenSlide's published format notes; validated against synthetic
//         fixtures (tests/hamamatsu_util.py) — real-slide validation is
//         pending in the zero-egress build environment.
//
// Metadata: microns-per-pixel is PhysicalWidth (nanometres for the whole
// specimen) divided by the pixel width.  Out-of-bounds region reads fill
// with white, matching the scanner background.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "islide.h"
#include "jpegrt.h"
#include "rtutil.h"

namespace {

std::string dir_of(const std::string& path) {
  const size_t slash = path.find_last_of('/');
  return slash == std::string::npos ? std::string(".") : path.substr(0, slash);
}

// ---------------------------------------------------------------------------
// VMS — restart-marker JPEG grid
// ---------------------------------------------------------------------------

class VmsSlide : public ISlide {
 public:
  static VmsSlide* open(const std::string& path, const WsiIniMap& ini,
                        const std::string& section);

  int64_t width() const override { return width_; }
  int64_t height() const override { return height_; }
  int32_t level_count() const override { return map_w_ ? 2 : 1; }
  int64_t level_width(int32_t level) const override {
    return level == 0 ? width_ : map_w_;
  }
  int64_t level_height(int32_t level) const override {
    return level == 0 ? height_ : map_h_;
  }
  const std::string& description() const override { return description_; }
  double mpp() const override { return mpp_; }
  int64_t decode_errors() const override { return decode_errors_; }

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override;
  int32_t read_level(int32_t level, void* out) override;

 private:
  VmsSlide() : cache_(128u << 20) {}

  struct Cell {
    std::unique_ptr<RtJpeg> jpeg;
    int64_t x = 0, y = 0;  // level-0 anchor of this JPEG
  };

  // chunk fetch through the LRU; nullptr ⇒ undecodable (counted, filled)
  const std::vector<uint8_t>* chunk(size_t cell, int32_t cx, int32_t cy);

  int64_t width_ = 0, height_ = 0;
  int64_t map_w_ = 0, map_h_ = 0;
  std::string map_path_;
  double mpp_ = -1.0;
  std::string description_;
  int64_t decode_errors_ = 0;
  int32_t cols_ = 1, rows_ = 1;
  std::vector<Cell> cells_;  // row-major cols_×rows_
  WsiChunkCache cache_;
};

const std::vector<uint8_t>* VmsSlide::chunk(size_t cell, int32_t cx,
                                            int32_t cy) {
  RtJpeg& j = *cells_[cell].jpeg;
  const uint64_t key = ((uint64_t)cell << 48) |
                       ((uint64_t)(uint32_t)cy << 16) | (uint32_t)cx;
  if (const auto* hit = cache_.get(key)) return hit;
  std::vector<uint8_t> rgb;
  if (!j.decode_chunk(cx, cy, &rgb)) {
    ++decode_errors_;
    set_wsi_error("VMS: undecodable restart chunk, rendered as background");
    return nullptr;
  }
  return cache_.put(key, std::move(rgb));
}

int32_t VmsSlide::read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                              void* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  uint8_t* dst = (uint8_t*)out;
  wsi_fill_white(dst, w * h);
  for (size_t ci = 0; ci < cells_.size(); ++ci) {
    const Cell& c = cells_[ci];
    RtJpeg& j = *c.jpeg;
    // window in this cell's pixel space
    const int64_t lx0 = std::max<int64_t>(0, x - c.x);
    const int64_t ly0 = std::max<int64_t>(0, y - c.y);
    const int64_t lx1 = std::min<int64_t>(j.width(), x + w - c.x);
    const int64_t ly1 = std::min<int64_t>(j.height(), y + h - c.y);
    if (lx0 >= lx1 || ly0 >= ly1) continue;
    const int32_t cx0 = (int32_t)(lx0 / j.chunk_w());
    const int32_t cy0 = (int32_t)(ly0 / j.chunk_h());
    const int32_t cx1 = (int32_t)((lx1 - 1) / j.chunk_w());
    const int32_t cy1 = (int32_t)((ly1 - 1) / j.chunk_h());
    for (int32_t cy = cy0; cy <= cy1; ++cy) {
      for (int32_t cx = cx0; cx <= cx1; ++cx) {
        const auto* rgb = chunk(ci, cx, cy);
        if (!rgb) continue;  // fill color stays — resilience over abort
        wsi_blit_rgb(rgb->data(), j.chunk_px_w(cx), j.chunk_px_h(cy),
                 c.x + (int64_t)cx * j.chunk_w(),
                 c.y + (int64_t)cy * j.chunk_h(), x, y, w, h, dst);
      }
    }
  }
  return 0;
}

int32_t VmsSlide::read_level(int32_t level, void* out) {
  if (level == 0) return read_region(0, 0, width_, height_, out);
  if (level != 1 || !map_w_) return 1;
  FILE* f = std::fopen(map_path_.c_str(), "rb");
  if (!f) return 2;
  std::vector<uint8_t> raw;
  char buf[1 << 16];
  size_t n;
  while ((n = std::fread(buf, 1, sizeof(buf), f)) > 0)
    raw.insert(raw.end(), buf, buf + n);
  std::fclose(f);
  std::vector<uint8_t> rgb;
  int mw = 0, mh = 0;
  if (!wsi_decode_jpeg(raw.data(), raw.size(), &rgb, &mw, &mh) ||
      mw != map_w_ || mh != map_h_)
    return 3;
  wsi_fill_white((uint8_t*)out, map_w_ * map_h_);
  wsi_blit_rgb(rgb.data(), mw, mh, 0, 0, 0, 0, map_w_, map_h_, (uint8_t*)out);
  return 0;
}

VmsSlide* VmsSlide::open(const std::string& path, const WsiIniMap& ini,
                         const std::string& section) {
  const std::string dir = dir_of(path);
  const long cols = wsi_ini_get_int(ini, section, "NoJpegColumns", 1);
  const long rows = wsi_ini_get_int(ini, section, "NoJpegRows", 1);
  if (cols < 1 || rows < 1 || cols * rows > 4096) {
    set_wsi_error("VMS: implausible JPEG grid " + std::to_string(cols) + "x" +
                  std::to_string(rows));
    return nullptr;
  }
  std::unique_ptr<VmsSlide> s(new VmsSlide());
  s->cols_ = (int32_t)cols;
  s->rows_ = (int32_t)rows;
  s->cells_.resize((size_t)cols * rows);

  // ImageFile        → (0,0)
  // ImageFile(c)     → (c,0)        (single-row slides)
  // ImageFile(c,r)   → (c,r)
  for (long r = 0; r < rows; ++r) {
    for (long c = 0; c < cols; ++c) {
      std::string key;
      if (c == 0 && r == 0) {
        key = "ImageFile";
      } else if (r == 0) {
        key = "ImageFile(" + std::to_string(c) + ")";
        if (wsi_ini_get(ini, section, key).empty())
          key = "ImageFile(" + std::to_string(c) + ",0)";
      } else {
        key = "ImageFile(" + std::to_string(c) + "," + std::to_string(r) +
              ")";
      }
      const std::string fname = wsi_ini_get(ini, section, key);
      if (fname.empty()) {
        set_wsi_error("VMS: missing " + key + " in " + path);
        return nullptr;
      }
      Cell& cell = s->cells_[(size_t)r * cols + c];
      cell.jpeg.reset(new RtJpeg());
      std::string err;
      if (!cell.jpeg->open(dir + "/" + fname, &err)) {
        set_wsi_error("VMS: " + fname + ": " + err);
        return nullptr;
      }
    }
  }

  // anchors: columns abut horizontally, rows vertically (scanner grid)
  {
    int64_t ypos = 0;
    for (long r = 0; r < rows; ++r) {
      int64_t xpos = 0;
      int64_t row_h = 0;
      for (long c = 0; c < cols; ++c) {
        Cell& cell = s->cells_[(size_t)r * cols + c];
        cell.x = xpos;
        cell.y = ypos;
        xpos += cell.jpeg->width();
        row_h = std::max(row_h, cell.jpeg->height());
      }
      s->width_ = std::max(s->width_, xpos);
      ypos += row_h;
    }
    s->height_ = ypos;
  }

  // overview map (optional pyramid level 1)
  const std::string map_file = wsi_ini_get(ini, section, "MapFile");
  if (!map_file.empty()) {
    // probe dims only — decode happens lazily in read_level
    FILE* f = std::fopen((dir + "/" + map_file).c_str(), "rb");
    if (f) {
      std::vector<uint8_t> raw;
      char buf[1 << 16];
      size_t n;
      while ((n = std::fread(buf, 1, sizeof(buf), f)) > 0)
        raw.insert(raw.end(), buf, buf + n);
      std::fclose(f);
      std::vector<uint8_t> rgb;
      int mw = 0, mh = 0;
      if (wsi_decode_jpeg(raw.data(), raw.size(), &rgb, &mw, &mh)) {
        s->map_w_ = mw;
        s->map_h_ = mh;
        s->map_path_ = dir + "/" + map_file;
      }
    }
  }

  const double phys_w_nm =
      wsi_ini_get_double(ini, section, "PhysicalWidth", 0.0);
  if (phys_w_nm > 0 && s->width_ > 0)
    s->mpp_ = phys_w_nm / (double)s->width_ / 1000.0;
  s->description_ =
      "Hamamatsu VMS lens=" + wsi_ini_get(ini, section, "SourceLens", "?") +
      " grid=" + std::to_string(cols) + "x" + std::to_string(rows);
  return s.release();
}

// ---------------------------------------------------------------------------
// VMU — NGR 16-bit raster
// ---------------------------------------------------------------------------

class VmuSlide : public ISlide {
 public:
  static VmuSlide* open(const std::string& path, const WsiIniMap& ini,
                        const std::string& section);
  ~VmuSlide() override {
    if (f_) std::fclose(f_);
  }

  int64_t width() const override { return width_; }
  int64_t height() const override { return height_; }
  int32_t level_count() const override { return 1; }
  int64_t level_width(int32_t) const override { return width_; }
  int64_t level_height(int32_t) const override { return height_; }
  const std::string& description() const override { return description_; }
  double mpp() const override { return mpp_; }

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override;
  int32_t read_level(int32_t level, void* out) override {
    return level == 0 ? read_region(0, 0, width_, height_, out) : 1;
  }

 private:
  FILE* f_ = nullptr;
  int64_t width_ = 0, height_ = 0;
  int64_t col_w_ = 0;       // strip width in pixels
  int64_t data_off_ = 0;    // first sample byte
  double mpp_ = -1.0;
  std::string description_;
};

int32_t VmuSlide::read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                              void* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  uint8_t* dst = (uint8_t*)out;
  wsi_fill_white(dst, w * h);
  const int64_t x0 = std::max<int64_t>(0, x);
  const int64_t y0 = std::max<int64_t>(0, y);
  const int64_t x1 = std::min(width_, x + w);
  const int64_t y1 = std::min(height_, y + h);
  if (x0 >= x1 || y0 >= y1) return 0;
  std::vector<uint8_t> row6((size_t)(x1 - x0) * 6);
  for (int64_t s0 = x0 / col_w_, s1 = (x1 - 1) / col_w_, strip = s0;
       strip <= s1; ++strip) {
    const int64_t sx0 = std::max(x0, strip * col_w_);
    const int64_t sx1 = std::min(x1, (strip + 1) * col_w_);
    for (int64_t iy = y0; iy < y1; ++iy) {
      const int64_t px_index =
          strip * col_w_ * height_ + iy * col_w_ + (sx0 - strip * col_w_);
      const size_t nbytes = (size_t)(sx1 - sx0) * 6;
      if (fseeko(f_, (off_t)(data_off_ + px_index * 6), SEEK_SET) != 0 ||
          std::fread(row6.data(), 1, nbytes, f_) != nbytes)
        return 2;
      uint8_t* d = dst + ((iy - y) * w + (sx0 - x)) * 4;
      const uint8_t* sp = row6.data();
      for (int64_t ix = sx0; ix < sx1; ++ix) {
        d[0] = sp[1];  // high byte of 16-bit LE R
        d[1] = sp[3];
        d[2] = sp[5];
        d[3] = 0xFF;
        sp += 6;
        d += 4;
      }
    }
  }
  return 0;
}

VmuSlide* VmuSlide::open(const std::string& path, const WsiIniMap& ini,
                         const std::string& section) {
  const std::string dir = dir_of(path);
  const std::string fname = wsi_ini_get(ini, section, "ImageFile");
  if (fname.empty()) {
    set_wsi_error("VMU: missing ImageFile in " + path);
    return nullptr;
  }
  std::unique_ptr<VmuSlide> s(new VmuSlide());
  s->f_ = std::fopen((dir + "/" + fname).c_str(), "rb");
  if (!s->f_) {
    set_wsi_error("VMU: cannot open " + fname);
    return nullptr;
  }
  uint8_t hdr[28];
  if (std::fread(hdr, 1, sizeof(hdr), s->f_) != sizeof(hdr) ||
      hdr[0] != 'G' || hdr[1] != 'N') {
    set_wsi_error("VMU: " + fname + " is not an NGR raster (no GN magic)");
    return nullptr;
  }
  auto le32 = [&](int off) {
    int32_t v;
    std::memcpy(&v, hdr + off, 4);
    return (int64_t)v;
  };
  s->width_ = le32(4);
  s->height_ = le32(8);
  s->col_w_ = le32(12);
  s->data_off_ = le32(24);
  if (s->width_ <= 0 || s->height_ <= 0 || s->col_w_ <= 0 ||
      s->width_ % s->col_w_ != 0 || s->data_off_ < 28) {
    set_wsi_error("VMU: implausible NGR geometry in " + fname);
    return nullptr;
  }
  const double phys_w_nm =
      wsi_ini_get_double(ini, section, "PhysicalWidth", 0.0);
  if (phys_w_nm > 0) s->mpp_ = phys_w_nm / (double)s->width_ / 1000.0;
  s->description_ = "Hamamatsu VMU " + std::to_string(s->width_) + "x" +
                    std::to_string(s->height_);
  return s.release();
}

}  // namespace

ISlide* open_vms_slide(const char* path) {
  WsiIniMap ini;
  if (!wsi_parse_ini(path, &ini)) {
    set_wsi_error(std::string("cannot read ") + path);
    return nullptr;
  }
  static const char kVms[] = "Virtual Microscope Specimen";
  static const char kVmu[] = "Uncompressed Virtual Microscope Specimen";
  if (ini.count(kVmu)) return VmuSlide::open(path, ini, kVmu);
  if (ini.count(kVms)) return VmsSlide::open(path, ini, kVms);
  set_wsi_error(std::string(path) +
                ": no Hamamatsu specimen section in stub file");
  return nullptr;
}
