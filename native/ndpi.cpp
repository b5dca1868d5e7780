// ndpi.cpp — Hamamatsu NDPI ≥4 GiB backend for the native WSI reader.
//
// NDPI is a classic (32-bit-offset) TIFF with vendor tags (reference
// pipeline opens it through OpenSlide, reference
// src/stamp/preprocessing/__init__.py:43-56).  Files under 4 GiB read fine
// through libtiff (wsireader.cpp); above 4 GiB every stored offset is the
// low 32 bits of the real one, which libtiff cannot know.  This backend
// walks the IFD chain itself and reconstructs full offsets with
// OpenSlide's convention (documented in their Hamamatsu format notes):
//
//     real = (diroff & ~0xffffffff) | stored          // same 4 GiB window
//     if (real < diroff) real += 1 << 32;             //  … or the next one
//
// i.e. data referenced by a directory lives in the directory's own 4 GiB
// window, or — if the reconstructed offset would point *before* the
// directory — in the window after it.  The same fixup applies to the
// next-IFD pointers, strip offsets, and out-of-line tag values.
//
// Decoding profile: strip-organized levels, uncompressed (PackBits-free)
// or JPEG strips.  Levels wider/taller than JPEG's 65535-px SOF fields
// (ubiquitous in real ≥4 GiB scans) store zeroed dimensions and decode
// through restart-marker reconstruction (jpegrt.h) against the fixed-up
// strip offsets — the same mechanism ndpihuge.cpp uses for smaller files.

#include "islide.h"

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "jpegrt.h"
#include "rtutil.h"

namespace {

constexpr int64_t kJpegDimLimit = 65500;

constexpr uint64_t kWindow = 1ull << 32;

uint64_t fix_offset(uint64_t diroff, uint64_t stored) {
  uint64_t real = (diroff & ~(kWindow - 1)) | (stored & (kWindow - 1));
  if (real < diroff) real += kWindow;
  return real;
}

struct Reader {
  FILE* f = nullptr;
  bool ok = true;

  bool seek(uint64_t off) {
    // every offset this backend reconstructs is ≥ 4 GiB by definition —
    // use the 64-bit seek, not fseek's long (32-bit on ILP32/Windows)
#ifdef _WIN32
    ok = ok && _fseeki64(f, (long long)off, SEEK_SET) == 0;
#else
    ok = ok && fseeko(f, (off_t)off, SEEK_SET) == 0;
#endif
    return ok;
  }
  uint16_t u16() {
    uint8_t b[2] = {0, 0};
    ok = ok && std::fread(b, 1, 2, f) == 2;
    return (uint16_t)(b[0] | (b[1] << 8));
  }
  uint32_t u32() {
    uint8_t b[4] = {0, 0, 0, 0};
    ok = ok && std::fread(b, 1, 4, f) == 4;
    return (uint32_t)b[0] | ((uint32_t)b[1] << 8) | ((uint32_t)b[2] << 16) |
           ((uint32_t)b[3] << 24);
  }
  bool bytes(void* dst, size_t n) {
    ok = ok && std::fread(dst, 1, n, f) == n;
    return ok;
  }
};

struct IfdEntry {
  uint16_t tag = 0;
  uint16_t type = 0;
  uint32_t count = 0;
  uint32_t value = 0;  // inline value or (wrapped) offset to the values
};

size_t type_size(uint16_t type) {
  switch (type) {
    case 1: case 2: case 6: case 7: return 1;   // BYTE/ASCII/SBYTE/UNDEF
    case 3: case 8: return 2;                   // SHORT
    case 4: case 9: case 11: return 4;          // LONG/SLONG/FLOAT
    case 5: case 10: case 12: return 8;         // RATIONAL/DOUBLE
    default: return 0;
  }
}

struct NdpiDir {
  uint64_t diroff = 0;
  int64_t width = 0, height = 0;
  int64_t rows_per_strip = 0;
  int32_t compression = 1;  // 1 = none, 6/7 = JPEG
  int32_t samples = 3;
  double xres = 0.0;  // pixels per resolution unit
  int32_t res_unit = 2;
  std::string description;
  std::vector<uint64_t> strip_offsets;
  std::vector<uint64_t> strip_counts;

  // restart-marker reconstruction state for levels beyond the JPEG SOF
  // dimension limit (lazy; scanned on the level's first read)
  bool huge_jpeg = false;
  std::unique_ptr<RtJpeg> jpeg;
  bool jpeg_failed = false;
};

class NdpiSlide : public ISlide {
 public:
  static NdpiSlide* open(const char* path);
  ~NdpiSlide() override {
    if (f_) std::fclose(f_);
  }

  int64_t width() const override { return levels_[0].width; }
  int64_t height() const override { return levels_[0].height; }
  int32_t level_count() const override { return (int32_t)levels_.size(); }
  int64_t level_width(int32_t l) const override {
    return valid(l) ? levels_[l].width : 0;
  }
  int64_t level_height(int32_t l) const override {
    return valid(l) ? levels_[l].height : 0;
  }
  const std::string& description() const override { return description_; }
  double mpp() const override { return mpp_; }

  int64_t decode_errors() const override { return decode_errors_; }

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override {
    return read_from_level(levels_[0], x, y, w, h, (uint8_t*)out);
  }
  int32_t read_level(int32_t l, void* out) override {
    if (!valid(l)) return 1;
    NdpiDir& d = levels_[l];
    return read_from_level(d, 0, 0, d.width, d.height, (uint8_t*)out);
  }

 private:
  NdpiSlide() : cache_(128u << 20) {}

  bool valid(int32_t l) const { return l >= 0 && l < (int32_t)levels_.size(); }

  // Chunked read of a huge-JPEG level via restart-marker reconstruction.
  int32_t read_huge(NdpiDir& d, int64_t x, int64_t y, int64_t w, int64_t h,
                    uint8_t* out) {
    if (!d.jpeg && !d.jpeg_failed) {
      auto j = std::make_unique<RtJpeg>();
      std::string err;
      if (!j->open_span(path_, (int64_t)d.strip_offsets[0],
                        (int64_t)d.strip_counts[0], d.width, d.height,
                        &err)) {
        set_wsi_error("NDPI huge level: " + err);
        d.jpeg_failed = true;
      } else {
        d.jpeg = std::move(j);
      }
    }
    if (!d.jpeg) return 5;
    RtJpeg& j = *d.jpeg;
    const int64_t x0 = std::max<int64_t>(0, x);
    const int64_t y0 = std::max<int64_t>(0, y);
    const int64_t x1 = std::min<int64_t>(d.width, x + w);
    const int64_t y1 = std::min<int64_t>(d.height, y + h);
    if (x0 >= x1 || y0 >= y1) return 0;
    for (int32_t cy = (int32_t)(y0 / j.chunk_h());
         cy <= (int32_t)((y1 - 1) / j.chunk_h()); ++cy) {
      for (int32_t cx = (int32_t)(x0 / j.chunk_w());
           cx <= (int32_t)((x1 - 1) / j.chunk_w()); ++cx) {
        const uint64_t key = ((uint64_t)d.diroff << 32) ^
                             ((uint64_t)(uint32_t)cy << 20) ^ (uint32_t)cx;
        const std::vector<uint8_t>* rgb = cache_.get(key);
        if (!rgb) {
          std::vector<uint8_t> dec;
          if (!j.decode_chunk(cx, cy, &dec)) {
            ++decode_errors_;
            set_wsi_error(
                "NDPI: undecodable restart chunk, rendered as background");
            continue;  // background stays — resilience over abort
          }
          rgb = cache_.put(key, std::move(dec));
        }
        wsi_blit_rgb(rgb->data(), j.chunk_px_w(cx), j.chunk_px_h(cy),
                     (int64_t)cx * j.chunk_w(), (int64_t)cy * j.chunk_h(),
                     x, y, w, h, out);
      }
    }
    return 0;
  }

  // Decode strip `s` of level `d` into packed RGB rows (full width).
  bool decode_strip(const NdpiDir& d, size_t s, std::vector<uint8_t>* rgb,
                    int64_t* rows) {
    const int64_t first_row = (int64_t)s * d.rows_per_strip;
    *rows = std::min<int64_t>(d.rows_per_strip, d.height - first_row);
    const uint64_t len = d.strip_counts[s];
    // ordinary (non-reconstructed) strips are at most a level's JPEG; a
    // corrupt count must not demand a multi-GiB zero-filled buffer
    if (len > (uint64_t)512 << 20) return fail("implausible strip size");
    std::vector<uint8_t> raw((size_t)len);
    Reader r{f_};
    if (!r.seek(d.strip_offsets[s]) || !r.bytes(raw.data(), raw.size()))
      return fail("truncated strip data");

    if (d.compression == 1) {  // uncompressed, 8-bit RGB or grayscale
      const size_t expect = (size_t)(*rows) * d.width * d.samples;
      if (raw.size() < expect) return fail("short uncompressed strip");
      if (d.samples == 3) {
        rgb->assign(raw.begin(), raw.begin() + expect);
      } else {  // grayscale → replicate
        rgb->resize((size_t)(*rows) * d.width * 3);
        for (size_t i = 0; i < (size_t)(*rows) * d.width; ++i) {
          (*rgb)[3 * i] = (*rgb)[3 * i + 1] = (*rgb)[3 * i + 2] = raw[i];
        }
      }
      return true;
    }
    if (d.compression == 6 || d.compression == 7) {
      int jw = 0, jh = 0;
      if (!wsi_decode_jpeg(raw.data(), raw.size(), rgb, &jw, &jh)) {
        return fail("undecodable NDPI JPEG strip");
      }
      if (jw != d.width || jh < *rows) return fail("JPEG strip size mismatch");
      return true;
    }
    return fail("unsupported NDPI compression " +
                std::to_string(d.compression));
  }

  int32_t read_from_level(NdpiDir& d, int64_t x, int64_t y, int64_t w,
                          int64_t h, uint8_t* out) {
    if (!out || w <= 0 || h <= 0) return 1;
    wsi_fill_white(out, w * h);  // background = opaque white
    if (d.huge_jpeg) return read_huge(d, x, y, w, h, out);

    const int64_t x0 = std::max<int64_t>(x, 0), x1 = std::min(x + w, d.width);
    const int64_t y0 = std::max<int64_t>(y, 0), y1 = std::min(y + h, d.height);
    if (x0 >= x1 || y0 >= y1) return 0;

    for (int64_t sy = (y0 / d.rows_per_strip) * d.rows_per_strip; sy < y1;
         sy += d.rows_per_strip) {
      const size_t s = (size_t)(sy / d.rows_per_strip);
      if (s >= d.strip_offsets.size()) break;
      std::vector<uint8_t> rgb;
      int64_t rows = 0;
      if (!decode_strip(d, s, &rgb, &rows)) return 5;
      const int64_t cy0 = std::max(sy, y0);
      const int64_t cy1 = std::min(sy + rows, y1);
      for (int64_t iy = cy0; iy < cy1; ++iy) {
        const uint8_t* src = rgb.data() + ((iy - sy) * d.width + x0) * 3;
        uint8_t* dst = out + ((iy - y) * w + (x0 - x)) * 4;
        for (int64_t ix = 0; ix < x1 - x0; ++ix) {
          dst[4 * ix] = src[3 * ix];
          dst[4 * ix + 1] = src[3 * ix + 1];
          dst[4 * ix + 2] = src[3 * ix + 2];
          dst[4 * ix + 3] = 0xFF;
        }
      }
    }
    return 0;
  }

  static bool fail(const std::string& msg) {
    set_wsi_error("NDPI: " + msg);
    return false;
  }

  FILE* f_ = nullptr;
  std::string path_;
  std::vector<NdpiDir> levels_;  // sorted by width, descending
  std::string description_;
  double mpp_ = -1.0;
  int64_t decode_errors_ = 0;
  WsiChunkCache cache_;
};

// Read one numeric value of `type` from a byte buffer.
uint64_t read_numeric(const uint8_t* p, uint16_t type) {
  switch (type) {
    case 1: case 2: case 6: case 7: return p[0];
    case 3: return (uint64_t)p[0] | ((uint64_t)p[1] << 8);
    case 4: case 9: case 11:
      return (uint64_t)p[0] | ((uint64_t)p[1] << 8) | ((uint64_t)p[2] << 16) |
             ((uint64_t)p[3] << 24);
    default: return 0;
  }
}

// Fetch a tag's values as integers (inline or out-of-line, offsets fixed
// up against the directory position).
bool tag_values(Reader* r, const IfdEntry& e, uint64_t diroff,
                std::vector<uint64_t>* out) {
  const size_t ts = type_size(e.type);
  if (ts == 0) return false;
  // corrupt counts (up to 2³²) must not demand a 32 GB zero-filled buffer;
  // no real NDPI tag carries more than a few thousand values
  if (e.count > (uint32_t)1 << 22) return false;
  const size_t total = ts * e.count;
  std::vector<uint8_t> buf(std::max<size_t>(total, 4), 0);
  if (total <= 4) {
    const uint32_t v = e.value;
    buf[0] = (uint8_t)v;
    buf[1] = (uint8_t)(v >> 8);
    buf[2] = (uint8_t)(v >> 16);
    buf[3] = (uint8_t)(v >> 24);
  } else {
    if (!r->seek(fix_offset(diroff, e.value)) || !r->bytes(buf.data(), total))
      return false;
  }
  out->clear();
  for (uint32_t i = 0; i < e.count; ++i) {
    if (e.type == 5) {  // RATIONAL: num/den → rounded integer ratio ×1000
      const uint64_t num = read_numeric(buf.data() + 8 * i, 4);
      const uint64_t den = read_numeric(buf.data() + 8 * i + 4, 4);
      out->push_back(den ? (uint64_t)std::llround(1000.0 * num / den) : 0);
    } else {
      out->push_back(read_numeric(buf.data() + ts * i, e.type));
    }
  }
  return true;
}

NdpiSlide* NdpiSlide::open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_wsi_error("NDPI: cannot open file");
    return nullptr;
  }
  Reader r{f};
  uint8_t magic[4];
  if (!r.bytes(magic, 4) || std::memcmp(magic, "II*\0", 4) != 0) {
    set_wsi_error("NDPI: not a little-endian classic TIFF");
    std::fclose(f);
    return nullptr;
  }
  uint64_t diroff = r.u32();  // the first IFD offset cannot wrap

  std::vector<NdpiDir> dirs;
  std::string description;
  while (diroff != 0 && r.ok && dirs.size() < 64) {
    if (!r.seek(diroff)) break;
    const uint16_t n_entries = r.u16();
    std::vector<IfdEntry> entries(n_entries);
    for (auto& e : entries) {
      e.tag = r.u16();
      e.type = r.u16();
      e.count = r.u32();
      e.value = r.u32();
    }
    const uint64_t next_stored = r.u32();
    if (!r.ok) break;

    NdpiDir d;
    d.diroff = diroff;
    std::vector<uint64_t> v;
    for (const auto& e : entries) {
      switch (e.tag) {
        case 256: if (tag_values(&r, e, diroff, &v)) d.width = (int64_t)v[0]; break;
        case 257: if (tag_values(&r, e, diroff, &v)) d.height = (int64_t)v[0]; break;
        case 259: if (tag_values(&r, e, diroff, &v)) d.compression = (int32_t)v[0]; break;
        case 277: if (tag_values(&r, e, diroff, &v)) d.samples = (int32_t)v[0]; break;
        case 278: if (tag_values(&r, e, diroff, &v)) d.rows_per_strip = (int64_t)v[0]; break;
        case 273:
          if (tag_values(&r, e, diroff, &v)) {
            for (uint64_t off : v)
              d.strip_offsets.push_back(fix_offset(diroff, off));
          }
          break;
        case 279:
          if (tag_values(&r, e, diroff, &v)) d.strip_counts = v;
          break;
        case 282:
          if (tag_values(&r, e, diroff, &v)) d.xres = v[0] / 1000.0;
          break;
        case 296: if (tag_values(&r, e, diroff, &v)) d.res_unit = (int32_t)v[0]; break;
        case 270: {  // ImageDescription
          if (e.count > (uint32_t)16 << 20) break;  // corrupt-count guard
          std::vector<uint8_t> buf(e.count);
          if (e.count <= 4) {
            std::memcpy(buf.data(), &e.value, e.count);
          } else if (!r.seek(fix_offset(diroff, e.value)) ||
                     !r.bytes(buf.data(), e.count)) {
            break;
          }
          description.assign((const char*)buf.data(),
                             strnlen((const char*)buf.data(), buf.size()));
          break;
        }
        default: break;
      }
    }
    if (d.rows_per_strip == 0) d.rows_per_strip = d.height;
    if (d.width > 0 && d.height > 0 && !d.strip_offsets.empty() &&
        d.strip_offsets.size() == d.strip_counts.size()) {
      // single-strip JPEG level past the SOF dimension fields ⇒ zeroed SOF
      // dims, restart-marker reconstruction (read_huge) instead of strips
      d.huge_jpeg = (d.compression == 6 || d.compression == 7) &&
                    d.strip_offsets.size() == 1 &&
                    (d.width > kJpegDimLimit || d.height > kJpegDimLimit);
      dirs.push_back(std::move(d));
    }
    diroff = next_stored ? fix_offset(diroff, next_stored) : 0;
  }
  if (dirs.empty()) {
    set_wsi_error("NDPI: no readable image directories");
    std::fclose(f);
    return nullptr;
  }

  // pyramid = directories sorted by width, descending (macro/map images in
  // real NDPI files are distinguished by the SourceLens tag; width ordering
  // subsumes that for the decodable profile)
  std::sort(dirs.begin(), dirs.end(),
            [](const NdpiDir& a, const NdpiDir& b) { return a.width > b.width; });

  NdpiSlide* s = new NdpiSlide();
  s->f_ = f;
  s->path_ = path;
  s->levels_ = std::move(dirs);
  s->description_ = description;
  const NdpiDir& l0 = s->levels_[0];
  if (l0.xres > 0) {
    // resolution unit 3 = centimeter → µm/px = 10000 / (px per cm)
    const double per_um = l0.res_unit == 3 ? l0.xres / 10000.0
                         : l0.res_unit == 2 ? l0.xres / 25400.0
                                            : 0.0;
    if (per_um > 0) s->mpp_ = 1.0 / per_um;
  }
  return s;
}

}  // namespace

ISlide* open_ndpi_slide(const char* path) { return NdpiSlide::open(path); }
