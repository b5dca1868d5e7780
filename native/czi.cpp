// czi.cpp — Zeiss CZI (ZISRAW) backend for the native WSI reader.
//
// The reference pipeline opens .czi through OpenSlide (reference
// src/stamp/preprocessing/__init__.py:43-56).  CZI is a single-file
// segment container (public ZISRAW specification; libCZI is the vendor's
// open implementation): 32-byte-aligned segments, each headed by a
// 16-char id + allocated/used sizes.  The "ZISRAWFILE" header segment
// points at a "ZISRAWDIRECTORY" segment listing every image subblock as a
// DV entry (pixel type, compression, file position, and a dimension list
// with logical Start/Size and StoredSize per axis).  Pyramid levels are
// implicit: a subblock whose logical X/Y size is k× its stored size is a
// k×-downsampled tile; mosaics tile the plane via their X/Y starts.
//
// Decoding profile:
//   pixel types   Gray8, Gray16, Bgr24, Bgr48  → packed RGB
//   compressions  none, JPEG (libjpeg), zstd0, zstd1 incl. the hi/lo byte
//                 deinterleave flag (libzstd), JPEG XR via the in-repo
//                 T.832 codec (native/jxr.cpp — see its header for the
//                 zero-egress validation caveat)
//   an undecodable subblock fails with a named error and renders as
//   background; the rest of the slide still renders (resilience over abort).
//
// Selection: one plane — the first index of every dimension other than
// X/Y/S/M (channel 0, first Z/T/...); all scenes and mosaic tiles of that
// plane participate.  µm/px comes from the XML metadata segment's
// Scaling/Distance(X) item (meters → µm).

#include "islide.h"

#include <zstd.h>

#include "jxr.h"

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

#include "rtutil.h"

namespace {

constexpr int32_t kPixGray8 = 0, kPixGray16 = 1, kPixBgr24 = 3,
                  kPixBgr48 = 4;
constexpr int32_t kCompNone = 0, kCompJpeg = 1, kCompJpegXr = 4,
                  kCompZstd0 = 5, kCompZstd1 = 6;

int64_t rd_i64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 7; i >= 0; --i) v = (v << 8) | p[i];
  return (int64_t)v;
}
int32_t rd_i32(const uint8_t* p) {
  return (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                   ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24));
}

struct SubBlock {
  int64_t file_pos = 0;     // offset of the ZISRAWSUBBLOCK segment
  int32_t pixel_type = 0;
  int32_t compression = 0;
  int32_t ratio = 1;        // logical/stored downsample (1 = level 0)
  int64_t x = 0, y = 0;     // logical (level-0) position
  int64_t sw = 0, sh = 0;   // stored pixel size
  std::map<std::string, int32_t> plane;  // non-XYSM dimension starts
};

struct Level {
  int32_t ratio = 1;
  int64_t width = 0, height = 0;
  std::vector<int32_t> blocks;  // indices into blocks_
};

int bytes_per_pixel(int32_t pt) {
  switch (pt) {
    case kPixGray8: return 1;
    case kPixGray16: return 2;
    case kPixBgr24: return 3;
    case kPixBgr48: return 6;
    default: return 0;
  }
}

// Convert a tightly packed stored-format buffer to packed RGB.
bool to_rgb(int32_t pt, const std::vector<uint8_t>& raw, int64_t w, int64_t h,
            std::vector<uint8_t>* rgb) {
  const int bpp = bytes_per_pixel(pt);
  if ((int64_t)raw.size() < w * h * bpp) return false;
  rgb->resize((size_t)(w * h * 3));
  const uint8_t* s = raw.data();
  uint8_t* d = rgb->data();
  const int64_t n = w * h;
  switch (pt) {
    case kPixGray8:
      for (int64_t i = 0; i < n; ++i) {
        d[3 * i] = d[3 * i + 1] = d[3 * i + 2] = s[i];
      }
      return true;
    case kPixGray16:  // high byte of the little-endian sample
      for (int64_t i = 0; i < n; ++i) {
        d[3 * i] = d[3 * i + 1] = d[3 * i + 2] = s[2 * i + 1];
      }
      return true;
    case kPixBgr24:
      for (int64_t i = 0; i < n; ++i) {
        d[3 * i] = s[3 * i + 2];
        d[3 * i + 1] = s[3 * i + 1];
        d[3 * i + 2] = s[3 * i];
      }
      return true;
    case kPixBgr48:  // three little-endian ushorts, B G R
      for (int64_t i = 0; i < n; ++i) {
        d[3 * i] = s[6 * i + 5];
        d[3 * i + 1] = s[6 * i + 3];
        d[3 * i + 2] = s[6 * i + 1];
      }
      return true;
    default:
      return false;
  }
}

class CziSlide : public ISlide {
 public:
  static CziSlide* open(const char* path);
  ~CziSlide() override {
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
    return render(0, x, y, w, h, (uint8_t*)out);
  }
  int32_t read_level(int32_t l, void* out) override {
    if (!valid(l)) return 1;
    return render(l, 0, 0, levels_[l].width, levels_[l].height,
                  (uint8_t*)out);
  }

 private:
  CziSlide() : cache_(128u << 20) {}

  bool valid(int32_t l) const { return l >= 0 && l < (int32_t)levels_.size(); }

  // Decode subblock `bi`'s payload into packed RGB (cached).
  const std::vector<uint8_t>* block_rgb(int32_t bi);
  bool read_payload(const SubBlock& b, std::vector<uint8_t>* raw);
  int32_t render(int32_t l, int64_t x, int64_t y, int64_t w, int64_t h,
                 uint8_t* out);

  FILE* f_ = nullptr;
  std::vector<SubBlock> blocks_;
  std::vector<Level> levels_;  // sorted by ratio ascending; [0] = full res
  std::string description_;
  double mpp_ = -1.0;
  int64_t decode_errors_ = 0;
  WsiChunkCache cache_;
};

// Fetch the subblock's compressed/raw payload.  The segment re-states its
// own DV entry; the payload begins after max(256, 16 + entry) bytes of
// fixed part + entry + fill, then MetadataSize bytes of per-block XML.
bool CziSlide::read_payload(const SubBlock& b, std::vector<uint8_t>* raw) {
  uint8_t seg[32];
  if (fseeko(f_, (off_t)b.file_pos, SEEK_SET) != 0 ||
      std::fread(seg, 1, 32, f_) != 32 ||
      std::memcmp(seg, "ZISRAWSUBBLOCK", 14) != 0)
    return false;
  uint8_t fixed[16];
  if (std::fread(fixed, 1, 16, f_) != 16) return false;
  const int32_t meta_size = rd_i32(fixed);
  const int64_t data_size = rd_i64(fixed + 8);
  uint8_t entry_head[32];
  if (std::fread(entry_head, 1, 32, f_) != 32) return false;
  const int32_t dim_count = rd_i32(entry_head + 28);
  if (dim_count < 0 || dim_count > 64) return false;
  const int64_t entry_size = 32 + 20 * (int64_t)dim_count;
  const int64_t data_off = std::max<int64_t>(256, 16 + entry_size) + meta_size;
  // bound the per-subblock payload: a corrupt directory entry must not be
  // able to demand a gigabyte zero-filled allocation per render attempt
  if (data_size < 0 || data_size > (int64_t)256 << 20) return false;
  if (fseeko(f_, (off_t)(b.file_pos + 32 + data_off), SEEK_SET) != 0)
    return false;
  raw->resize((size_t)data_size);
  return std::fread(raw->data(), 1, raw->size(), f_) == raw->size();
}

const std::vector<uint8_t>* CziSlide::block_rgb(int32_t bi) {
  const uint64_t key = (uint64_t)bi;
  if (const auto* hit = cache_.get(key)) return hit;
  const SubBlock& b = blocks_[bi];

  std::vector<uint8_t> raw;
  if (!read_payload(b, &raw)) {
    ++decode_errors_;
    set_wsi_error("CZI: truncated subblock, rendered as background");
    return nullptr;
  }

  std::vector<uint8_t> stored;  // tightly packed b.pixel_type samples
  switch (b.compression) {
    case kCompNone:
      stored = std::move(raw);
      break;
    case kCompJpeg: {
      std::vector<uint8_t> rgbj;
      int jw = 0, jh = 0;
      if (!wsi_decode_jpeg(raw.data(), raw.size(), &rgbj, &jw, &jh) ||
          jw != b.sw || jh != b.sh) {
        ++decode_errors_;
        set_wsi_error("CZI: undecodable JPEG subblock");
        return nullptr;
      }
      // libjpeg hands us RGB (grayscale already replicated); cache as-is
      return cache_.put(key, std::move(rgbj));
    }
    case kCompZstd0:
    case kCompZstd1: {
      size_t off = 0;
      bool hilo = false;
      if (b.compression == kCompZstd1) {
        // 1-byte header-size prefix; size 3 adds a chunk (id 1) whose
        // payload bit 0 requests hi/lo byte deinterleaving of 16-bit data
        if (raw.empty() || (raw[0] != 1 && raw[0] != 3) ||
            raw.size() < raw[0]) {
          ++decode_errors_;
          set_wsi_error("CZI: malformed zstd1 header");
          return nullptr;
        }
        off = raw[0];
        if (raw[0] == 3) {
          if (raw[1] != 1) {
            ++decode_errors_;
            set_wsi_error("CZI: unknown zstd1 parameter chunk");
            return nullptr;
          }
          hilo = (raw[2] & 1) != 0;
        }
      }
      const size_t want = (size_t)(b.sw * b.sh * bytes_per_pixel(b.pixel_type));
      stored.resize(want);
      const size_t got = ZSTD_decompress(stored.data(), stored.size(),
                                         raw.data() + off, raw.size() - off);
      if (ZSTD_isError(got) || got != want) {
        ++decode_errors_;
        set_wsi_error("CZI: zstd subblock decompression failed");
        return nullptr;
      }
      if (hilo) {  // planar low-bytes ‖ high-bytes → interleaved words
        const size_t half = want / 2;
        std::vector<uint8_t> mixed(want);
        for (size_t i = 0; i < half; ++i) {
          mixed[2 * i] = stored[i];
          mixed[2 * i + 1] = stored[half + i];
        }
        stored = std::move(mixed);
      }
      break;
    }
    case kCompJpegXr: {
      // in-repo T.832 codec (native/jxr.cpp) — decodes straight to RGB
      std::vector<uint8_t> rgbx;
      int jw = 0, jh = 0;
      std::string jerr;
      if (!jxr::decode(raw.data(), raw.size(), &rgbx, &jw, &jh, &jerr) ||
          jw != b.sw || jh != b.sh) {
        ++decode_errors_;
        set_wsi_error("CZI: JPEG-XR subblock failed to decode (" +
                      (jerr.empty() ? std::string("size mismatch") : jerr) +
                      "), rendered as background");
        return nullptr;
      }
      return cache_.put(key, std::move(rgbx));
    }
    default:
      ++decode_errors_;
      set_wsi_error("CZI: unsupported subblock compression " +
                    std::to_string(b.compression));
      return nullptr;
  }

  std::vector<uint8_t> rgb;
  if (!to_rgb(b.pixel_type, stored, b.sw, b.sh, &rgb)) {
    ++decode_errors_;
    set_wsi_error("CZI: subblock pixel conversion failed");
    return nullptr;
  }
  return cache_.put(key, std::move(rgb));
}

int32_t CziSlide::render(int32_t l, int64_t x, int64_t y, int64_t w, int64_t h,
                         uint8_t* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  wsi_fill_white(out, w * h);
  const Level& lv = levels_[l];
  for (int32_t bi : lv.blocks) {
    const SubBlock& b = blocks_[bi];
    const int64_t bx = b.x / lv.ratio, by = b.y / lv.ratio;
    if (bx >= x + w || by >= y + h || bx + b.sw <= x || by + b.sh <= y)
      continue;
    const auto* rgb = block_rgb(bi);
    if (!rgb) continue;  // background stays — resilience over abort
    wsi_blit_rgb(rgb->data(), b.sw, b.sh, bx, by, x, y, w, h, out);
  }
  return 0;
}

CziSlide* CziSlide::open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_wsi_error("CZI: cannot open file");
    return nullptr;
  }
  auto fail = [&](const std::string& msg) -> CziSlide* {
    set_wsi_error("CZI: " + msg);
    std::fclose(f);
    return nullptr;
  };

  uint8_t seg[32], head[80];
  if (std::fread(seg, 1, 32, f) != 32 ||
      std::memcmp(seg, "ZISRAWFILE", 10) != 0)
    return fail("not a ZISRAW container");
  if (std::fread(head, 1, 80, f) != 80) return fail("truncated file header");
  const int64_t dir_pos = rd_i64(head + 52);
  const int64_t meta_pos = rd_i64(head + 60);
  if (dir_pos <= 0) return fail("no subblock directory");

  // --- subblock directory ------------------------------------------------
  if (fseeko(f, (off_t)dir_pos, SEEK_SET) != 0 ||
      std::fread(seg, 1, 32, f) != 32 ||
      std::memcmp(seg, "ZISRAWDIRECTORY", 15) != 0)
    return fail("bad directory segment");
  const int64_t dir_used = rd_i64(seg + 24);
  std::vector<uint8_t> dir((size_t)std::max<int64_t>(dir_used, 128));
  if (std::fread(dir.data(), 1, dir.size(), f) != dir.size())
    return fail("truncated directory segment");
  const int32_t n_entries = rd_i32(dir.data());
  if (n_entries <= 0 || n_entries > 4'000'000)
    return fail("implausible directory entry count");

  std::vector<SubBlock> blocks;
  size_t pos = 128;  // 4-byte count + 124 reserved
  for (int32_t i = 0; i < n_entries; ++i) {
    if (pos + 32 > dir.size()) return fail("directory overruns its segment");
    const uint8_t* e = dir.data() + pos;
    if (e[0] != 'D' || e[1] != 'V')
      return fail("non-DV directory entry (unsupported CZI variant)");
    SubBlock b;
    b.pixel_type = rd_i32(e + 2);
    b.file_pos = rd_i64(e + 6);
    b.compression = rd_i32(e + 18);
    const int32_t dim_count = rd_i32(e + 28);
    if (dim_count < 0 || dim_count > 64 || pos + 32 + 20 * dim_count > dir.size())
      return fail("implausible dimension count");
    int64_t xsize = 0, ysize = 0;
    for (int32_t d = 0; d < dim_count; ++d) {
      const uint8_t* de = e + 32 + 20 * d;
      char name[5] = {0};
      std::memcpy(name, de, 4);
      const int32_t start = rd_i32(de + 4);
      const int32_t size = rd_i32(de + 8);
      const int32_t stored = rd_i32(de + 16);
      if (std::strcmp(name, "X") == 0) {
        b.x = start;
        xsize = size;
        b.sw = stored ? stored : size;
      } else if (std::strcmp(name, "Y") == 0) {
        b.y = start;
        ysize = size;
        b.sh = stored ? stored : size;
      } else if (std::strcmp(name, "S") != 0 && std::strcmp(name, "M") != 0) {
        b.plane[name] = start;
      }
    }
    pos += 32 + 20 * dim_count;
    if (b.sw <= 0 || b.sh <= 0) continue;
    // stored size bounds the decode buffers (zstd/to_rgb); corrupt entries
    // must not be able to demand multi-GiB allocations per subblock
    if (b.sw > (1 << 20) || b.sh > (1 << 20) || b.sw * b.sh > (int64_t)1 << 26)
      continue;
    b.ratio = (int32_t)std::llround((double)xsize / (double)b.sw);
    if (b.ratio < 1) b.ratio = 1;
    if (ysize > 0 &&
        std::llround((double)ysize / (double)b.sh) != b.ratio)
      continue;  // anisotropic downsample — not a pyramid tile we model
    blocks.push_back(std::move(b));
  }
  if (blocks.empty()) return fail("no image subblocks");

  // --- one plane: first index of every non-XYSM dimension -----------------
  std::map<std::string, int32_t> first;
  for (const auto& b : blocks)
    for (const auto& [k, v] : b.plane) {
      auto it = first.find(k);
      if (it == first.end() || v < it->second) first[k] = v;
    }
  std::vector<SubBlock> plane;
  for (auto& b : blocks) {
    bool keep = true;
    for (const auto& [k, v] : b.plane)
      if (v != first[k]) keep = false;
    if (keep) plane.push_back(std::move(b));
  }
  if (plane.empty()) return fail("no subblocks on the first plane");

  // --- global origin + pyramid levels ------------------------------------
  int64_t ox = INT64_MAX, oy = INT64_MAX;
  for (const auto& b : plane)
    if (b.ratio == 1) {
      ox = std::min(ox, b.x);
      oy = std::min(oy, b.y);
    }
  if (ox == INT64_MAX) return fail("no full-resolution subblocks");

  CziSlide* s = new CziSlide();
  std::map<int32_t, Level> by_ratio;
  for (auto& b : plane) {
    b.x -= ox;
    b.y -= oy;
    Level& lv = by_ratio[b.ratio];
    lv.ratio = b.ratio;
    s->blocks_.push_back(b);
    lv.blocks.push_back((int32_t)s->blocks_.size() - 1);
    lv.width = std::max(lv.width, b.x / b.ratio + b.sw);
    lv.height = std::max(lv.height, b.y / b.ratio + b.sh);
  }
  for (auto& [r, lv] : by_ratio) s->levels_.push_back(std::move(lv));
  std::sort(s->levels_.begin(), s->levels_.end(),
            [](const Level& a, const Level& b) { return a.ratio < b.ratio; });
  s->f_ = f;

  // --- µm/px from the metadata XML (Scaling Distance X, meters) ----------
  if (meta_pos > 0 && fseeko(f, (off_t)meta_pos, SEEK_SET) == 0 &&
      std::fread(seg, 1, 32, f) == 32 &&
      std::memcmp(seg, "ZISRAWMETADATA", 14) == 0) {
    uint8_t mh[16];
    if (std::fread(mh, 1, 16, f) == 16) {
      const int32_t xml_size = rd_i32(mh);
      if (xml_size > 0 && xml_size < (64 << 20) &&
          fseeko(f, (off_t)(meta_pos + 32 + 256), SEEK_SET) == 0) {
        std::string xml((size_t)xml_size, '\0');
        if (std::fread(xml.data(), 1, xml.size(), f) == xml.size()) {
          const size_t at = xml.find("Id=\"X\"");
          if (at != std::string::npos) {
            const size_t v0 = xml.find("<Value>", at);
            if (v0 != std::string::npos) {
              const double meters = std::atof(xml.c_str() + v0 + 7);
              if (meters > 0) s->mpp_ = meters * 1e6;
            }
          }
        }
      }
    }
  }
  return s;
}

}  // namespace

ISlide* open_czi_slide(const char* path) { return CziSlide::open(path); }
