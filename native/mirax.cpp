// mirax.cpp — 3DHISTECH MIRAX (.mrxs) backend for the native WSI reader.
//
// MIRAX is a multi-file vendor container (reference pipeline opens it through
// OpenSlide, reference src/stamp/preprocessing/__init__.py:43-56): a stub
// `Slide.mrxs` file next to a `Slide/` data directory holding
//
//   Slidedat.ini   — INI metadata: camera grid (IMAGENUMBER_X/Y), per-zoom
//                    sections (DIGITIZER_WIDTH/HEIGHT, OVERLAP_X/Y,
//                    MICROMETER_PER_PIXEL_X, IMAGE_FORMAT, IMAGE_FILL_COLOR_BGR,
//                    IMAGE_CONCAT_FACTOR), the hierarchy table and the data
//                    file list.
//   Index.dat      — binary index: 5-byte version + slide id, then offsets of
//                    the hierarchical/nonhierarchical record tables.  Each
//                    record points (via a `0, page_ptr` header) to a linked
//                    list of data pages of (image_index, offset, length,
//                    fileno) entries locating JPEG tiles in the Data files.
//   Data*.dat      — concatenated JPEG tile images, plus non-hierarchical
//                    payloads such as the VIMSLIDE_POSITION_BUFFER (9 bytes
//                    per camera: uint8 flag + int32 x + int32 y in level-0
//                    pixels).
//
// Supported profile (documented; validated against synthetic fixtures —
// real-slide validation is pending in the zero-egress build environment):
//   * JPEG (the overwhelmingly common case), PNG and BMP24 tile formats —
//     the three IMAGE_FORMAT values real scanners emit.  Tiles are
//     dispatched on their magic bytes, so mixed-format containers decode
//     too; other declared formats fail at open with a clear error.
//   * tile positions from VIMSLIDE_POSITION_BUFFER (plain or zlib-compressed,
//     as written by newer scanners) or, when absent, the regular grid implied
//     by DIGITIZER size minus camera OVERLAP.
//   * CameraImageDivisionsPerSide ≥ 1 (each camera image split into d×d
//     stored tiles; positions are per camera, intra-camera tiles abut).
//   * zoom levels exposed as pyramid levels; level L tiles cover
//     IMAGE_CONCAT_FACTOR level-0 tiles at downsample mpp_L / mpp_0.
//
// Level-0 reads are exact; higher levels serve thumbnails.

#include "islide.h"

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

#include <algorithm>
#include <array>
#include <cctype>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <set>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// small helpers
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf env;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(((JpegErrorMgr*)cinfo->err)->env, 1);
}

// Decoder output budget.  Corrupt containers can hand a decoder a stream
// whose header claims up to 65500² px (~13 GB of RGB): libjpeg treats
// truncated entropy data as a warning, not an error, so it would grind
// through billions of synthesized scanlines — found by the sanitizer
// fuzzer (tests/test_native_sanitize.py) as a multi-minute stall on a
// mutated MIRAX index.  64 Mpx is far above any real tile, strip chunk or
// overview image these in-container decoders are ever handed.
constexpr int64_t kMaxDecodePx = int64_t(1) << 26;

// Decode a JPEG byte stream to tightly-packed RGB.  Returns false on any
// decode error (corrupt stream, wrong format).
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  if ((int64_t)*w * *h > kMaxDecodePx) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb->resize((size_t)*w * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + (size_t)cinfo.output_scanline * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Decode a PNG byte stream to tightly-packed RGB via libpng's simplified
// read API (alpha is composited away; palette/gray expand to RGB).
bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return false;
  image.format = PNG_FORMAT_RGB;
  *w = (int)image.width;
  *h = (int)image.height;
  if ((int64_t)*w * *h > kMaxDecodePx) {
    png_image_free(&image);
    return false;
  }
  rgb->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgb->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// Decode an uncompressed BI_RGB Windows BMP (24- or 32-bit — MIRAX's
// "BMP24" tile format): 14-byte file header + BITMAPINFOHEADER, BGR(A)
// rows padded to 4 bytes, bottom-up unless the height field is negative.
bool decode_bmp(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  if (len < 54 || data[0] != 'B' || data[1] != 'M') return false;
  uint32_t pix_off, hdr_size, compression;
  int32_t bw, bh;
  uint16_t bpp;
  std::memcpy(&pix_off, data + 10, 4);
  std::memcpy(&hdr_size, data + 14, 4);
  std::memcpy(&bw, data + 18, 4);
  std::memcpy(&bh, data + 22, 4);
  std::memcpy(&bpp, data + 28, 2);
  std::memcpy(&compression, data + 30, 4);
  if (hdr_size < 40 || compression != 0 || (bpp != 24 && bpp != 32))
    return false;
  const bool top_down = bh < 0;
  const int64_t ah = top_down ? -(int64_t)bh : (int64_t)bh;
  if (bw <= 0 || ah <= 0 || bw > (1 << 20) || ah > (1 << 20) ||
      (int64_t)bw * ah > kMaxDecodePx)
    return false;
  const size_t bytes_px = bpp / 8;
  const size_t stride = ((size_t)bw * bytes_px + 3) & ~(size_t)3;
  if ((size_t)pix_off + stride * (size_t)ah > len) return false;
  *w = (int)bw;
  *h = (int)ah;
  rgb->resize((size_t)bw * ah * 3);
  for (int64_t y = 0; y < ah; ++y) {
    const uint8_t* src =
        data + pix_off + stride * (top_down ? y : ah - 1 - y);
    uint8_t* dst = rgb->data() + (size_t)y * bw * 3;
    for (int64_t x = 0; x < bw; ++x) {
      dst[0] = src[2];  // BGR(A) → RGB
      dst[1] = src[1];
      dst[2] = src[0];
      src += bytes_px;
      dst += 3;
    }
  }
  return true;
}

// Dispatch a stored tile image on its magic bytes.  Real MIRAX containers
// declare one IMAGE_FORMAT per zoom level, but sniffing keeps decode
// correct even for mixed or mislabeled data files.
bool decode_tile_image(const uint8_t* data, size_t len,
                       std::vector<uint8_t>* rgb, int* w, int* h) {
  if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
    return decode_jpeg(data, len, rgb, w, h);
  if (len >= 8 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' &&
      data[3] == 'G')
    return decode_png(data, len, rgb, w, h);
  if (len >= 2 && data[0] == 'B' && data[1] == 'M')
    return decode_bmp(data, len, rgb, w, h);
  return false;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

// Windows-style INI: [section] + key = value lines; tolerates a UTF-8 BOM,
// CRLF endings and ; comments.
using IniMap = std::map<std::string, std::map<std::string, std::string>>;

bool parse_ini(const std::string& path, IniMap* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::string content;
  char buf[4096];
  size_t n;
  while ((n = std::fread(buf, 1, sizeof(buf), f)) > 0) content.append(buf, n);
  std::fclose(f);
  if (content.size() >= 3 && (unsigned char)content[0] == 0xEF &&
      (unsigned char)content[1] == 0xBB && (unsigned char)content[2] == 0xBF) {
    content.erase(0, 3);
  }
  std::string section;
  size_t pos = 0;
  while (pos < content.size()) {
    size_t eol = content.find('\n', pos);
    if (eol == std::string::npos) eol = content.size();
    std::string line = trim(content.substr(pos, eol - pos));
    pos = eol + 1;
    if (line.empty() || line[0] == ';' || line[0] == '#') continue;
    if (line.front() == '[' && line.back() == ']') {
      section = trim(line.substr(1, line.size() - 2));
      continue;
    }
    size_t eq = line.find('=');
    if (eq == std::string::npos) continue;
    (*out)[section][trim(line.substr(0, eq))] = trim(line.substr(eq + 1));
  }
  return true;
}

std::string ini_get(const IniMap& ini, const std::string& sec,
                    const std::string& key, const std::string& dflt = "") {
  auto s = ini.find(sec);
  if (s == ini.end()) return dflt;
  auto k = s->second.find(key);
  if (k == s->second.end()) return dflt;
  return k->second;
}

long ini_get_int(const IniMap& ini, const std::string& sec,
                 const std::string& key, long dflt) {
  std::string v = ini_get(ini, sec, key);
  if (v.empty()) return dflt;
  try {
    return std::stol(v);
  } catch (...) {
    return dflt;
  }
}

double ini_get_double(const IniMap& ini, const std::string& sec,
                      const std::string& key, double dflt) {
  std::string v = ini_get(ini, sec, key);
  if (v.empty()) return dflt;
  try {
    return std::stod(v);
  } catch (...) {
    return dflt;
  }
}

bool read_le32(FILE* f, int32_t* v) {
  uint8_t b[4];
  if (std::fread(b, 1, 4, f) != 4) return false;
  *v = (int32_t)((uint32_t)b[0] | ((uint32_t)b[1] << 8) |
                 ((uint32_t)b[2] << 16) | ((uint32_t)b[3] << 24));
  return true;
}

// ---------------------------------------------------------------------------
// MiraxSlide
// ---------------------------------------------------------------------------

struct MiraxTile {
  int64_t x = 0, y = 0;     // level-0 anchor of the tile
  int64_t offset = 0;
  int64_t length = 0;
  int32_t fileno = -1;
  bool present = false;
};

struct MiraxLevel {
  double downsample = 1.0;  // level-0 px per px at this level
  int32_t tile_w = 0, tile_h = 0;   // stored tile pixel dims
  int64_t width = 0, height = 0;    // level pixel dims
  int32_t grid_nx = 0, grid_ny = 0;  // tile grid dims at this level
  int32_t concat = 1;                // level-0 tiles covered per stored tile
  std::vector<MiraxTile> tiles;      // grid_nx*grid_ny, row-major
};

class MiraxSlide : public ISlide {
 public:
  static MiraxSlide* open(const char* path);
  ~MiraxSlide() override {
    for (FILE* f : files_)
      if (f) std::fclose(f);
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
  int64_t decode_errors() const override { return decode_errors_; }

  int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                      void* out) override;
  int32_t read_level(int32_t level, void* out) override;

 private:
  bool read_record_pages(
      FILE* f, int64_t root, int64_t record,
      std::vector<std::array<int32_t, 4>>* entries);
  bool load_position_buffer(FILE* idx, int64_t nonhier_root, int64_t record,
                            bool zlib_compressed);
  bool read_tile_rgb(const MiraxTile& t, std::vector<uint8_t>* rgb, int* tw,
                     int* th);
  // paint one tile (clipped) into an RGBA output buffer with top-left (ox,oy)
  // in the target level's pixel space
  void blit(const std::vector<uint8_t>& rgb, int tw, int th, int64_t tile_x,
            int64_t tile_y, int64_t ox, int64_t oy, int64_t out_w,
            int64_t out_h, uint8_t* out);

  std::string dirname_;
  std::vector<FILE*> files_;         // open data files (lazy)
  std::vector<std::string> fnames_;  // data file names
  std::vector<MiraxLevel> levels_;
  std::vector<int64_t> cam_x_, cam_y_;  // camera positions (level-0 px)
  double max_dev_x_ = 0, max_dev_y_ = 0;  // worst |anchor − nominal| (lvl 0)
  double adv_x_ = 1.0, adv_y_ = 1.0;  // nominal level-0 grid advance —
                                      // single source for the deviation
                                      // measurement AND read_region's window
  int64_t decode_errors_ = 0;  // undecodable tiles rendered as background
  std::string description_;
  double mpp_ = -1.0;
  uint8_t fill_r_ = 255, fill_g_ = 255, fill_b_ = 255;
};

FILE* open_data_file(std::vector<FILE*>& files,
                     const std::vector<std::string>& names,
                     const std::string& dirname, int32_t fileno) {
  if (fileno < 0 || fileno >= (int32_t)names.size()) return nullptr;
  if ((size_t)fileno >= files.size()) files.resize(names.size(), nullptr);
  if (!files[fileno]) {
    files[fileno] =
        std::fopen((dirname + "/" + names[fileno]).c_str(), "rb");
  }
  return files[fileno];
}

// A record begins with `int32 0` followed by the offset of the first data
// page; each page is `int32 count, int32 next_page, count × entry`.
// Hierarchical entries are 4 int32s: image_index, offset, length, fileno.
bool MiraxSlide::read_record_pages(
    FILE* f, int64_t root, int64_t record,
    std::vector<std::array<int32_t, 4>>* entries) {
  if (std::fseek(f, (long)(root + record * 4), SEEK_SET) != 0) return false;
  int32_t ptr = 0;
  if (!read_le32(f, &ptr)) return false;
  if (ptr == 0) return true;  // record has no data
  if (std::fseek(f, ptr, SEEK_SET) != 0) return false;
  int32_t zero = 0, page_ptr = 0;
  if (!read_le32(f, &zero) || !read_le32(f, &page_ptr)) return false;
  // `zero` is 0 in every observed file; tolerate other values.
  // A corrupt `next` pointer can form a cycle in the page chain — found by
  // the sanitizer fuzzer (tests/test_native_sanitize.py) as an infinite
  // loop; refuse any page we have already visited.
  std::set<int32_t> visited;
  while (page_ptr != 0) {
    if (!visited.insert(page_ptr).second) return false;  // pointer cycle
    if (std::fseek(f, page_ptr, SEEK_SET) != 0) return false;
    int32_t count = 0, next = 0;
    if (!read_le32(f, &count) || !read_le32(f, &next)) return false;
    if (count < 0 || count > (1 << 24)) return false;  // sanity
    for (int32_t i = 0; i < count; ++i) {
      std::array<int32_t, 4> e;
      for (int k = 0; k < 4; ++k)
        if (!read_le32(f, &e[k])) return false;
      entries->push_back(e);
    }
    page_ptr = next;
  }
  return true;
}

// Non-hierarchical records hold a single payload location: after the
// `0, ptr` header the page is `count=1, next=0` followed by one entry of
// 3 int32s (offset, length, fileno).
bool read_nonhier_record(FILE* f, int64_t root, int64_t record,
                         int64_t* offset, int64_t* length, int32_t* fileno) {
  if (std::fseek(f, (long)(root + record * 4), SEEK_SET) != 0) return false;
  int32_t ptr = 0;
  if (!read_le32(f, &ptr) || ptr == 0) return false;
  if (std::fseek(f, ptr, SEEK_SET) != 0) return false;
  int32_t zero = 0, page_ptr = 0;
  if (!read_le32(f, &zero) || !read_le32(f, &page_ptr) || page_ptr == 0)
    return false;
  if (std::fseek(f, page_ptr, SEEK_SET) != 0) return false;
  int32_t count = 0, next = 0;
  if (!read_le32(f, &count) || !read_le32(f, &next) || count < 1) return false;
  int32_t off = 0, len = 0, fn = 0;
  if (!read_le32(f, &off) || !read_le32(f, &len) || !read_le32(f, &fn))
    return false;
  *offset = (uint32_t)off;
  *length = (uint32_t)len;
  *fileno = fn;
  return true;
}

bool MiraxSlide::load_position_buffer(FILE* idx, int64_t nonhier_root,
                                      int64_t record, bool zlib_compressed) {
  int64_t offset = 0, length = 0;
  int32_t fileno = -1;
  if (!read_nonhier_record(idx, nonhier_root, record, &offset, &length,
                           &fileno))
    return false;
  FILE* df = open_data_file(files_, fnames_, dirname_, fileno);
  if (!df) return false;
  std::vector<uint8_t> raw((size_t)length);
  if (fseeko(df, (off_t)offset, SEEK_SET) != 0 ||
      std::fread(raw.data(), 1, raw.size(), df) != raw.size())
    return false;

  std::vector<uint8_t> buf;
  if (zlib_compressed ||
      (raw.size() >= 2 && raw[0] == 0x78)) {  // zlib magic
    // newer scanners deflate the buffer
    uLongf out_len = (uLongf)(cam_x_.size() * 9 + 1024);
    buf.resize(out_len);
    int rc = uncompress(buf.data(), &out_len, raw.data(), (uLong)raw.size());
    if (rc != Z_OK) {
      if (zlib_compressed) return false;
      buf = raw;  // magic was a coincidence; use as-is
    } else {
      buf.resize(out_len);
    }
  } else {
    buf = raw;
  }

  // 9 bytes per camera: uint8 flag, int32 x, int32 y (little-endian)
  size_t n_cams = cam_x_.size();
  if (buf.size() < n_cams * 9) n_cams = buf.size() / 9;
  for (size_t i = 0; i < n_cams; ++i) {
    const uint8_t* p = buf.data() + i * 9;
    int32_t px, py;
    std::memcpy(&px, p + 1, 4);
    std::memcpy(&py, p + 5, 4);
    if (p[0] != 0 || px != 0 || py != 0) {
      cam_x_[i] = px;
      cam_y_[i] = py;
    }
  }
  return true;
}

MiraxSlide* MiraxSlide::open(const char* path) {
  // <name>.mrxs → data directory <name>/
  std::string p(path);
  std::string base = p.substr(0, p.size() - 5);  // strip ".mrxs"
  std::string dirname = base;
  IniMap ini;
  if (!parse_ini(dirname + "/Slidedat.ini", &ini)) {
    set_wsi_error("MIRAX: missing Slidedat.ini next to the .mrxs file");
    return nullptr;
  }

  MiraxSlide* s = new MiraxSlide;
  s->dirname_ = dirname;
  s->description_ = "MIRAX " + ini_get(ini, "GENERAL", "SLIDE_VERSION", "?") +
                    " " + ini_get(ini, "GENERAL", "SLIDE_ID", "");

  const long nx = ini_get_int(ini, "GENERAL", "IMAGENUMBER_X", 0);
  const long ny = ini_get_int(ini, "GENERAL", "IMAGENUMBER_Y", 0);
  const long divisions =
      std::max(1L, ini_get_int(ini, "GENERAL", "CameraImageDivisionsPerSide", 1));
  if (nx <= 0 || ny <= 0 || nx % divisions || ny % divisions) {
    set_wsi_error("MIRAX: invalid IMAGENUMBER_X/Y in Slidedat.ini");
    delete s;
    return nullptr;
  }

  // data files
  const long file_count = ini_get_int(ini, "DATAFILE", "FILE_COUNT", 0);
  for (long i = 0; i < file_count; ++i) {
    s->fnames_.push_back(
        ini_get(ini, "DATAFILE", "FILE_" + std::to_string(i)));
  }
  s->files_.resize(s->fnames_.size(), nullptr);

  // hierarchy: find the "Slide zoom level" hierarchy and its per-level
  // sections; compute the flat record index of each value
  const std::string hsec = "HIERARCHICAL";
  const long hier_count = ini_get_int(ini, hsec, "HIER_COUNT", 0);
  long zoom_hier = -1, record_base = 0, zoom_levels = 0;
  for (long i = 0; i < hier_count; ++i) {
    const std::string name =
        ini_get(ini, hsec, "HIER_" + std::to_string(i) + "_NAME");
    const long cnt =
        ini_get_int(ini, hsec, "HIER_" + std::to_string(i) + "_COUNT", 0);
    if (name == "Slide zoom level") {
      zoom_hier = i;
      zoom_levels = cnt;
      break;
    }
    record_base += cnt;
  }
  if (zoom_hier < 0 || zoom_levels <= 0) {
    set_wsi_error("MIRAX: no 'Slide zoom level' hierarchy in Slidedat.ini");
    delete s;
    return nullptr;
  }

  // non-hierarchical records: locate the camera position buffer
  const long nonhier_count = ini_get_int(ini, hsec, "NONHIER_COUNT", 0);
  long pos_record = -1;
  bool pos_zlib = false;
  {
    long rec = 0;
    for (long i = 0; i < nonhier_count; ++i) {
      const std::string name =
          ini_get(ini, hsec, "NONHIER_" + std::to_string(i) + "_NAME");
      const long cnt =
          ini_get_int(ini, hsec, "NONHIER_" + std::to_string(i) + "_COUNT", 0);
      if (name == "VIMSLIDE_POSITION_BUFFER") {
        pos_record = rec;
        pos_zlib = false;
        break;
      }
      if (name == "StitchingIntensityLayer") {
        pos_record = rec;
        pos_zlib = true;
        break;
      }
      rec += cnt;
    }
  }

  // per-zoom-level geometry
  double mpp0 = -1.0;
  for (long lvl = 0; lvl < zoom_levels; ++lvl) {
    const std::string key = "HIER_" + std::to_string(zoom_hier) + "_VAL_" +
                            std::to_string(lvl) + "_SECTION";
    const std::string sec = ini_get(ini, hsec, key);
    if (sec.empty()) break;  // fewer sections than advertised
    const std::string fmt = ini_get(ini, sec, "IMAGE_FORMAT", "JPEG");
    if (fmt != "JPEG" && fmt != "PNG" && fmt != "BMP24" && fmt != "BMP32") {
      if (lvl == 0) {
        set_wsi_error("MIRAX: IMAGE_FORMAT '" + fmt +
                      "' not supported (JPEG/PNG/BMP24 only)");
        delete s;
        return nullptr;
      }
      break;  // skip overview levels in formats we cannot decode
    }
    MiraxLevel L;
    const long dig_w = ini_get_int(ini, sec, "DIGITIZER_WIDTH", 0);
    const long dig_h = ini_get_int(ini, sec, "DIGITIZER_HEIGHT", 0);
    if (dig_w <= 0 || dig_h <= 0) {
      set_wsi_error("MIRAX: missing DIGITIZER_WIDTH/HEIGHT in " + sec);
      delete s;
      return nullptr;
    }
    L.tile_w = (int32_t)(dig_w / divisions);
    L.tile_h = (int32_t)(dig_h / divisions);
    L.concat =
        (int32_t)std::max(1L, ini_get_int(ini, sec, "IMAGE_CONCAT_FACTOR", 1));
    const double mpp_x =
        ini_get_double(ini, sec, "MICROMETER_PER_PIXEL_X", -1.0);
    if (lvl == 0) {
      mpp0 = mpp_x;
      s->mpp_ = mpp_x;
      const long fill = ini_get_int(ini, sec, "IMAGE_FILL_COLOR_BGR", 0xFFFFFF);
      s->fill_b_ = (uint8_t)(fill & 0xFF);
      s->fill_g_ = (uint8_t)((fill >> 8) & 0xFF);
      s->fill_r_ = (uint8_t)((fill >> 16) & 0xFF);
      L.downsample = 1.0;
    } else {
      L.downsample = (mpp_x > 0 && mpp0 > 0) ? mpp_x / mpp0
                                             : (double)L.concat;
    }
    L.grid_nx = (int32_t)((nx + L.concat - 1) / L.concat);
    L.grid_ny = (int32_t)((ny + L.concat - 1) / L.concat);
    L.tiles.resize((size_t)L.grid_nx * L.grid_ny);
    s->levels_.push_back(std::move(L));
  }
  if (s->levels_.empty()) {
    set_wsi_error("MIRAX: no readable zoom levels");
    delete s;
    return nullptr;
  }

  // default camera grid (used when no position buffer exists): cameras abut
  // with OVERLAP_X/Y pixels shared between neighbours
  const std::string sec0 =
      ini_get(ini, hsec,
              "HIER_" + std::to_string(zoom_hier) + "_VAL_0_SECTION");
  const double overlap_x = ini_get_double(ini, sec0, "OVERLAP_X", 0.0);
  const double overlap_y = ini_get_double(ini, sec0, "OVERLAP_Y", 0.0);
  const long ncx = nx / divisions, ncy = ny / divisions;
  const int64_t cam_w = (int64_t)s->levels_[0].tile_w * divisions;
  const int64_t cam_h = (int64_t)s->levels_[0].tile_h * divisions;
  s->cam_x_.resize((size_t)ncx * ncy);
  s->cam_y_.resize((size_t)ncx * ncy);
  for (long cy = 0; cy < ncy; ++cy) {
    for (long cx = 0; cx < ncx; ++cx) {
      s->cam_x_[(size_t)cy * ncx + cx] =
          (int64_t)std::llround(cx * (cam_w - overlap_x));
      s->cam_y_[(size_t)cy * ncx + cx] =
          (int64_t)std::llround(cy * (cam_h - overlap_y));
    }
  }

  // index file
  const std::string index_name = ini_get(ini, hsec, "INDEXFILE", "Index.dat");
  const std::string slide_id = ini_get(ini, "GENERAL", "SLIDE_ID", "");
  FILE* idx = std::fopen((dirname + "/" + index_name).c_str(), "rb");
  if (!idx) {
    set_wsi_error("MIRAX: cannot open index file " + index_name);
    delete s;
    return nullptr;
  }
  // header: 5-byte version string + slide id string
  std::fseek(idx, (long)(5 + slide_id.size()), SEEK_SET);
  int32_t hier_root = 0, nonhier_root = 0;
  if (!read_le32(idx, &hier_root) || !read_le32(idx, &nonhier_root)) {
    set_wsi_error("MIRAX: truncated index file");
    std::fclose(idx);
    delete s;
    return nullptr;
  }

  // camera positions (before placing tiles)
  if (pos_record >= 0) {
    if (!s->load_position_buffer(idx, nonhier_root, pos_record, pos_zlib)) {
      // fall back to the regular grid computed above
      set_wsi_error("");
    }
  }

  // tile index per level
  for (size_t lvl = 0; lvl < s->levels_.size(); ++lvl) {
    MiraxLevel& L = s->levels_[lvl];
    std::vector<std::array<int32_t, 4>> entries;
    if (!s->read_record_pages(idx, hier_root, record_base + (long)lvl,
                              &entries)) {
      set_wsi_error("MIRAX: corrupt index pages for zoom level " +
                    std::to_string(lvl));
      std::fclose(idx);
      delete s;
      return nullptr;
    }
    for (const auto& e : entries) {
      const int64_t image_index = (uint32_t)e[0];
      // The index addresses the *level-0* image grid at every zoom level
      // (OpenSlide's convention: a stored tile of concat^2 level-0 images
      // is filed under its top-left level-0 image's index) — decoding it
      // on the per-level grid scrambles every level with concat > 1.
      const int64_t t0x = image_index % nx;
      const int64_t t0y = image_index / nx;
      // bound on the level-0 image grid itself (not just the per-level tile
      // grid): a corrupt entry with t0y in [ny, grid_ny*concat) would pass a
      // grid_ny check yet index past the camera-position arrays
      if (t0x >= nx || t0y >= ny) continue;
      const int64_t gx = t0x / L.concat;
      const int64_t gy = t0y / L.concat;
      if (gx >= L.grid_nx || gy >= L.grid_ny) continue;
      MiraxTile& t = L.tiles[(size_t)gy * L.grid_nx + gx];
      const int64_t cam = (t0y / divisions) * ncx + (t0x / divisions);
      t.x = s->cam_x_[(size_t)cam] +
            (t0x % divisions) * s->levels_[0].tile_w;
      t.y = s->cam_y_[(size_t)cam] +
            (t0y % divisions) * s->levels_[0].tile_h;
      t.offset = (uint32_t)e[1];
      t.length = (uint32_t)e[2];
      t.fileno = e[3];
      t.present = true;
    }
  }
  std::fclose(idx);

  // level dims: level 0 from the camera extent; higher levels scaled
  int64_t w0 = 0, h0 = 0;
  for (size_t i = 0; i < s->cam_x_.size(); ++i) {
    w0 = std::max(w0, s->cam_x_[i] + cam_w);
    h0 = std::max(h0, s->cam_y_[i] + cam_h);
  }
  for (size_t lvl = 0; lvl < s->levels_.size(); ++lvl) {
    MiraxLevel& L = s->levels_[lvl];
    L.width = (int64_t)std::ceil(w0 / L.downsample);
    L.height = (int64_t)std::ceil(h0 / L.downsample);
  }

  // worst-case deviation of actual level-0 anchors from the nominal grid —
  // read_region uses it to bound its candidate-tile scan window exactly
  {
    const MiraxLevel& L0 = s->levels_[0];
    s->adv_x_ = std::max(
        1.0, L0.grid_nx > 1 ? (double)(w0 - L0.tile_w) / (L0.grid_nx - 1)
                            : (double)L0.tile_w);
    s->adv_y_ = std::max(
        1.0, L0.grid_ny > 1 ? (double)(h0 - L0.tile_h) / (L0.grid_ny - 1)
                            : (double)L0.tile_h);
    for (int64_t gy = 0; gy < L0.grid_ny; ++gy) {
      for (int64_t gx = 0; gx < L0.grid_nx; ++gx) {
        const MiraxTile& t = L0.tiles[(size_t)gy * L0.grid_nx + gx];
        if (!t.present) continue;
        s->max_dev_x_ =
            std::max(s->max_dev_x_, std::abs(t.x - gx * s->adv_x_));
        s->max_dev_y_ =
            std::max(s->max_dev_y_, std::abs(t.y - gy * s->adv_y_));
      }
    }
  }
  return s;
}

bool MiraxSlide::read_tile_rgb(const MiraxTile& t, std::vector<uint8_t>* rgb,
                               int* tw, int* th) {
  FILE* df = open_data_file(files_, fnames_, dirname_, t.fileno);
  if (!df) return false;
  // A corrupt index entry can claim a ~4 GiB tile; allocating (and
  // zero-filling) it per tile per window turns one bad record into a
  // minutes-long stall (found by the sanitizer fuzzer).  No real stored
  // tile image comes anywhere near this bound.
  if (t.length > (uint32_t)64 << 20) return false;
  std::vector<uint8_t> raw((size_t)t.length);
  if (fseeko(df, (off_t)t.offset, SEEK_SET) != 0 ||
      std::fread(raw.data(), 1, raw.size(), df) != raw.size())
    return false;
  return decode_tile_image(raw.data(), raw.size(), rgb, tw, th);
}

void MiraxSlide::blit(const std::vector<uint8_t>& rgb, int tw, int th,
                      int64_t tile_x, int64_t tile_y, int64_t ox, int64_t oy,
                      int64_t out_w, int64_t out_h, uint8_t* out) {
  const int64_t x0 = std::max<int64_t>(tile_x, ox);
  const int64_t y0 = std::max<int64_t>(tile_y, oy);
  const int64_t x1 = std::min<int64_t>(tile_x + tw, ox + out_w);
  const int64_t y1 = std::min<int64_t>(tile_y + th, oy + out_h);
  for (int64_t iy = y0; iy < y1; ++iy) {
    const uint8_t* src = rgb.data() + ((iy - tile_y) * tw + (x0 - tile_x)) * 3;
    uint8_t* dst = out + ((iy - oy) * out_w + (x0 - ox)) * 4;
    for (int64_t ix = x0; ix < x1; ++ix) {
      dst[0] = src[0];
      dst[1] = src[1];
      dst[2] = src[2];
      dst[3] = 0xFF;
      src += 3;
      dst += 4;
    }
  }
}

int32_t MiraxSlide::read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                                void* out) {
  if (!out || w <= 0 || h <= 0) return 1;
  uint8_t* dst = (uint8_t*)out;
  for (int64_t i = 0; i < w * h; ++i) {
    dst[i * 4 + 0] = fill_r_;
    dst[i * 4 + 1] = fill_g_;
    dst[i * 4 + 2] = fill_b_;
    dst[i * 4 + 3] = 0xFF;
  }
  const MiraxLevel& L = levels_[0];
  // Tiles deviate from the nominal grid by stage positioning; the exact
  // worst-case deviation per axis was measured at open time against the
  // SAME stored advance (adv_x_/adv_y_), so the candidate index window
  // below provably covers every intersecting tile.
  const double adv_x = adv_x_;
  const double adv_y = adv_y_;
  const int64_t mx = (int64_t)(max_dev_x_ / adv_x) + 1;
  const int64_t my = (int64_t)(max_dev_y_ / adv_y) + 1;
  const int64_t gx0 =
      std::max<int64_t>(0, (int64_t)((x - L.tile_w) / adv_x) - mx);
  const int64_t gx1 =
      std::min<int64_t>(L.grid_nx - 1, (int64_t)((x + w) / adv_x) + mx);
  const int64_t gy0 =
      std::max<int64_t>(0, (int64_t)((y - L.tile_h) / adv_y) - my);
  const int64_t gy1 =
      std::min<int64_t>(L.grid_ny - 1, (int64_t)((y + h) / adv_y) + my);

  std::vector<uint8_t> rgb;
  for (int64_t gy = gy0; gy <= gy1; ++gy) {
    for (int64_t gx = gx0; gx <= gx1; ++gx) {
      const MiraxTile& t = L.tiles[(size_t)gy * L.grid_nx + gx];
      if (!t.present) continue;
      if (t.x + L.tile_w <= x || t.x >= x + w || t.y + L.tile_h <= y ||
          t.y >= y + h)
        continue;
      int tw = 0, th = 0;
      if (!read_tile_rgb(t, &rgb, &tw, &th)) {
        // corrupt/truncated tile: leave the fill color and carry on — one
        // damaged tile must not kill the whole slide (OpenSlide behaves
        // the same way).  The caller can poll decode_errors() and warn.
        ++decode_errors_;
        set_wsi_error("MIRAX: undecodable tile, rendered as background");
        continue;
      }
      blit(rgb, tw, th, t.x, t.y, x, y, w, h, dst);
    }
  }
  return 0;
}

int32_t MiraxSlide::read_level(int32_t level, void* out) {
  if (!out || level < 0 || level >= (int32_t)levels_.size()) return 1;
  const MiraxLevel& L = levels_[level];
  uint8_t* dst = (uint8_t*)out;
  for (int64_t i = 0; i < L.width * L.height; ++i) {
    dst[i * 4 + 0] = fill_r_;
    dst[i * 4 + 1] = fill_g_;
    dst[i * 4 + 2] = fill_b_;
    dst[i * 4 + 3] = 0xFF;
  }
  std::vector<uint8_t> rgb;
  for (int64_t gy = 0; gy < L.grid_ny; ++gy) {
    for (int64_t gx = 0; gx < L.grid_nx; ++gx) {
      const MiraxTile& t = L.tiles[(size_t)gy * L.grid_nx + gx];
      if (!t.present) continue;
      int tw = 0, th = 0;
      if (!read_tile_rgb(t, &rgb, &tw, &th)) {
        ++decode_errors_;
        set_wsi_error("MIRAX: undecodable tile, rendered as background");
        continue;
      }
      // anchor is stored in level-0 px; place at this level's scale
      const int64_t px = (int64_t)std::llround(t.x / L.downsample);
      const int64_t py = (int64_t)std::llround(t.y / L.downsample);
      blit(rgb, tw, th, px, py, 0, 0, L.width, L.height, dst);
    }
  }
  return 0;
}

}  // namespace

ISlide* open_mirax_slide(const char* path) {
  MiraxSlide* s = MiraxSlide::open(path);
  return s;
}

bool wsi_decode_jpeg(const uint8_t* data, size_t len,
                     std::vector<uint8_t>* rgb, int* w, int* h) {
  return decode_jpeg(data, len, rgb, w, h);
}

// Public INI helpers shared with the Hamamatsu backend (islide.h); the
// anonymous-namespace implementations above stay the single source.
bool wsi_parse_ini(const std::string& path, WsiIniMap* out) {
  return parse_ini(path, out);
}
std::string wsi_ini_get(const WsiIniMap& ini, const std::string& sec,
                        const std::string& key, const std::string& dflt) {
  return ini_get(ini, sec, key, dflt);
}
long wsi_ini_get_int(const WsiIniMap& ini, const std::string& sec,
                     const std::string& key, long dflt) {
  return ini_get_int(ini, sec, key, dflt);
}
double wsi_ini_get_double(const WsiIniMap& ini, const std::string& sec,
                          const std::string& key, double dflt) {
  return ini_get_double(ini, sec, key, dflt);
}
