// islide.h — abstract slide interface shared by the native WSI backends.
//
// Two backends implement it today:
//   * TiffSlide  (wsireader.cpp)  — pyramidal TIFF / SVS / NDPI via libtiff
//   * MiraxSlide (mirax.cpp)      — 3DHISTECH MIRAX (.mrxs) multi-file container
// The C ABI in wsireader.cpp dispatches on the file type and forwards every
// call virtually, so the Python ctypes layer (stamp_tpu/preprocessing/wsi.py)
// is backend-agnostic.

#pragma once

#include <cstdint>
#include <string>

struct ISlide {
  virtual ~ISlide() = default;

  virtual int64_t width() const = 0;   // level-0 width in pixels
  virtual int64_t height() const = 0;  // level-0 height in pixels
  virtual int32_t level_count() const = 0;
  virtual int64_t level_width(int32_t level) const = 0;
  virtual int64_t level_height(int32_t level) const = 0;
  virtual const std::string& description() const = 0;
  virtual double mpp() const = 0;  // microns per pixel at level 0, -1 unknown
  // cumulative count of tiles that failed to decode and were rendered as
  // background (MIRAX resilience path); 0 for backends that fail hard
  virtual int64_t decode_errors() const { return 0; }

  // TIFF-specific raw-tile access (JPEG2000 SVS path); other backends
  // keep the defaults.
  virtual int32_t compression() const { return 0; }
  virtual bool raw_only() const { return false; }
  virtual int32_t tile_width(int32_t /*level*/) { return 0; }
  virtual int32_t tile_height(int32_t /*level*/) { return 0; }
  virtual int64_t read_raw_tile(int32_t /*level*/, int64_t /*x*/, int64_t /*y*/,
                                void* /*buf*/, int64_t /*bufsize*/) {
    return -1;
  }

  // Level-0 region read into caller-provided RGBA buffer (h×w×4, top-left
  // origin).  Out-of-bounds areas are filled with the background color.
  virtual int32_t read_region(int64_t x, int64_t y, int64_t w, int64_t h,
                              void* out) = 0;
  // Whole-level read into an RGBA buffer of level_height×level_width×4.
  virtual int32_t read_level(int32_t level, void* out) = 0;
};

ISlide* open_tiff_slide(const char* path);
ISlide* open_mirax_slide(const char* path);
ISlide* open_ndpi_slide(const char* path);  // ≥4 GiB NDPI (wrapped offsets)
ISlide* open_vms_slide(const char* path);   // Hamamatsu VMS/VMU containers
// NDPI with JPEG levels beyond the 65535-px SOF limit (restart-marker
// reconstruction).  *applicable=false ⇒ not such a file, fall through.
ISlide* open_ndpi_huge_slide(const char* path, bool* applicable);
ISlide* open_czi_slide(const char* path);   // Zeiss ZISRAW containers
// Leica SCN collections (vendor XML semantics: macro exclusion, main-image
// stitch in collection space).  *applicable=false ⇒ TIFF without an SCN
// collection XML, fall through to the generic backend.
ISlide* open_scn_slide(const char* path, bool* applicable);
// Ventana BIF (iScan mpp, level markers, loud multi-AOI refusal).
// *applicable=false ⇒ no iScan metadata, fall through to generic TIFF.
ISlide* open_bif_slide(const char* path, bool* applicable);
// Akoya/PerkinElmer QPTIFF (ImageType-driven pyramid, thumbnail exclusion,
// loud multiplexed-IF refusal).  *applicable=false ⇒ no QPI description,
// fall through to generic TIFF.
ISlide* open_qptiff_slide(const char* path, bool* applicable);

// Shared libjpeg decode (implemented in mirax.cpp): JPEG bytes → packed
// RGB.  Returns false on any decode error.
#include <map>
#include <vector>
bool wsi_decode_jpeg(const uint8_t* data, size_t len,
                     std::vector<uint8_t>* rgb, int* w, int* h);

// Shared Windows-INI parser (implemented in mirax.cpp): section → key →
// value, tolerating a UTF-8 BOM, CRLF endings and ;/# comments.  MIRAX
// Slidedat.ini and Hamamatsu .vms/.vmu stubs share this grammar.
using WsiIniMap = std::map<std::string, std::map<std::string, std::string>>;
bool wsi_parse_ini(const std::string& path, WsiIniMap* out);
std::string wsi_ini_get(const WsiIniMap& ini, const std::string& sec,
                        const std::string& key, const std::string& dflt = "");
long wsi_ini_get_int(const WsiIniMap& ini, const std::string& sec,
                     const std::string& key, long dflt);
double wsi_ini_get_double(const WsiIniMap& ini, const std::string& sec,
                          const std::string& key, double dflt);

// Thread-local human-readable reason for the last open/read failure.
void set_wsi_error(const std::string& msg);
