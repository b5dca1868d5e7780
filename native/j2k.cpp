// j2k.cpp — JPEG 2000 codestream decode via the system libopenjp2.
//
// Aperio scanners compress most TCGA-era SVS slides with JPEG 2000 (TIFF
// compression 33003 = YCbCr, 33005 = RGB); stock libtiff has no codec for
// either, and the reference pipeline inherits one from OpenSlide's openjpeg
// dependency (openslide src/openslide-decode-jp2k.c is the behavioral
// model for the color handling below).
//
// This wrapper binds libopenjp2.so at runtime with dlopen:
//   * the runtime image ships the shared library but not the -dev headers,
//     so the minimal openjpeg 2.x ABI used here (two public structs, a
//     dozen functions) is declared locally.  The opj_image layout has been
//     stable across the whole 2.x series (soname 7); opj_dparameters_t is
//     NEVER declared — an oversized zeroed buffer is initialized by
//     opj_set_default_decoder_parameters and passed back opaquely, so
//     field drift there cannot bite.
//   * if the library is missing or a symbol fails to resolve, available()
//     is false and TiffSlide falls back to the raw-tile/Pillow path that
//     shipped in earlier rounds.
//
// Decode correctness is pinned by the J2K cases in
// tests/test_preprocessing.py (test_j2k_* around line 203): a Pillow
// (itself openjpeg-backed) lossless-encoded J2K tiled TIFF must come back
// bit-exact through the native path.

#include "j2k.h"

#include <dlfcn.h>

#include <algorithm>
#include <cstring>
#include <mutex>

namespace j2k {
namespace {

// --- minimal openjpeg 2.x ABI ----------------------------------------------

using OPJ_BOOL = int;
constexpr int kCodecJ2K = 0;  // OPJ_CODEC_J2K
constexpr int kClrSYCC = 3;   // OPJ_CLRSPC_SYCC

struct OpjImageComp {      // opj_image_comp_t
  uint32_t dx, dy;         // subsampling factors
  uint32_t w, h;           // data dimensions
  uint32_t x0, y0;
  uint32_t prec, bpp;      // bpp is deprecated but still occupies space
  uint32_t sgnd;
  uint32_t resno_decoded, factor;
  int32_t* data;
  uint16_t alpha;
};

struct OpjImage {          // opj_image_t
  uint32_t x0, y0, x1, y1;
  uint32_t numcomps;
  int32_t color_space;
  OpjImageComp* comps;
  uint8_t* icc_profile_buf;
  uint32_t icc_profile_len;
};

using ReadFn = size_t (*)(void*, size_t, void*);
using SkipFn = int64_t (*)(int64_t, void*);
using SeekFn = OPJ_BOOL (*)(int64_t, void*);
using FreeFn = void (*)(void*);
using MsgFn = void (*)(const char*, void*);

struct Api {
  void* (*create_decompress)(int);
  void (*destroy_codec)(void*);
  void (*set_default_decoder_parameters)(void*);
  OPJ_BOOL (*setup_decoder)(void*, void*);
  OPJ_BOOL (*codec_set_threads)(void*, int);
  void* (*stream_create)(size_t, OPJ_BOOL);
  void (*stream_destroy)(void*);
  void (*stream_set_read_function)(void*, ReadFn);
  void (*stream_set_skip_function)(void*, SkipFn);
  void (*stream_set_seek_function)(void*, SeekFn);
  void (*stream_set_user_data)(void*, void*, FreeFn);
  void (*stream_set_user_data_length)(void*, uint64_t);
  OPJ_BOOL (*read_header)(void*, void*, OpjImage**);
  OPJ_BOOL (*decode)(void*, void*, OpjImage*);
  OPJ_BOOL (*end_decompress)(void*, void*);
  void (*image_destroy)(OpjImage*);
  OPJ_BOOL (*set_error_handler)(void*, MsgFn, void*);

  bool ok = false;
};

Api g_api;
std::once_flag g_load_once;

template <typename T>
bool resolve(void* lib, const char* name, T* slot) {
  *slot = reinterpret_cast<T>(dlsym(lib, name));
  return *slot != nullptr;
}

void load_api() {
  void* lib = dlopen("libopenjp2.so.7", RTLD_NOW | RTLD_LOCAL);
  if (!lib) lib = dlopen("libopenjp2.so", RTLD_NOW | RTLD_LOCAL);
  if (!lib) return;
  bool ok = resolve(lib, "opj_create_decompress", &g_api.create_decompress) &&
            resolve(lib, "opj_destroy_codec", &g_api.destroy_codec) &&
            resolve(lib, "opj_set_default_decoder_parameters",
                    &g_api.set_default_decoder_parameters) &&
            resolve(lib, "opj_setup_decoder", &g_api.setup_decoder) &&
            resolve(lib, "opj_stream_create", &g_api.stream_create) &&
            resolve(lib, "opj_stream_destroy", &g_api.stream_destroy) &&
            resolve(lib, "opj_stream_set_read_function",
                    &g_api.stream_set_read_function) &&
            resolve(lib, "opj_stream_set_skip_function",
                    &g_api.stream_set_skip_function) &&
            resolve(lib, "opj_stream_set_seek_function",
                    &g_api.stream_set_seek_function) &&
            resolve(lib, "opj_stream_set_user_data",
                    &g_api.stream_set_user_data) &&
            resolve(lib, "opj_stream_set_user_data_length",
                    &g_api.stream_set_user_data_length) &&
            resolve(lib, "opj_read_header", &g_api.read_header) &&
            resolve(lib, "opj_decode", &g_api.decode) &&
            resolve(lib, "opj_end_decompress", &g_api.end_decompress) &&
            resolve(lib, "opj_image_destroy", &g_api.image_destroy) &&
            resolve(lib, "opj_set_error_handler", &g_api.set_error_handler);
  // optional (added in 2.2); absence is fine — decode stays single-threaded
  resolve(lib, "opj_codec_set_threads", &g_api.codec_set_threads);
  g_api.ok = ok;
  if (!ok) dlclose(lib);
}

// --- in-memory stream callbacks ---------------------------------------------

struct MemStream {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

size_t mem_read(void* out, size_t n, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (s->pos >= s->len) return (size_t)-1;  // EOF sentinel
  size_t take = std::min(n, s->len - s->pos);
  std::memcpy(out, s->data + s->pos, take);
  s->pos += take;
  return take;
}

int64_t mem_skip(int64_t n, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (n < 0) return -1;
  size_t take = std::min<size_t>((size_t)n, s->len - s->pos);
  s->pos += take;
  return (int64_t)take;
}

OPJ_BOOL mem_seek(int64_t pos, void* user) {
  auto* s = static_cast<MemStream*>(user);
  if (pos < 0 || (size_t)pos > s->len) return 0;
  s->pos = (size_t)pos;
  return 1;
}

void on_error(const char* msg, void* user) {
  auto* err = static_cast<std::string*>(user);
  if (err && msg) *err += msg;
}

inline uint8_t clamp_u8(int32_t v) {
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Component sample at output pixel (x, y), honoring subsampling factors and
// precision (normalized to 8 bits, signed offset removed).
inline int32_t sample(const OpjImageComp& c, uint32_t x, uint32_t y) {
  uint32_t sx = std::min(x / std::max(c.dx, 1u), c.w - 1);
  uint32_t sy = std::min(y / std::max(c.dy, 1u), c.h - 1);
  int32_t v = c.data[(size_t)sy * c.w + sx];
  if (c.sgnd) v += 1 << (c.prec - 1);
  if (c.prec > 8) v >>= (c.prec - 8);
  return v;
}

}  // namespace

bool available() {
  std::call_once(g_load_once, load_api);
  return g_api.ok;
}

bool decode(const uint8_t* data, size_t len, ColorSpace space,
            std::vector<uint8_t>* rgb, int* w, int* h, std::string* err) {
  if (!available()) {
    *err = "libopenjp2 is not available";
    return false;
  }
  void* codec = g_api.create_decompress(kCodecJ2K);
  if (!codec) {
    *err = "opj_create_decompress failed";
    return false;
  }
  g_api.set_error_handler(codec, on_error, err);

  // opaque parameter block: opj_dparameters_t is ~8.3 KiB in 2.x; a zeroed
  // 32 KiB buffer initialized by the library itself absorbs any growth
  std::vector<uint8_t> params(32768, 0);
  g_api.set_default_decoder_parameters(params.data());
  if (!g_api.setup_decoder(codec, params.data())) {
    g_api.destroy_codec(codec);
    if (err->empty()) *err = "opj_setup_decoder failed";
    return false;
  }

  MemStream ms{data, len, 0};
  void* stream = g_api.stream_create(1 << 20, /*is_input=*/1);
  if (!stream) {
    g_api.destroy_codec(codec);
    *err = "opj_stream_create failed";
    return false;
  }
  g_api.stream_set_user_data(stream, &ms, nullptr);
  g_api.stream_set_user_data_length(stream, len);
  g_api.stream_set_read_function(stream, mem_read);
  g_api.stream_set_skip_function(stream, mem_skip);
  g_api.stream_set_seek_function(stream, mem_seek);

  OpjImage* image = nullptr;
  bool ok = g_api.read_header(stream, codec, &image) && image &&
            g_api.decode(codec, stream, image) &&
            g_api.end_decompress(codec, stream);
  g_api.stream_destroy(stream);

  if (!ok || !image) {
    if (image) g_api.image_destroy(image);
    g_api.destroy_codec(codec);
    if (err->empty()) *err = "J2K codestream decode failed";
    return false;
  }

  const uint32_t iw = image->x1 - image->x0, ih = image->y1 - image->y0;
  const uint32_t nc = image->numcomps;
  bool shape_ok = iw > 0 && ih > 0 && (nc == 1 || nc >= 3) &&
                  (uint64_t)iw * ih <= (1ull << 28);  // 256 Mpx tile cap
  for (uint32_t i = 0; shape_ok && i < std::min(nc, 3u); ++i) {
    const OpjImageComp& c = image->comps[i];
    shape_ok = c.data != nullptr && c.w > 0 && c.h > 0 && c.prec >= 1 &&
               c.prec <= 16;
  }
  if (!shape_ok) {
    g_api.image_destroy(image);
    g_api.destroy_codec(codec);
    *err = "J2K image has unsupported geometry";
    return false;
  }

  const bool ycc = space == ColorSpace::kYCbCr ||
                   (space == ColorSpace::kAuto &&
                    (image->color_space == kClrSYCC ||
                     (nc >= 3 && image->comps[1].dx > 1)));

  rgb->resize((size_t)iw * ih * 3);
  uint8_t* out = rgb->data();
  for (uint32_t y = 0; y < ih; ++y) {
    for (uint32_t x = 0; x < iw; ++x, out += 3) {
      if (nc == 1) {
        uint8_t g = clamp_u8(sample(image->comps[0], x, y));
        out[0] = out[1] = out[2] = g;
      } else if (ycc) {
        // ITU-R BT.601 full-range, the convention OpenSlide applies to
        // Aperio 33003 codestreams (openslide-decode-jp2k.c)
        int32_t Y = sample(image->comps[0], x, y);
        int32_t cb = sample(image->comps[1], x, y) - 128;
        int32_t cr = sample(image->comps[2], x, y) - 128;
        out[0] = clamp_u8(Y + ((91881 * cr) >> 16));
        out[1] = clamp_u8(Y - ((22553 * cb + 46802 * cr) >> 16));
        out[2] = clamp_u8(Y + ((116130 * cb) >> 16));
      } else {
        out[0] = clamp_u8(sample(image->comps[0], x, y));
        out[1] = clamp_u8(sample(image->comps[1], x, y));
        out[2] = clamp_u8(sample(image->comps[2], x, y));
      }
    }
  }
  *w = (int)iw;
  *h = (int)ih;
  g_api.image_destroy(image);
  g_api.destroy_codec(codec);
  return true;
}

}  // namespace j2k
