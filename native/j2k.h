// j2k.h — JPEG 2000 codestream decode for Aperio SVS tiles (TIFF
// compression tags 33003 / 33005).
//
// The reference pipeline reaches these slides through OpenSlide, which
// links openjpeg (openslide src/openslide-decode-jp2k.c).  Here the
// system libopenjp2.so.7 is loaded at runtime via dlopen — no compile-time
// dependency on openjpeg headers (the image ships the shared library but
// not the -dev package), and the reader degrades to the raw-tile/Pillow
// fallback when the library is absent.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace j2k {

// Tag-driven color interpretation, mirroring OpenSlide's SVS handling
// (openslide-vendor-aperio.c): 33003 carries YCbCr (possibly with 4:2:2
// chroma subsampling), 33005 carries RGB.
enum class ColorSpace { kAuto, kYCbCr, kRGB };

// True once libopenjp2 has been dlopen'd and all required symbols resolved.
bool available();

// Decode one raw J2K codestream into packed RGB8 (w*h*3, top-left origin).
// Returns false with *err set on any failure (library missing, corrupt
// codestream, unexpected component geometry).
bool decode(const uint8_t* data, size_t len, ColorSpace space,
            std::vector<uint8_t>* rgb, int* w, int* h, std::string* err);

}  // namespace j2k
