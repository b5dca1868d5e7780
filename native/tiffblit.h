// tiffblit.h — shared libtiff RGBA region blit for TIFF-shaped vendor
// backends (Ventana BIF, Akoya QPTIFF).  The generic TiffSlide keeps its
// own copy because its path forks into the native J2K decoder.
#pragma once

#include <tiffio.h>

#include <cstdint>

// Blit the intersection of [x,x+w)×[y,y+h) with the CURRENT TIFF directory
// (dimensions lvl_w × lvl_h) into dst (RGBA h×w, top-left origin).  dst is
// background-filled opaque white first; out-of-bounds stays white, as the
// tiling stage's background rejection expects.  Returns 0 on success,
// nonzero on shape/libtiff errors.
int32_t tiff_rgba_region(TIFF* tif, int64_t lvl_w, int64_t lvl_h, int64_t x,
                         int64_t y, int64_t w, int64_t h, uint8_t* dst);
