// tiffblit.cpp — see tiffblit.h.

#include "tiffblit.h"

#include <algorithm>
#include <cstring>
#include <vector>

int32_t tiff_rgba_region(TIFF* tif, int64_t lvl_w, int64_t lvl_h, int64_t x,
                         int64_t y, int64_t w, int64_t h, uint8_t* dst) {
  if (!dst || w <= 0 || h <= 0) return 1;
  std::memset(dst, 0xFF, (size_t)w * h * 4);

  const int64_t x0 = std::max<int64_t>(x, 0);
  const int64_t y0 = std::max<int64_t>(y, 0);
  const int64_t x1 = std::min<int64_t>(x + w, lvl_w);
  const int64_t y1 = std::min<int64_t>(y + h, lvl_h);
  if (x0 >= x1 || y0 >= y1) return 0;

  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;
    std::vector<uint32_t> tile((size_t)tw * th);
    for (int64_t ty = (y0 / th) * th; ty < y1; ty += th) {
      for (int64_t tx = (x0 / tw) * tw; tx < x1; tx += tw) {
        if (!TIFFReadRGBATile(tif, (uint32_t)tx, (uint32_t)ty, tile.data()))
          return 4;
        // TIFFReadRGBATile returns bottom-up rows; raster row r corresponds
        // to image row ty + (th - 1 - r).
        const int64_t cx0 = std::max<int64_t>(tx, x0);
        const int64_t cx1 = std::min<int64_t>(tx + tw, x1);
        const int64_t cy0 = std::max<int64_t>(ty, y0);
        const int64_t cy1 = std::min<int64_t>(ty + th, y1);
        for (int64_t iy = cy0; iy < cy1; ++iy) {
          const int64_t raster_row = th - 1 - (iy - ty);
          const uint32_t* src = tile.data() + raster_row * tw + (cx0 - tx);
          uint8_t* drow = dst + ((iy - y) * w + (cx0 - x)) * 4;
          std::memcpy(drow, src, (size_t)(cx1 - cx0) * 4);
        }
      }
    }
  } else {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (rps == 0) rps = (uint32_t)lvl_h;
    // guard: a single-strip gigapixel level would need an absurd buffer
    if ((uint64_t)lvl_w * rps * 4 > (1ull << 32)) return 6;
    std::vector<uint32_t> strip((size_t)lvl_w * rps);
    for (int64_t sy = (y0 / rps) * rps; sy < y1; sy += rps) {
      if (!TIFFReadRGBAStrip(tif, (uint32_t)sy, strip.data())) return 5;
      const int64_t rows = std::min<int64_t>(rps, lvl_h - sy);
      const int64_t cy0 = std::max<int64_t>(sy, y0);
      const int64_t cy1 = std::min<int64_t>(sy + rows, y1);
      for (int64_t iy = cy0; iy < cy1; ++iy) {
        const int64_t raster_row = rows - 1 - (iy - sy);
        const uint32_t* src = strip.data() + raster_row * lvl_w + x0;
        uint8_t* drow = dst + ((iy - y) * w + (x0 - x)) * 4;
        std::memcpy(drow, src, (size_t)(x1 - x0) * 4);
      }
    }
  }
  return 0;
}
