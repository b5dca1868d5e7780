// rtutil.h — small shared helpers for chunked random-access backends
// (Hamamatsu VMS grids, huge-JPEG NDPI levels): a byte-bounded LRU for
// decoded RGB chunks and an RGB→RGBA clipping blit.  Header-only.

#pragma once

#include <cstdint>
#include <cstring>
#include <list>
#include <map>
#include <utility>
#include <vector>

// Decoded-chunk LRU so raster-order tiling re-reads neighbours for free.
// Key: caller-packed (cell, chunk) id; capacity in bytes.
class WsiChunkCache {
 public:
  explicit WsiChunkCache(size_t cap) : cap_(cap) {}

  const std::vector<uint8_t>* get(uint64_t key) {
    auto it = map_.find(key);
    if (it == map_.end()) return nullptr;
    order_.splice(order_.begin(), order_, it->second.first);
    return &it->second.second;
  }

  const std::vector<uint8_t>* put(uint64_t key, std::vector<uint8_t>&& rgb) {
    bytes_ += rgb.size();
    order_.push_front(key);
    auto& slot = map_[key];
    slot.first = order_.begin();
    slot.second = std::move(rgb);
    while (bytes_ > cap_ && order_.size() > 1) {
      const uint64_t victim = order_.back();
      order_.pop_back();
      auto v = map_.find(victim);
      bytes_ -= v->second.second.size();
      map_.erase(v);
    }
    return &map_[key].second;
  }

 private:
  size_t cap_, bytes_ = 0;
  std::list<uint64_t> order_;
  std::map<uint64_t, std::pair<std::list<uint64_t>::iterator,
                               std::vector<uint8_t>>>
      map_;
};

inline void wsi_fill_white(uint8_t* dst, int64_t n_px) {
  std::memset(dst, 0xFF, (size_t)n_px * 4);
}

// Copy an RGB tile (tw×th anchored at tile_x/tile_y) into the RGBA window
// (ox,oy,out_w,out_h), clipping both ways.
inline void wsi_blit_rgb(const uint8_t* rgb, int64_t tw, int64_t th,
                         int64_t tile_x, int64_t tile_y, int64_t ox,
                         int64_t oy, int64_t out_w, int64_t out_h,
                         uint8_t* out) {
  const int64_t x0 = tile_x > ox ? tile_x : ox;
  const int64_t y0 = tile_y > oy ? tile_y : oy;
  const int64_t x1 =
      tile_x + tw < ox + out_w ? tile_x + tw : ox + out_w;
  const int64_t y1 =
      tile_y + th < oy + out_h ? tile_y + th : oy + out_h;
  for (int64_t iy = y0; iy < y1; ++iy) {
    const uint8_t* src = rgb + ((iy - tile_y) * tw + (x0 - tile_x)) * 3;
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
