// jpegrt.cpp — restart-marker JPEG random access (see jpegrt.h).

#include "jpegrt.h"

#include <algorithm>
#include <cstring>

#include "islide.h"  // wsi_decode_jpeg

namespace {

// Big-endian u16 at p.
inline uint32_t be16(const uint8_t* p) {
  return ((uint32_t)p[0] << 8) | p[1];
}

}  // namespace

RtJpeg::~RtJpeg() {
  if (f_) std::fclose(f_);
}

int32_t RtJpeg::chunk_px_w(int32_t cx) const {
  const int64_t x0 = (int64_t)cx * chunk_w_;
  return (int32_t)std::min<int64_t>(chunk_w_, width_ - x0);
}

int32_t RtJpeg::chunk_px_h(int32_t cy) const {
  const int64_t y0 = (int64_t)cy * chunk_h_;
  return (int32_t)std::min<int64_t>(chunk_h_, height_ - y0);
}

// Walk the marker stream SOI..SOS, keeping the raw bytes as the reusable
// per-chunk header template and recording where SOF dims and the DRI
// interval live so decode_chunk can patch them in a copy.
bool RtJpeg::parse_header(const std::vector<uint8_t>& head, std::string* err) {
  const uint8_t* d = head.data();
  const size_t n = head.size();
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8) {
    *err = "not a JPEG (missing SOI)";
    return false;
  }
  size_t pos = 2;
  int max_h = 1, max_v = 1;
  bool saw_sof = false;
  while (pos + 4 <= n) {
    if (d[pos] != 0xFF) {
      *err = "corrupt marker stream";
      return false;
    }
    const uint8_t m = d[pos + 1];
    if (m == 0xFF) {  // fill byte
      ++pos;
      continue;
    }
    if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {  // standalone
      pos += 2;
      continue;
    }
    const size_t seg_len = be16(d + pos + 2);
    if (seg_len < 2 || pos + 2 + seg_len > n) {
      *err = "truncated marker segment";
      return false;
    }
    const uint8_t* seg = d + pos + 4;
    switch (m) {
      case 0xC0:  // SOF0 baseline
      case 0xC1:  // SOF1 extended sequential
      {
        if (seg_len < 8) {
          *err = "short SOF";
          return false;
        }
        height_ = be16(seg + 1);
        width_ = be16(seg + 3);
        // Hamamatsu stores zeros for levels beyond JPEG's 65535-px field
        // limit; the container supplies the true dimensions as hints.
        if (height_ == 0 && h_hint_ > 0) height_ = h_hint_;
        if (width_ == 0 && w_hint_ > 0) width_ = w_hint_;
        sof_dims_off_ = pos + 4 + 1;
        const int ncomp = seg[5];
        if (seg_len < (size_t)8 + 3 * (ncomp - 1) + 1) {
          *err = "short SOF components";
          return false;
        }
        for (int c = 0; c < ncomp; ++c) {
          const uint8_t hv = seg[6 + 3 * c + 1];
          max_h = std::max(max_h, hv >> 4);
          max_v = std::max(max_v, hv & 0xF);
        }
        saw_sof = true;
        break;
      }
      case 0xC2:  // SOF2 progressive — restart chunks are not row bands
        *err = "progressive JPEG unsupported for random access";
        return false;
      case 0xDD:  // DRI
        if (seg_len < 4) {
          *err = "short DRI";
          return false;
        }
        restart_interval_ = be16(seg);
        dri_val_off_ = pos + 4;
        break;
      case 0xDA: {  // SOS — header template is everything through here
        header_.assign(d, d + pos + 2 + seg_len);
        entropy_start_ = (int64_t)(pos + 2 + seg_len);
        if (!saw_sof) {
          *err = "SOS before SOF";
          return false;
        }
        if (restart_interval_ <= 0) {
          *err = "no restart interval (DRI) — random access impossible";
          return false;
        }
        mcu_w_ = 8 * max_h;
        mcu_h_ = 8 * max_v;
        if (width_ <= 0 || height_ <= 0) {
          // NDPI >65500 px streams store 0 here; open_span callers must
          // pass the container's dimensions as hints.
          *err = "SOF carries zero dimensions and no hint was given";
          return false;
        }
        mcus_per_row_ = (width_ + mcu_w_ - 1) / mcu_w_;
        mcu_rows_ = (height_ + mcu_h_ - 1) / mcu_h_;
        if (restart_interval_ < mcus_per_row_) {
          if (mcus_per_row_ % restart_interval_ != 0) {
            *err = "restart interval does not tile the MCU rows";
            return false;
          }
          chunks_x_ = (int32_t)(mcus_per_row_ / restart_interval_);
          chunks_y_ = (int32_t)mcu_rows_;
          chunk_w_ = (int32_t)(restart_interval_ * mcu_w_);
          chunk_h_ = mcu_h_;
        } else {
          if (restart_interval_ % mcus_per_row_ != 0) {
            *err = "restart interval does not tile the MCU rows";
            return false;
          }
          const int64_t band = restart_interval_ / mcus_per_row_;
          chunks_x_ = 1;
          chunks_y_ = (int32_t)((mcu_rows_ + band - 1) / band);
          chunk_w_ = (int32_t)(mcus_per_row_ * mcu_w_);
          chunk_h_ = (int32_t)(band * mcu_h_);
        }
        return true;
      }
      default:
        break;  // APPn/COM/DQT/DHT ride along verbatim in the template
    }
    pos += 2 + seg_len;
  }
  *err = "no SOS marker found";
  return false;
}

// One sequential pass over the entropy stream recording chunk byte spans.
// In entropy data 0xFF is always followed by 0x00 (stuffing), a restart
// marker D0-D7 (chunk boundary), or D9 (EOI) — anything else means a
// multi-scan or corrupt file.
bool RtJpeg::scan_entropy(std::string* err) {
  const int64_t expected = (int64_t)chunks_x_ * chunks_y_;
  starts_.reserve(expected);
  ends_.reserve(expected);
  starts_.push_back(entropy_start_);

  if (fseeko(f_, (off_t)entropy_start_, SEEK_SET) != 0) {
    *err = "seek failed";
    return false;
  }
  std::vector<uint8_t> buf(1 << 20);
  int64_t pos = entropy_start_;
  bool pending_ff = false;
  bool done = false;
  while (!done) {
    size_t want = buf.size();
    if (span_end_ >= 0 && pos + (int64_t)want > span_end_)
      want = (size_t)std::max<int64_t>(span_end_ - pos, 0);
    const size_t n = want ? std::fread(buf.data(), 1, want, f_) : 0;
    if (n == 0) {
      // Embedded streams may end at the container's span boundary with no
      // EOI — accept that as the end of the final chunk.
      if ((int64_t)ends_.size() + 1 == (int64_t)starts_.size()) {
        ends_.push_back(pending_ff ? pos - 1 : pos);
        break;
      }
      *err = "entropy stream ended without EOI";
      return false;
    }
    for (size_t i = 0; i < n; ++i) {
      const uint8_t b = buf[i];
      const int64_t at = pos + (int64_t)i;  // absolute offset of b
      if (pending_ff) {
        if (b == 0xFF) continue;  // fill byte run — still pending
        pending_ff = false;
        if (b == 0x00) continue;  // stuffed FF
        if (b >= 0xD0 && b <= 0xD7) {  // restart: prev chunk ends before FF
          ends_.push_back(at - 1);
          starts_.push_back(at + 1);
          continue;
        }
        if (b == 0xD9) {  // EOI
          ends_.push_back(at - 1);
          done = true;
          break;
        }
        *err = "unexpected marker in entropy stream (multi-scan JPEG?)";
        return false;
      }
      if (b == 0xFF) pending_ff = true;
    }
    pos += (int64_t)n;
  }
  if ((int64_t)ends_.size() != expected) {
    *err = "restart chunk count " + std::to_string(ends_.size()) +
           " != expected " + std::to_string(expected);
    return false;
  }
  return true;
}

bool RtJpeg::open(const std::string& path, std::string* err) {
  return open_span(path, 0, -1, 0, 0, err);
}

bool RtJpeg::open_span(const std::string& path, int64_t offset, int64_t length,
                       int64_t w_hint, int64_t h_hint, std::string* err) {
  f_ = std::fopen(path.c_str(), "rb");
  if (!f_) {
    *err = "cannot open " + path;
    return false;
  }
  span_off_ = offset;
  span_end_ = length < 0 ? -1 : offset + length;
  w_hint_ = w_hint;
  h_hint_ = h_hint;
  if (fseeko(f_, (off_t)offset, SEEK_SET) != 0) {
    *err = "seek to embedded stream failed";
    return false;
  }
  // Headers of real scanner files fit well inside 1 MiB (DQT/DHT/APPn).
  size_t head_len = 1 << 20;
  if (length >= 0 && (int64_t)head_len > length) head_len = (size_t)length;
  std::vector<uint8_t> head(head_len);
  const size_t n = std::fread(head.data(), 1, head.size(), f_);
  head.resize(n);
  if (!parse_header(head, err)) return false;
  entropy_start_ += span_off_;  // parse_header records span-relative
  return scan_entropy(err);
}

bool RtJpeg::decode_chunk(int32_t cx, int32_t cy, std::vector<uint8_t>* rgb) {
  if (cx < 0 || cx >= chunks_x_ || cy < 0 || cy >= chunks_y_) return false;
  const size_t idx = (size_t)cy * chunks_x_ + cx;
  const int64_t lo = starts_[idx], hi = ends_[idx];
  if (hi <= lo) return false;

  // mini-JPEG: patched header + chunk entropy + EOI
  std::vector<uint8_t> mini(header_);
  const int32_t cw = chunk_px_w(cx), ch = chunk_px_h(cy);
  mini[sof_dims_off_ + 0] = (uint8_t)(ch >> 8);
  mini[sof_dims_off_ + 1] = (uint8_t)(ch & 0xFF);
  mini[sof_dims_off_ + 2] = (uint8_t)(cw >> 8);
  mini[sof_dims_off_ + 3] = (uint8_t)(cw & 0xFF);
  // a chunk holds exactly one restart run — no interior markers to expect
  if (dri_val_off_) {
    mini[dri_val_off_] = 0;
    mini[dri_val_off_ + 1] = 0;
  }
  const size_t hdr = mini.size();
  mini.resize(hdr + (size_t)(hi - lo) + 2);
  if (fseeko(f_, (off_t)lo, SEEK_SET) != 0 ||
      std::fread(mini.data() + hdr, 1, (size_t)(hi - lo), f_) !=
          (size_t)(hi - lo))
    return false;
  mini[mini.size() - 2] = 0xFF;
  mini[mini.size() - 1] = 0xD9;

  int w = 0, h = 0;
  if (!wsi_decode_jpeg(mini.data(), mini.size(), rgb, &w, &h)) return false;
  return w == cw && h == ch;
}
