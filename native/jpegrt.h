// jpegrt.h — random access into restart-marker JPEG streams.
//
// Hamamatsu scanners write single enormous baseline JPEGs and rely on the
// JPEG restart-marker mechanism for random access: a DRI segment declares a
// restart interval of R MCUs, and every R-MCU run of entropy data begins
// byte-aligned with fresh DC predictors, so any run can be decoded without
// the ones before it (the same property OpenSlide exploits for .vms and for
// NDPI levels whose JPEG dimensions exceed 65500 px).
//
// RtJpeg scans such a file once (sequential I/O), records the byte span of
// every restart chunk, and decodes any chunk on demand by synthesizing a
// standalone mini-JPEG: the file's own header (verbatim, with the SOF
// height/width patched to the chunk's pixel size and the DRI interval
// zeroed) + that chunk's entropy bytes + EOI.  Correctness rests on the
// JPEG standard alone — no vendor offset tables are trusted; the
// OptimisationFile Hamamatsu writes next to .vms images is ignored.
//
// Chunks tile the image rectangularly in the two shapes real files use:
//   * R <  MCUs/row (R divides it)  — chunks are R-MCU-wide strips of one
//     MCU row; chunk grid is (MCUs/row ÷ R) × MCU-rows.
//   * R >= MCUs/row (multiple of it) — chunks are full bands of
//     R ÷ MCUs/row MCU rows; chunk grid is 1 × (MCU-rows ÷ band).
// Anything else cannot form rectangles and is rejected at open.

#pragma once

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

struct RtJpeg {
  ~RtJpeg();
  RtJpeg() = default;
  RtJpeg(const RtJpeg&) = delete;
  RtJpeg& operator=(const RtJpeg&) = delete;

  // Parse + scan `path`.  On failure returns false and sets *err.
  bool open(const std::string& path, std::string* err);

  // Same, but for a JPEG stream embedded at [offset, offset+length) of a
  // container file (e.g. an NDPI strip).  `w_hint`/`h_hint` supply the
  // image dimensions when the SOF stores zeros — Hamamatsu's convention
  // for levels exceeding JPEG's 65535-px field limit, where the true
  // dimensions live in the TIFF tags instead.  A stream that ends at the
  // span boundary without an EOI marker is accepted (the last chunk ends
  // at the boundary).  length < 0 means "to end of file".
  bool open_span(const std::string& path, int64_t offset, int64_t length,
                 int64_t w_hint, int64_t h_hint, std::string* err);

  int64_t width() const { return width_; }
  int64_t height() const { return height_; }
  // chunk grid (see header comment)
  int32_t chunks_x() const { return chunks_x_; }
  int32_t chunks_y() const { return chunks_y_; }
  // pixel size of a full (non-edge) chunk
  int32_t chunk_w() const { return chunk_w_; }
  int32_t chunk_h() const { return chunk_h_; }
  // pixel size of chunk (cx,cy) after clamping to the image edge
  int32_t chunk_px_w(int32_t cx) const;
  int32_t chunk_px_h(int32_t cy) const;

  // Decode chunk (cx,cy) into tightly packed RGB of
  // chunk_px_h(cy)×chunk_px_w(cx).  Returns false on decode failure.
  bool decode_chunk(int32_t cx, int32_t cy, std::vector<uint8_t>* rgb);

 private:
  bool parse_header(const std::vector<uint8_t>& head, std::string* err);
  bool scan_entropy(std::string* err);

  FILE* f_ = nullptr;
  int64_t span_off_ = 0, span_end_ = -1;  // stream bounds (-1 = file end)
  int64_t w_hint_ = 0, h_hint_ = 0;       // dims when SOF stores zeros
  int64_t width_ = 0, height_ = 0;
  int32_t mcu_w_ = 0, mcu_h_ = 0;        // MCU pixel size (8·max sampling)
  int64_t mcus_per_row_ = 0, mcu_rows_ = 0;
  int64_t restart_interval_ = 0;          // MCUs per chunk (DRI)
  int32_t chunks_x_ = 0, chunks_y_ = 0;
  int32_t chunk_w_ = 0, chunk_h_ = 0;
  std::vector<uint8_t> header_;           // SOI..SOS verbatim
  size_t sof_dims_off_ = 0;               // offset of SOF height field
  size_t dri_val_off_ = 0;                // offset of DRI interval field
  int64_t entropy_start_ = 0;             // first byte after SOS payload
  // byte span of chunk i is [spans_[i], spans_[i+1]) minus a trailing
  // restart marker, which ends_ excludes already
  std::vector<int64_t> starts_, ends_;
};
