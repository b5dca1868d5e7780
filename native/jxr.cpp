// jxr.cpp — JPEG XR (ITU-T T.832 / ISO 29199-2) codec for CZI subblocks.
//
// Zeiss ZEN writes most compressed CZI subblocks as JPEG XR (libCZI decodes
// them through jxrlib); the reference pipeline inherits that support via
// OpenSlide (reference src/stamp/preprocessing/__init__.py:43-56).  This
// file implements the codec from the T.832 specification's structure:
//
//   decoder  — container (II-BC TIFF-like) or bare WMPHOTO codestream;
//              SPATIAL bitstream mode; single or multi-tile with index
//              table; internal YONLY / YUV444 / YUV422 / YUV420; BANDS
//              ALL / NOFLEXBITS / NOHIGHPASS / DCONLY; overlap modes
//              0/1/2; image-plane-uniform quantization; BD8 and BD16
//              outputs (BD16 keeps the high byte, the CZI Gray16
//              convention of czi.cpp).
//   encoder  — fixture path used by the tests: single tile, SPATIAL,
//              uniform QP, same internal formats / bands / overlap modes;
//              emits the II-BC container so payloads look like real
//              subblocks.
//
// Validation honesty (zero-egress environment): no reference JPEG XR
// codec, conformance stream, or real Zeiss file exists in this image, so
// bit-compatibility with third-party encoders cannot be asserted here.
// What IS locked down, by construction and by tests/test_jxr.py +
// tests/test_native_sanitize.py:
//   * the decoder exactly inverts the encoder — lossless round-trips are
//     bit-identical, lossy ones meet PSNR bounds;
//   * every lifting step of the transforms / overlap filters / color
//     transform is mirrored mechanically (inverse = reversed forward), so
//     invertibility never rests on a remembered rounding identity;
//   * corrupt or truncated payloads fail with named errors (the backend
//     is ASan/UBSan-fuzzed alongside the other readers).
// The codestream *structure* (headers, index table, tile packets, band
// layout, hi/lo model split, adaptive scans, run-level coefficient
// coding, adaptive code-table selection) follows T.832; the concrete
// code-length tables and lifting rotation constants are localized below
// so a divergence found against a real scanner file is a one-block fix.

#include "jxr.h"

#include <algorithm>
#include <cstdlib>
#include <cstring>

namespace jxr {
namespace {

using I32 = int32_t;
using std::size_t;
using std::string;
using std::vector;

// ===========================================================================
// Bit I/O (MSB-first, as T.832 reads codestreams)
// ===========================================================================

// Buffered MSB-first reader: a 64-bit accumulator holds the next bits at
// its top, so multi-bit reads and Huffman peeks are O(1).  Reads past the
// end pad with zero bits and latch fail() once consumed bits exceed the
// stream (the entropy layer checks fail() at its decision points).
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len) : d_(data), n_(len) {}

  uint32_t get(int bits) {  // bits in [0, 32]
    if (bits == 0) return 0;
    refill(bits);
    const uint32_t v = (uint32_t)(acc_ >> (64 - bits));
    consume(bits);
    return v;
  }
  uint32_t get1() { return get(1); }
  uint32_t peek(int bits) {
    refill(bits);
    return (uint32_t)(acc_ >> (64 - bits));
  }
  void skip(int bits) {
    refill(bits);
    consume(bits);
  }
  void byte_align() {
    const int r = (int)(pos_bits_ & 7);
    if (r) skip(8 - r);
  }
  size_t byte_pos() const { return (size_t)((pos_bits_ + 7) >> 3); }
  void seek_byte(size_t byte) {
    acc_ = 0;
    cnt_ = 0;
    next_ = byte;
    pos_bits_ = (uint64_t)byte * 8;
    if (byte > n_) failed_ = true;
  }
  bool fail() const { return failed_; }
  size_t size() const { return n_; }

 private:
  void refill(int need) {
    while (cnt_ < need) {
      const uint64_t b = (next_ < n_) ? d_[next_] : 0;
      ++next_;
      acc_ |= b << (56 - cnt_);
      cnt_ += 8;
    }
  }
  void consume(int bits) {
    acc_ <<= bits;
    cnt_ -= bits;
    pos_bits_ += (uint64_t)bits;
    if (pos_bits_ > (uint64_t)n_ * 8) failed_ = true;
  }

  const uint8_t* d_;
  size_t n_;
  size_t next_ = 0;      // next byte to load into the accumulator
  uint64_t acc_ = 0;     // valid bits at the top
  int cnt_ = 0;
  uint64_t pos_bits_ = 0;  // consumed bits
  bool failed_ = false;
};

class BitWriter {
 public:
  void put(uint32_t v, int bits) {  // bits in [0, 32]
    acc_ = (acc_ << bits) | (uint64_t)(v & (bits == 32 ? ~0u : ((1u << bits) - 1u)));
    cnt_ += bits;
    while (cnt_ >= 8) {
      cnt_ -= 8;
      out_.push_back((uint8_t)(acc_ >> cnt_));
    }
  }
  void put1(uint32_t b) { put(b & 1, 1); }
  void byte_align() {
    if (cnt_) {
      out_.push_back((uint8_t)(acc_ << (8 - cnt_)));
      cnt_ = 0;
    }
    acc_ = 0;
  }
  size_t byte_size() const { return out_.size(); }  // call after byte_align
  const vector<uint8_t>& bytes() const { return out_; }
  vector<uint8_t> take() {
    byte_align();
    return std::move(out_);
  }

 private:
  vector<uint8_t> out_;
  uint64_t acc_ = 0;
  int cnt_ = 0;
};

// ===========================================================================
// Transforms.  T.832 builds its 4x4 photo core transform (PCT) from 2x2
// lifting operators applied to point-symmetric index groups.  Every
// forward step below is `x ±= f(others)`; each inverse replays the exact
// steps in reverse order, so fwd→inv is bit-exact for any operands — the
// codec's invertibility never depends on a remembered rounding identity.
// ===========================================================================

// 2x2 Hadamard with rounding R (spec operator T_2x2h).
inline void fwd2x2h(I32& a, I32& b, I32& c, I32& d, int R) {
  a += d;
  b -= c;
  const I32 t1 = (a - b + R) >> 1;
  const I32 t2 = c;
  c = t1 - d;
  d = t1 - t2;
  a -= d;
  b += c;
}
inline void inv2x2h(I32& a, I32& b, I32& c, I32& d, int R) {
  b -= c;
  a += d;
  const I32 t1 = (a - b + R) >> 1;
  const I32 t2 = c;
  c = t1 - d;  // (c,d) ← (t1-d, t1-c) is self-inverse given t1
  d = t1 - t2;
  b += c;
  a -= d;
}

// Odd-symmetry operator (spec T_odd): butterflies around a pi/8-family
// rotation implemented as lifting multiplies.
inline void fwdodd(I32& a, I32& b, I32& c, I32& d) {
  b -= c;
  a += d;
  c += (b + 1) >> 1;
  d = ((a + 1) >> 1) - d;
  b -= (a * 3 + 4) >> 3;
  a += (b * 3 + 4) >> 3;
  d -= (c * 3 + 4) >> 3;
  c += (d * 3 + 4) >> 3;
  d += b >> 1;
  b -= d;
  c -= (a + 1) >> 1;
  a += c;
}
inline void invodd(I32& a, I32& b, I32& c, I32& d) {
  a -= c;
  c += (a + 1) >> 1;
  b += d;
  d -= b >> 1;
  c -= (d * 3 + 4) >> 3;
  d += (c * 3 + 4) >> 3;
  a -= (b * 3 + 4) >> 3;
  b += (a * 3 + 4) >> 3;
  d = ((a + 1) >> 1) - d;
  c -= (b + 1) >> 1;
  a -= d;
  b += c;
}

// Doubly-odd operator (spec T_odd_odd): one rotation pair plus butterflies.
inline void fwdoddodd(I32& a, I32& b, I32& c, I32& d) {
  d += a;
  c -= b;
  a -= d >> 1;
  b += c >> 1;
  a -= (b * 3 + 4) >> 3;
  b += (a * 3 + 4) >> 3;
  b = -b;
}
inline void invoddodd(I32& a, I32& b, I32& c, I32& d) {
  b = -b;
  b -= (a * 3 + 4) >> 3;
  a += (b * 3 + 4) >> 3;
  b -= c >> 1;
  a += d >> 1;
  c += b;
  d -= a;
}

// 2-point Hadamard-like lifting pair.
inline void fwd2pt(I32& a, I32& b) {
  a += b;
  b -= a >> 1;
}
inline void inv2pt(I32& a, I32& b) {
  b += a >> 1;
  a -= b;
}

// --- 4x4 PCT ---------------------------------------------------------------
// Raster-order 4x4 block.  Stage 1 applies 2x2 Hadamards to the four
// point-symmetric groups {(i,j),(i,3-j),(3-i,j),(3-i,3-j)}, collecting the
// four group sums in the top-left quadrant.  Stage 2 Hadamards that
// quadrant (true block DC lands at index 0) and applies the odd operators
// to the remaining quadrants.  First row = horizontal frequencies, first
// column = vertical — the layout the LP/HP prediction rules assume.
void fwd_pct4x4(I32* p) {
  fwd2x2h(p[0], p[3], p[12], p[15], 0);   // corners
  fwd2x2h(p[1], p[2], p[13], p[14], 0);   // top/bottom edge centres
  fwd2x2h(p[4], p[7], p[8], p[11], 0);    // left/right edge centres
  fwd2x2h(p[5], p[6], p[9], p[10], 0);    // centre
  fwd2x2h(p[0], p[1], p[4], p[5], 0);     // sums → DC + low frequencies
  fwdodd(p[2], p[3], p[6], p[7]);         // horizontally odd
  fwdodd(p[8], p[12], p[9], p[13]);       // vertically odd
  fwdoddodd(p[10], p[11], p[14], p[15]);  // doubly odd
}
void inv_pct4x4(I32* p) {
  invoddodd(p[10], p[11], p[14], p[15]);
  invodd(p[8], p[12], p[9], p[13]);
  invodd(p[2], p[3], p[6], p[7]);
  inv2x2h(p[0], p[1], p[4], p[5], 0);
  inv2x2h(p[5], p[6], p[9], p[10], 0);
  inv2x2h(p[4], p[7], p[8], p[11], 0);
  inv2x2h(p[1], p[2], p[13], p[14], 0);
  inv2x2h(p[0], p[3], p[12], p[15], 0);
}

// --- second-stage transforms on the per-MB block-DC arrays -----------------
void fwd_pct2x2(I32* p) { fwd2x2h(p[0], p[1], p[2], p[3], 1); }
void inv_pct2x2(I32* p) { inv2x2h(p[0], p[1], p[2], p[3], 1); }

// 2 wide x 4 high (YUV422 chroma), raster order p[0..7].
void fwd_pct2x4(I32* p) {
  fwd2x2h(p[0], p[1], p[2], p[3], 1);
  fwd2x2h(p[4], p[5], p[6], p[7], 1);
  fwd2pt(p[0], p[4]);
  fwd2pt(p[1], p[5]);
}
void inv_pct2x4(I32* p) {
  inv2pt(p[1], p[5]);
  inv2pt(p[0], p[4]);
  inv2x2h(p[4], p[5], p[6], p[7], 1);
  inv2x2h(p[0], p[1], p[2], p[3], 1);
}

// --- overlap pre/post filters ----------------------------------------------
// The optional lapped stage: the encoder pre-filters areas straddling
// transform-block boundaries; the decoder post-filter is its mechanical
// mirror.  The operators are gentle lifting rotations (gains bounded near
// 1) so band-dropped reconstructions stay coherent: the boundary-adjacent
// pair (b,c) gets the stronger coupling, the outer pair (a,d) a weak one.
inline void fwd_olp4(I32& a, I32& b, I32& c, I32& d) {
  c += (b + 4) >> 3;
  b += (c + 2) >> 2;
  c -= (b + 4) >> 3;
  d += (a + 8) >> 4;
  a += (d + 4) >> 3;
  d -= (a + 8) >> 4;
}
inline void inv_olp4(I32& a, I32& b, I32& c, I32& d) {
  d += (a + 8) >> 4;
  a -= (d + 4) >> 3;
  d -= (a + 8) >> 4;
  c += (b + 4) >> 3;
  b -= (c + 2) >> 2;
  c -= (b + 4) >> 3;
}

// 2-point pair (straddle corners / chroma second stage).
inline void fwd_olp2(I32& a, I32& b) {
  b += (a + 2) >> 2;
  a += (b + 1) >> 1;
  b -= (a + 2) >> 2;
}
inline void inv_olp2(I32& a, I32& b) {
  b += (a + 2) >> 2;
  a -= (b + 1) >> 1;
  b -= (a + 2) >> 2;
}

// 4x4 overlap operator on a block-junction straddle area: the separable
// rows-then-columns form keeps the mirror-exactness obvious (the inverse
// undoes columns first, then rows in reverse order).
void fwd_olp4x4(I32* p /*4x4 raster*/) {
  for (int r = 0; r < 4; ++r)
    fwd_olp4(p[r * 4 + 0], p[r * 4 + 1], p[r * 4 + 2], p[r * 4 + 3]);
  for (int c = 0; c < 4; ++c) fwd_olp4(p[c], p[4 + c], p[8 + c], p[12 + c]);
}
void inv_olp4x4(I32* p) {
  for (int c = 3; c >= 0; --c) inv_olp4(p[c], p[4 + c], p[8 + c], p[12 + c]);
  for (int r = 3; r >= 0; --r)
    inv_olp4(p[r * 4 + 0], p[r * 4 + 1], p[r * 4 + 2], p[r * 4 + 3]);
}

// ===========================================================================
// Color transform — lossless lifting RGB↔YUV (the HD-Photo-family
// difference transform; centered inputs).
// ===========================================================================

inline void fwd_rgb2yuv(I32& r, I32& g, I32& b) {
  // u = b - r;  r' = r + u/2 (≈ (r+b)/2);  v = r' - g;  y = g + v/2
  I32 u = b - r;
  I32 t = r + (u >> 1);
  I32 v = t - g;
  I32 y = g + (v >> 1);
  r = y;
  g = u;
  b = v;
}
inline void inv_yuv2rgb(I32& y, I32& u, I32& v) {
  I32 g = y - (v >> 1);
  I32 t = v + g;
  I32 r = t - (u >> 1);
  I32 b = u + r;
  y = r;
  u = g;
  v = b;
}

// ===========================================================================
// Quantization.  T.832 QP-index → step mapping (mantissa/exponent above 16).
// ===========================================================================

inline I32 qp_to_quant(int qp) {
  if (qp <= 1) return 1;
  if (qp < 16) return qp;
  return (I32)(((qp & 15) + 16) << ((qp >> 4) - 1));
}
inline I32 quantize(I32 v, I32 q) {
  if (q == 1) return v;
  const I32 a = v < 0 ? -v : v;
  const I32 r = (a + (q >> 1)) / q;
  return v < 0 ? -r : r;
}
inline I32 dequantize(I32 v, I32 q) { return v * q; }

// ===========================================================================
// Entropy infrastructure: canonical Huffman tables with T.832-style
// adaptive selection between a "peaked" and a "flat" candidate per
// alphabet, switched by a per-instance discriminant.
// ===========================================================================

struct HuffTable {
  // canonical codes built from the length array at construction, plus a
  // flat maxlen-bit decode LUT: entry = (symbol << 8) | code length, 0 =
  // no code with this prefix (corrupt stream).
  vector<uint8_t> len;
  vector<uint32_t> code;
  int maxlen = 0;
  vector<uint16_t> lut;
  explicit HuffTable(std::initializer_list<uint8_t> lens) {
    len.assign(lens);
    code.resize(len.size());
    // canonical assignment: shorter codes first, then symbol order
    uint32_t next = 0;
    for (int l = 1; l <= 24; ++l) {
      for (size_t s = 0; s < len.size(); ++s) {
        if (len[s] == l) code[s] = next++;
      }
      next <<= 1;
    }
    for (uint8_t l : len) maxlen = std::max(maxlen, (int)l);
    lut.assign((size_t)1 << maxlen, 0);
    for (size_t s = 0; s < len.size(); ++s) {
      const int pad = maxlen - len[s];
      const uint32_t base = code[s] << pad;
      for (uint32_t fill = 0; fill < (1u << pad); ++fill)
        lut[base | fill] = (uint16_t)((s << 8) | len[s]);
    }
  }
};

class AdaptiveHuff {
 public:
  AdaptiveHuff(const HuffTable* t0, const HuffTable* t1)
      : t_{t0, t1}, cur_(0), disc_(0) {}

  void reset() {
    cur_ = 0;
    disc_ = 0;
  }

  void encode(BitWriter& bw, int sym) {
    const HuffTable& t = *t_[cur_];
    bw.put(t.code[sym], t.len[sym]);
    adapt(sym);
  }

  // Returns -1 on failure (unknown prefix / stream overrun).
  int decode(BitReader& br) {
    const HuffTable& t = *t_[cur_];
    const uint16_t e = t.lut[br.peek(t.maxlen)];
    if (e == 0) return -1;
    br.skip(e & 0xFF);
    if (br.fail()) return -1;
    const int s = e >> 8;
    adapt(s);
    return s;
  }

 private:
  void adapt(int sym) {
    // discriminant accumulates (bits under current table − bits under the
    // other); when the other table would have been cheaper for a while,
    // switch (the T.832 adaptive-VLC selection mechanism).
    const int other = cur_ ^ 1;
    disc_ += (int)t_[cur_]->len[sym] - (int)t_[other]->len[sym];
    if (disc_ > 8) {
      cur_ = other;
      disc_ = 0;
    } else if (disc_ < -64) {
      disc_ = -64;
    }
  }

  const HuffTable* t_[2];
  int cur_;
  int disc_;
};

// --- static candidate tables (one peaked, one flat per alphabet) -----------
// Kept together so a mismatch found against a real-scanner stream is a
// one-block fix.  All are valid prefix codes (canonical from lengths).

// 8-symbol joint DC/LP significance (bit2=Y, bit1=U, bit0=V nonzero).
const HuffTable kSig8Peak{{1, 3, 3, 4, 4, 5, 6, 6}};
const HuffTable kSig8Flat{{3, 3, 3, 3, 3, 3, 3, 3}};
// 7-symbol abs-level bin index.
const HuffTable kAbs7Peak{{1, 2, 3, 4, 5, 6, 6}};
const HuffTable kAbs7Flat{{2, 2, 3, 3, 3, 4, 4}};
// 8-symbol run-level "index" (bit2=more, bit1=run>0, bit0=|level|>1).
const HuffTable kIdx8Peak{{2, 2, 3, 3, 4, 4, 4, 4}};
const HuffTable kIdx8Flat{{3, 3, 3, 3, 3, 3, 3, 3}};
// 5-symbol run bins {1, 2, 3-4, 5-8, 9+}.
const HuffTable kRun5Peak{{1, 2, 3, 4, 4}};
const HuffTable kRun5Flat{{2, 2, 2, 3, 3}};
// 16-symbol 4-bit patterns (CBP quadrants / chroma masks).
const HuffTable kPat16Peak{{2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5, 6, 6, 6, 6}};
const HuffTable kPat16Flat{{4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4}};

// ===========================================================================
// Exp-style escape for unbounded values: 5-bit length n then n raw bits.
// ===========================================================================

inline void put_escape(BitWriter& bw, uint32_t v) {
  int n = 0;
  while ((v >> n) != 0 && n < 31) ++n;  // bits needed
  bw.put((uint32_t)n, 5);
  if (n) bw.put(v, n);
}
inline int64_t get_escape(BitReader& br) {
  const int n = (int)br.get(5);
  if (n == 0) return 0;
  return (int64_t)br.get(n);
}

// Abs-level coder (shared by DC and the run-level block coder): level ≥ 1.
// Bins: 1, 2, 3-4, 5-8, 9-16, 17-32, 33+(escape).
inline void put_abs_level(BitWriter& bw, AdaptiveHuff& h, I32 level) {
  if (level <= 2) {
    h.encode(bw, level - 1);
  } else if (level <= 4) {
    h.encode(bw, 2);
    bw.put((uint32_t)(level - 3), 1);
  } else if (level <= 8) {
    h.encode(bw, 3);
    bw.put((uint32_t)(level - 5), 2);
  } else if (level <= 16) {
    h.encode(bw, 4);
    bw.put((uint32_t)(level - 9), 3);
  } else if (level <= 32) {
    h.encode(bw, 5);
    bw.put((uint32_t)(level - 17), 4);
  } else {
    h.encode(bw, 6);
    put_escape(bw, (uint32_t)(level - 33));
  }
}
inline I32 get_abs_level(BitReader& br, AdaptiveHuff& h) {
  const int s = h.decode(br);
  switch (s) {
    case 0:
    case 1:
      return s + 1;
    case 2:
      return 3 + (I32)br.get(1);
    case 3:
      return 5 + (I32)br.get(2);
    case 4:
      return 9 + (I32)br.get(3);
    case 5:
      return 17 + (I32)br.get(4);
    case 6: {
      const int64_t e = get_escape(br);
      if (e > (1 << 24)) return -1;  // implausible magnitude → corrupt
      return (I32)(33 + e);
    }
    default:
      return -1;
  }
}

// Run coder: run ∈ [1, max_run].
inline void put_run(BitWriter& bw, AdaptiveHuff& h, int run, int max_run) {
  if (max_run <= 1) return;  // run == 1 implied
  if (run == 1) {
    h.encode(bw, 0);
  } else if (run == 2) {
    h.encode(bw, 1);
  } else if (run <= 4) {
    h.encode(bw, 2);
    bw.put((uint32_t)(run - 3), 1);
  } else if (run <= 8) {
    h.encode(bw, 3);
    bw.put((uint32_t)(run - 5), 2);
  } else {
    h.encode(bw, 4);
    put_escape(bw, (uint32_t)(run - 9));
  }
}
inline int get_run(BitReader& br, AdaptiveHuff& h, int max_run) {
  if (max_run <= 1) return 1;
  const int s = h.decode(br);
  switch (s) {
    case 0:
      return 1;
    case 1:
      return 2;
    case 2:
      return 3 + (int)br.get(1);
    case 3:
      return 5 + (int)br.get(2);
    case 4: {
      const int64_t e = get_escape(br);
      if (e > 64) return -1;
      return (int)(9 + e);
    }
    default:
      return -1;
  }
}

// ===========================================================================
// Adaptive magnitude model (the T.832 hi/lo "model bits" split): the low
// `bits` bits of each quantized coefficient are raw FLC, the high part is
// run-level VLC coded; `bits` adapts per band and per luma/chroma class
// from the decoded magnitudes, identically on both sides.
// ===========================================================================

struct MagModel {
  int bits[2];   // [luma, chroma]
  int drift[2];  // hysteresis accumulator

  void reset(int init_luma, int init_chroma) {
    bits[0] = init_luma;
    bits[1] = init_chroma;
    drift[0] = drift[1] = 0;
  }
  // called once per MB per class with (sum of |hi|, coefficient count)
  void update(int cls, int64_t hi_sum, int count) {
    if (count == 0) return;
    if (hi_sum * 2 > count) {
      if (++drift[cls] >= 2) {
        drift[cls] = 0;
        if (bits[cls] < 14) ++bits[cls];
      }
    } else if (hi_sum == 0) {
      if (--drift[cls] <= -2) {
        drift[cls] = 0;
        if (bits[cls] > 0) --bits[cls];
      }
    } else {
      drift[cls] = 0;
    }
  }
};

// ===========================================================================
// Adaptive coefficient scan (bubble-adapted zigzag, reset per tile).
// ===========================================================================

struct AdaptiveScan {
  int order[15];
  int totals[15];

  void reset(bool vertical) {
    // zigzag over the 4x4 AC positions, row-major index 1..15
    static const int kZig[15] = {1, 4, 5, 2, 8, 6, 9, 3, 12, 10, 7, 13, 11, 14, 15};
    for (int i = 0; i < 15; ++i) {
      const int p = kZig[i];
      order[i] = vertical ? ((p & 3) * 4 + (p >> 2)) : p;  // transpose
      totals[i] = 0;
    }
  }
  // bubble the scan position that just produced a nonzero toward the front
  void touch(int i) {
    ++totals[i];
    if (i > 0 && totals[i] > totals[i - 1]) {
      std::swap(totals[i], totals[i - 1]);
      std::swap(order[i], order[i - 1]);
    }
  }
};

// ===========================================================================
// Codec state: plane geometry, quantized coefficient stores, per-tile
// entropy contexts.
// ===========================================================================

struct PlaneGeom {
  int pw = 0, ph = 0;      // extended pixel dims (multiple of MB pixel size)
  int blk_w = 4, blk_h = 4;  // transform blocks per MB
  int nlp = 15;            // LP coefficients per MB
  int nblk = 16;           // blocks per MB
  int lp_h1 = 1, lp_v1 = 4;  // first horizontal / vertical LP index
};

struct CompCoef {
  PlaneGeom g;
  vector<I32> dc;  // [mb]
  vector<I32> lp;  // [mb * nlp]
  vector<I32> hp;  // [mb * nblk * 15], quantized (hi/lo split is per-MB)
};

// Geometry for component `c` (0 = luma) under internal color format `clr`.
PlaneGeom plane_geom(int clr, int c, int mb_w, int mb_h) {
  PlaneGeom g;
  if (c == 0 || clr == 3 /*YUV444*/ || clr == 6 /*NCOMPONENT*/) {
    g.pw = mb_w * 16;
    g.ph = mb_h * 16;
    g.blk_w = g.blk_h = 4;
    g.nlp = 15;
    g.nblk = 16;
    g.lp_h1 = 1;
    g.lp_v1 = 4;
  } else if (clr == 1 /*YUV420*/) {
    g.pw = mb_w * 8;
    g.ph = mb_h * 8;
    g.blk_w = g.blk_h = 2;
    g.nlp = 3;
    g.nblk = 4;
    g.lp_h1 = 1;
    g.lp_v1 = 2;
  } else /*YUV422*/ {
    g.pw = mb_w * 8;
    g.ph = mb_h * 16;
    g.blk_w = 2;
    g.blk_h = 4;
    g.nlp = 7;
    g.nblk = 8;
    g.lp_h1 = 1;
    g.lp_v1 = 2;
  }
  return g;
}

// Per-tile entropy context (reset at every tile start, per T.832).
struct EntroCtx {
  AdaptiveHuff sig_dc{&kSig8Peak, &kSig8Flat};
  AdaptiveHuff sig_lp{&kSig8Peak, &kSig8Flat};
  AdaptiveHuff abs_dc[2] = {{&kAbs7Peak, &kAbs7Flat}, {&kAbs7Peak, &kAbs7Flat}};
  AdaptiveHuff abs_lp[2] = {{&kAbs7Peak, &kAbs7Flat}, {&kAbs7Peak, &kAbs7Flat}};
  AdaptiveHuff abs_hp[2] = {{&kAbs7Peak, &kAbs7Flat}, {&kAbs7Peak, &kAbs7Flat}};
  AdaptiveHuff first_lp[2] = {{&kIdx8Peak, &kIdx8Flat}, {&kIdx8Peak, &kIdx8Flat}};
  AdaptiveHuff next_lp[2] = {{&kIdx8Peak, &kIdx8Flat}, {&kIdx8Peak, &kIdx8Flat}};
  AdaptiveHuff first_hp[2] = {{&kIdx8Peak, &kIdx8Flat}, {&kIdx8Peak, &kIdx8Flat}};
  AdaptiveHuff next_hp[2] = {{&kIdx8Peak, &kIdx8Flat}, {&kIdx8Peak, &kIdx8Flat}};
  AdaptiveHuff run_lp[2] = {{&kRun5Peak, &kRun5Flat}, {&kRun5Peak, &kRun5Flat}};
  AdaptiveHuff run_hp[2] = {{&kRun5Peak, &kRun5Flat}, {&kRun5Peak, &kRun5Flat}};
  AdaptiveHuff cbp_quad{&kPat16Peak, &kPat16Flat};
  AdaptiveHuff cbp_pat{&kPat16Peak, &kPat16Flat};
  AdaptiveHuff cbp_chroma{&kPat16Peak, &kPat16Flat};
  MagModel model_dc, model_lp, model_hp;
  AdaptiveScan scan_lp, scan_lp_chroma, scan_hp_h, scan_hp_v;

  void reset() {
    *this = EntroCtx();
    model_dc.reset(10, 10);
    model_lp.reset(6, 6);
    model_hp.reset(4, 4);
    scan_lp.reset(false);
    scan_lp_chroma.reset(false);
    scan_hp_h.reset(false);
    scan_hp_v.reset(true);
  }
};

// Short identity scan used for the 3/7-coefficient chroma LP arrays.
void reset_short_scan(AdaptiveScan& s, int n) {
  for (int i = 0; i < 15; ++i) {
    s.order[i] = (i < n) ? i + 1 : 0;
    s.totals[i] = 0;
  }
}

// ---------------------------------------------------------------------------
// Run-level block coder over signed hi coefficients in adaptive-scan order.
// `vals[idx]` is indexed by coefficient index (entries of scan.order);
// `n` = number of scan slots in use.
// ---------------------------------------------------------------------------

void encode_block(BitWriter& bw, AdaptiveScan& scan, AdaptiveHuff& first,
                  AdaptiveHuff& next, AdaptiveHuff& run, AdaptiveHuff& abs,
                  const I32* vals, int n) {
  int slots[15], k = 0;
  for (int i = 0; i < n; ++i) {
    if (vals[scan.order[i]] != 0) slots[k++] = i;
  }
  // caller guarantees k >= 1 (signalled via significance / CBP)
  int prev = -1;
  for (int j = 0; j < k; ++j) {
    const int pos = slots[j];
    const int gap = pos - prev - 1;
    const I32 v = vals[scan.order[pos]];
    const I32 a = v < 0 ? -v : v;
    const int sym = ((j < k - 1) << 2) | ((gap > 0) << 1) | (a > 1);
    (j == 0 ? first : next).encode(bw, sym);
    if (gap > 0) put_run(bw, run, gap, (n - 2) - prev);
    if (a > 1) put_abs_level(bw, abs, a - 1);
    bw.put1(v < 0);
    prev = pos;
  }
  for (int j = 0; j < k; ++j) scan.touch(slots[j]);
}

// Returns false on corrupt input.  Writes into vals[idx] (pre-zeroed).
bool decode_block(BitReader& br, AdaptiveScan& scan, AdaptiveHuff& first,
                  AdaptiveHuff& next, AdaptiveHuff& run, AdaptiveHuff& abs,
                  I32* vals, int n) {
  int slots[15], k = 0;
  int prev = -1;
  for (;;) {
    const int sym = (k == 0 ? first : next).decode(br);
    if (sym < 0) return false;
    int pos;
    if (sym & 2) {
      const int r = get_run(br, run, (n - 2) - prev);
      if (r < 0) return false;
      pos = prev + 1 + r;
    } else {
      pos = prev + 1;
    }
    if (pos >= n || k >= 15) return false;
    I32 a = 1;
    if (sym & 1) {
      const I32 lv = get_abs_level(br, abs);
      if (lv < 0) return false;
      a = lv + 1;
    }
    const I32 v = br.get1() ? -a : a;
    if (br.fail()) return false;
    vals[scan.order[pos]] = v;
    slots[k++] = pos;
    prev = pos;
    if (!(sym & 4)) break;
  }
  for (int j = 0; j < k; ++j) scan.touch(slots[j]);
  return true;
}

// ---------------------------------------------------------------------------
// Hi/lo model split helpers (signed hi, unsigned lo; see header comment).
// ---------------------------------------------------------------------------

inline I32 hi_of(I32 v, int bits) {
  const I32 a = v < 0 ? -v : v;
  const I32 h = a >> bits;
  return v < 0 ? -h : h;
}
inline I32 lo_of(I32 v, int bits) {
  const I32 a = v < 0 ? -v : v;
  return a & ((1 << bits) - 1);
}
// Reassemble a coefficient from its coded parts: when hi != 0 the sign of
// the whole value is the sign of hi; when hi == 0 the (conditional) sign
// bit in the low-bits section applies.
inline I32 merge_hilo(I32 hi, I32 lo, int bits, bool neg_if_hi0) {
  if (hi > 0) return (hi << bits) + lo;
  if (hi < 0) return -(((-hi) << bits) + lo);
  return neg_if_hi0 ? -lo : lo;
}

// ===========================================================================
// MB-layer codec.  Per MB, SPATIAL band order: DC (all components), LP,
// CBP+HP, FLEXBITS.  Prediction:
//   * DC      — left/top/both, direction chosen from neighbor-DC gradients
//               (chroma gradients when present, T.832's selection rule);
//   * LP      — first row / first column follows the DC direction;
//   * HP      — per-block first row/column from the neighboring block
//               inside the MB, direction chosen from this MB's LP energy;
//               prediction runs on the VLC-layer ("hi") values so the
//               FLEXBITS band stays independently droppable.
// ===========================================================================

enum PredMode { kPredNone = 0, kPredLeft, kPredTop, kPredBoth };

struct CodecConfig {
  int ncomp = 3;
  int clr = 3;    // internal color format
  int bands = 0;  // 0 ALL, 1 NOFLEXBITS, 2 NOHIGHPASS, 3 DCONLY
  int trim = 0;
  int mb_w = 0, mb_h = 0;
};

struct MbPos {
  int mbx, mby, m;       // MB coords and linear index
  int tx0, ty0;          // tile-origin MB coords (prediction fence)
};

int dc_pred_mode(const CodecConfig& cfg, const vector<CompCoef>& cc,
                 const MbPos& at) {
  const bool left = at.mbx > at.tx0, top = at.mby > at.ty0;
  if (!left && !top) return kPredNone;
  if (left && !top) return kPredLeft;
  if (!left && top) return kPredTop;
  const int m_tl = (at.mby - 1) * cfg.mb_w + at.mbx - 1;
  const int m_t = m_tl + 1;
  const int m_l = at.m - 1;
  int64_t str_h, str_v;
  if (cfg.ncomp > 1) {
    str_h = std::abs((int64_t)cc[1].dc[m_tl] - cc[1].dc[m_t]) +
            std::abs((int64_t)cc[2].dc[m_tl] - cc[2].dc[m_t]);
    str_v = std::abs((int64_t)cc[1].dc[m_tl] - cc[1].dc[m_l]) +
            std::abs((int64_t)cc[2].dc[m_tl] - cc[2].dc[m_l]);
  } else {
    str_h = std::abs((int64_t)cc[0].dc[m_tl] - cc[0].dc[m_t]);
    str_v = std::abs((int64_t)cc[0].dc[m_tl] - cc[0].dc[m_l]);
  }
  if (str_h * 4 <= str_v) return kPredLeft;  // rows flat → use row neighbor
  if (str_v * 4 <= str_h) return kPredTop;
  return kPredBoth;
}

I32 dc_pred(const CompCoef& c, const CodecConfig& cfg, const MbPos& at,
            int mode) {
  switch (mode) {
    case kPredLeft:
      return c.dc[at.m - 1];
    case kPredTop:
      return c.dc[at.m - cfg.mb_w];
    case kPredBoth:
      return (I32)(((int64_t)c.dc[at.m - 1] + c.dc[at.m - cfg.mb_w]) >> 1);
    default:
      return 0;
  }
}

// LP coefficient indices predicted for each direction, per geometry.
int lp_pred_idx(const PlaneGeom& g, int mode, int out[3]) {
  int n = 0;
  if (mode == kPredLeft) {  // predict vertical-frequency column from left
    if (g.nlp == 15) {
      out[0] = 4; out[1] = 8; out[2] = 12; n = 3;
    } else if (g.nlp == 7) {
      out[0] = 2; out[1] = 4; out[2] = 6; n = 3;
    } else {
      out[0] = 2; n = 1;
    }
  } else if (mode == kPredTop) {
    if (g.nlp == 15) {
      out[0] = 1; out[1] = 2; out[2] = 3; n = 3;
    } else {
      out[0] = 1; n = 1;
    }
  }
  return n;
}

// HP prediction direction for the whole MB, from its (decoded) LP values.
int hp_pred_mode(const CodecConfig& cfg, const vector<CompCoef>& cc, int m) {
  int64_t str_h = 0, str_v = 0;
  for (int c = 0; c < cfg.ncomp; ++c) {
    const PlaneGeom& g = cc[c].g;
    str_h += std::abs((int64_t)cc[c].lp[(size_t)m * g.nlp + g.lp_h1 - 1]);
    str_v += std::abs((int64_t)cc[c].lp[(size_t)m * g.nlp + g.lp_v1 - 1]);
  }
  if (str_h * 4 <= str_v) return kPredLeft;
  if (str_v * 4 <= str_h) return kPredTop;
  return kPredNone;
}

// --- per-MB encode ----------------------------------------------------------

void encode_mb(BitWriter& bw, EntroCtx& ctx, const CodecConfig& cfg,
               vector<CompCoef>& cc, const MbPos& at) {
  const int nc = cfg.ncomp;
  // model bits captured at MB start (updates apply after the whole MB)
  int bits_dc[3], bits_lp[3], bits_hp[3];
  for (int c = 0; c < nc; ++c) {
    const int cls = c ? 1 : 0;
    bits_dc[c] = ctx.model_dc.bits[cls];
    bits_lp[c] = ctx.model_lp.bits[cls];
    bits_hp[c] = ctx.model_hp.bits[cls];
  }

  // ---- DC ----
  const int dmode = dc_pred_mode(cfg, cc, at);
  I32 dres[3], dhi[3], dlo[3];
  for (int c = 0; c < nc; ++c) {
    dres[c] = cc[c].dc[at.m] - dc_pred(cc[c], cfg, at, dmode);
    dhi[c] = hi_of(dres[c], bits_dc[c]);
    dlo[c] = lo_of(dres[c], bits_dc[c]);
  }
  if (nc == 3) {
    const int sym =
        ((dhi[0] != 0) << 2) | ((dhi[1] != 0) << 1) | (dhi[2] != 0);
    ctx.sig_dc.encode(bw, sym);
  } else {
    bw.put1(dhi[0] != 0);
  }
  int64_t dc_hi_sum[2] = {0, 0};
  for (int c = 0; c < nc; ++c) {
    const int cls = c ? 1 : 0;
    if (dhi[c] != 0) {
      put_abs_level(bw, ctx.abs_dc[cls], dhi[c] < 0 ? -dhi[c] : dhi[c]);
      bw.put1(dhi[c] < 0);
    }
    if (bits_dc[c]) bw.put((uint32_t)dlo[c], bits_dc[c]);
    if (dhi[c] == 0 && dlo[c] != 0) bw.put1(dres[c] < 0);
    dc_hi_sum[cls] += dhi[c] < 0 ? -dhi[c] : dhi[c];
  }

  // ---- LP ----
  int64_t lp_hi_sum[2] = {0, 0};
  if (cfg.bands <= 2) {
    I32 res[3][16], his[3][16], los[3][16];
    bool any[3] = {false, false, false};
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      std::memset(res[c], 0, sizeof(res[c]));
      int pidx[3];
      const int np = lp_pred_idx(g, dmode, pidx);
      const int neighbor =
          dmode == kPredLeft ? at.m - 1 : (dmode == kPredTop ? at.m - cfg.mb_w : -1);
      for (int i = 1; i <= g.nlp; ++i) {
        I32 pred = 0;
        for (int j = 0; j < np; ++j) {
          if (pidx[j] == i && neighbor >= 0)
            pred = cc[c].lp[(size_t)neighbor * g.nlp + i - 1];
        }
        res[c][i] = cc[c].lp[(size_t)at.m * g.nlp + i - 1] - pred;
        his[c][i] = hi_of(res[c][i], bits_lp[c]);
        los[c][i] = lo_of(res[c][i], bits_lp[c]);
        if (his[c][i] != 0) any[c] = true;
        lp_hi_sum[c ? 1 : 0] += his[c][i] < 0 ? -his[c][i] : his[c][i];
      }
    }
    if (nc == 3) {
      ctx.sig_lp.encode(bw, (any[0] << 2) | (any[1] << 1) | (int)any[2]);
    } else {
      bw.put1(any[0]);
    }
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const int cls = c ? 1 : 0;
      AdaptiveScan& scan = (c == 0) ? ctx.scan_lp : ctx.scan_lp_chroma;
      if (any[c])
        encode_block(bw, scan, ctx.first_lp[cls], ctx.next_lp[cls],
                     ctx.run_lp[cls], ctx.abs_lp[cls], his[c], g.nlp);
      if (bits_lp[c])
        for (int i = 1; i <= g.nlp; ++i)
          bw.put((uint32_t)los[c][i], bits_lp[c]);
      for (int i = 1; i <= g.nlp; ++i)
        if (his[c][i] == 0 && los[c][i] != 0) bw.put1(res[c][i] < 0);
    }
  }

  // ---- CBP + HP (hi layer) + FLEXBITS ----
  int64_t hp_hi_sum[2] = {0, 0};
  if (cfg.bands <= 1) {
    const int hmode = hp_pred_mode(cfg, cc, at.m);
    AdaptiveScan& scan = (hmode == kPredTop) ? ctx.scan_hp_v : ctx.scan_hp_h;
    // split + predict per component; buffers sized for the largest MB
    I32 his[3][16][16], res[3][16][16];
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const int cls = c ? 1 : 0;
      for (int b = 0; b < g.nblk; ++b) {
        const size_t base = ((size_t)at.m * g.nblk + b) * 15;
        his[c][b][0] = res[c][b][0] = 0;
        for (int i = 1; i <= 15; ++i)
          his[c][b][i] = hi_of(cc[c].hp[base + i - 1], bits_hp[c]);
      }
      for (int b = 0; b < g.nblk; ++b) {
        const int bx = b % g.blk_w, by = b / g.blk_w;
        std::memset(res[c][b], 0, sizeof(res[c][b]));
        for (int i = 1; i <= 15; ++i) res[c][b][i] = his[c][b][i];
        if (hmode == kPredLeft && bx > 0) {
          res[c][b][4] -= his[c][b - 1][4];
          res[c][b][8] -= his[c][b - 1][8];
          res[c][b][12] -= his[c][b - 1][12];
        } else if (hmode == kPredTop && by > 0) {
          res[c][b][1] -= his[c][b - g.blk_w][1];
          res[c][b][2] -= his[c][b - g.blk_w][2];
          res[c][b][3] -= his[c][b - g.blk_w][3];
        }
      }
      // CBP over nonzero residual-hi blocks
      uint32_t mask = 0;
      for (int b = 0; b < g.nblk; ++b) {
        bool nz = false;
        for (int i = 1; i <= 15; ++i) nz |= res[c][b][i] != 0;
        if (nz) mask |= 1u << b;
      }
      if (g.nblk == 16) {
        // quadrants of the 4x4 block grid: q = (by>>1)*2 + (bx>>1)
        uint32_t qmask = 0, qpat[4] = {0, 0, 0, 0};
        for (int b = 0; b < 16; ++b) {
          if (!(mask & (1u << b))) continue;
          const int q = ((b / 4) >> 1) * 2 + ((b % 4) >> 1);
          const int pos = ((b / 4) & 1) * 2 + ((b % 4) & 1);
          qmask |= 1u << q;
          qpat[q] |= 1u << pos;
        }
        ctx.cbp_quad.encode(bw, (int)qmask);
        for (int q = 0; q < 4; ++q)
          if (qmask & (1u << q)) ctx.cbp_pat.encode(bw, (int)qpat[q] - 1);
      } else if (g.nblk == 4) {
        ctx.cbp_chroma.encode(bw, (int)mask);
      } else {  // nblk == 8 (YUV422): two 4-bit groups
        ctx.cbp_chroma.encode(bw, (int)(mask & 15));
        ctx.cbp_chroma.encode(bw, (int)(mask >> 4));
      }
      for (int b = 0; b < g.nblk; ++b) {
        if (mask & (1u << b))
          encode_block(bw, scan, ctx.first_hp[cls], ctx.next_hp[cls],
                       ctx.run_hp[cls], ctx.abs_hp[cls], res[c][b], 15);
        for (int i = 1; i <= 15; ++i)
          hp_hi_sum[cls] += res[c][b][i] < 0 ? -res[c][b][i] : res[c][b][i];
      }
    }
    // FLEXBITS: the low `bits` bits of every HP coefficient (+ the sign of
    // coefficients whose significance first appears here)
    if (cfg.bands == 0) {
      for (int c = 0; c < nc; ++c) {
        const PlaneGeom& g = cc[c].g;
        const int eff = std::max(0, bits_hp[c] - cfg.trim);
        if (bits_hp[c] == 0) continue;
        for (int b = 0; b < g.nblk; ++b) {
          const size_t base = ((size_t)at.m * g.nblk + b) * 15;
          for (int i = 1; i <= 15; ++i) {
            const I32 v = cc[c].hp[base + i - 1];
            const I32 stored = lo_of(v, bits_hp[c]) >> cfg.trim;
            if (eff) bw.put((uint32_t)stored, eff);
            if (his[c][b][i] == 0 && stored != 0) bw.put1(v < 0);
          }
        }
      }
    }
  }

  // model updates (identical points on the decode side)
  ctx.model_dc.update(0, dc_hi_sum[0], 1);
  if (nc == 3) ctx.model_dc.update(1, dc_hi_sum[1], 2);
  if (cfg.bands <= 2) {
    ctx.model_lp.update(0, lp_hi_sum[0], cc[0].g.nlp);
    if (nc == 3) ctx.model_lp.update(1, lp_hi_sum[1], 2 * cc[1].g.nlp);
  }
  if (cfg.bands <= 1) {
    ctx.model_hp.update(0, hp_hi_sum[0], cc[0].g.nblk * 15);
    if (nc == 3) ctx.model_hp.update(1, hp_hi_sum[1], 2 * cc[1].g.nblk * 15);
  }
}

// --- per-MB decode ----------------------------------------------------------

bool decode_mb(BitReader& br, EntroCtx& ctx, const CodecConfig& cfg,
               vector<CompCoef>& cc, const MbPos& at) {
  const int nc = cfg.ncomp;
  int bits_dc[3], bits_lp[3], bits_hp[3];
  for (int c = 0; c < nc; ++c) {
    const int cls = c ? 1 : 0;
    bits_dc[c] = ctx.model_dc.bits[cls];
    bits_lp[c] = ctx.model_lp.bits[cls];
    bits_hp[c] = ctx.model_hp.bits[cls];
  }

  // ---- DC ----
  const int dmode = dc_pred_mode(cfg, cc, at);
  int sig[3];
  if (nc == 3) {
    const int sym = ctx.sig_dc.decode(br);
    if (sym < 0) return false;
    sig[0] = (sym >> 2) & 1;
    sig[1] = (sym >> 1) & 1;
    sig[2] = sym & 1;
  } else {
    sig[0] = (int)br.get1();
  }
  int64_t dc_hi_sum[2] = {0, 0};
  for (int c = 0; c < nc; ++c) {
    const int cls = c ? 1 : 0;
    I32 hi = 0;
    if (sig[c]) {
      const I32 a = get_abs_level(br, ctx.abs_dc[cls]);
      if (a < 0) return false;
      hi = br.get1() ? -a : a;
    }
    const I32 lo = bits_dc[c] ? (I32)br.get(bits_dc[c]) : 0;
    const bool neg = (hi == 0 && lo != 0) ? br.get1() != 0 : false;
    if (br.fail()) return false;
    const I32 res = merge_hilo(hi, lo, bits_dc[c], neg);
    cc[c].dc[at.m] = res + dc_pred(cc[c], cfg, at, dmode);
    dc_hi_sum[cls] += hi < 0 ? -hi : hi;
  }

  // ---- LP ----
  int64_t lp_hi_sum[2] = {0, 0};
  if (cfg.bands <= 2) {
    int any[3] = {0, 0, 0};
    if (nc == 3) {
      const int sym = ctx.sig_lp.decode(br);
      if (sym < 0) return false;
      any[0] = (sym >> 2) & 1;
      any[1] = (sym >> 1) & 1;
      any[2] = sym & 1;
    } else {
      any[0] = (int)br.get1();
    }
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const int cls = c ? 1 : 0;
      AdaptiveScan& scan = (c == 0) ? ctx.scan_lp : ctx.scan_lp_chroma;
      I32 his[16], los[16];
      std::memset(his, 0, sizeof(his));
      std::memset(los, 0, sizeof(los));
      if (any[c] &&
          !decode_block(br, scan, ctx.first_lp[cls], ctx.next_lp[cls],
                        ctx.run_lp[cls], ctx.abs_lp[cls], his, g.nlp))
        return false;
      if (bits_lp[c])
        for (int i = 1; i <= g.nlp; ++i) los[i] = (I32)br.get(bits_lp[c]);
      int pidx[3];
      const int np = lp_pred_idx(g, dmode, pidx);
      const int neighbor =
          dmode == kPredLeft ? at.m - 1 : (dmode == kPredTop ? at.m - cfg.mb_w : -1);
      for (int i = 1; i <= g.nlp; ++i) {
        const bool neg =
            (his[i] == 0 && los[i] != 0) ? br.get1() != 0 : false;
        I32 pred = 0;
        for (int j = 0; j < np; ++j)
          if (pidx[j] == i && neighbor >= 0)
            pred = cc[c].lp[(size_t)neighbor * g.nlp + i - 1];
        cc[c].lp[(size_t)at.m * g.nlp + i - 1] =
            merge_hilo(his[i], los[i], bits_lp[c], neg) + pred;
        lp_hi_sum[cls] += his[i] < 0 ? -his[i] : his[i];
      }
      if (br.fail()) return false;
    }
  } else {
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      for (int i = 0; i < g.nlp; ++i)
        cc[c].lp[(size_t)at.m * g.nlp + i] = 0;
    }
  }

  // ---- CBP + HP + FLEXBITS ----
  int64_t hp_hi_sum[2] = {0, 0};
  if (cfg.bands <= 1) {
    const int hmode = hp_pred_mode(cfg, cc, at.m);
    AdaptiveScan& scan = (hmode == kPredTop) ? ctx.scan_hp_v : ctx.scan_hp_h;
    I32 his[3][16][16];
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const int cls = c ? 1 : 0;
      uint32_t mask = 0;
      if (g.nblk == 16) {
        const int qmask = ctx.cbp_quad.decode(br);
        if (qmask < 0) return false;
        for (int q = 0; q < 4; ++q) {
          if (!(qmask & (1 << q))) continue;
          const int pat = ctx.cbp_pat.decode(br);
          if (pat < 0) return false;
          for (int pos = 0; pos < 4; ++pos) {
            if (!((pat + 1) & (1 << pos))) continue;
            const int b = ((q >> 1) * 2 + (pos >> 1)) * 4 + (q & 1) * 2 +
                          (pos & 1);
            mask |= 1u << b;
          }
        }
      } else if (g.nblk == 4) {
        const int m4 = ctx.cbp_chroma.decode(br);
        if (m4 < 0) return false;
        mask = (uint32_t)m4;
      } else {
        const int lo4 = ctx.cbp_chroma.decode(br);
        const int hi4 = ctx.cbp_chroma.decode(br);
        if (lo4 < 0 || hi4 < 0) return false;
        mask = (uint32_t)lo4 | ((uint32_t)hi4 << 4);
      }
      for (int b = 0; b < g.nblk; ++b) {
        I32 res[16];
        std::memset(res, 0, sizeof(res));
        if (mask & (1u << b)) {
          if (!decode_block(br, scan, ctx.first_hp[cls], ctx.next_hp[cls],
                            ctx.run_hp[cls], ctx.abs_hp[cls], res, 15))
            return false;
        }
        const int bx = b % g.blk_w, by = b / g.blk_w;
        for (int i = 1; i <= 15; ++i) {
          I32 v = res[i];
          hp_hi_sum[cls] += v < 0 ? -v : v;
          if (hmode == kPredLeft && bx > 0 && (i == 4 || i == 8 || i == 12))
            v += his[c][b - 1][i];
          else if (hmode == kPredTop && by > 0 && (i >= 1 && i <= 3))
            v += his[c][b - g.blk_w][i];
          his[c][b][i] = v;
        }
        his[c][b][0] = 0;
      }
    }
    // FLEXBITS (or zero lows when absent)
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const int eff =
          (cfg.bands == 0) ? std::max(0, bits_hp[c] - cfg.trim) : 0;
      for (int b = 0; b < g.nblk; ++b) {
        const size_t base = ((size_t)at.m * g.nblk + b) * 15;
        for (int i = 1; i <= 15; ++i) {
          I32 stored = 0;
          bool neg = false;
          if (cfg.bands == 0 && bits_hp[c] > 0) {
            stored = eff ? (I32)br.get(eff) : 0;
            if (his[c][b][i] == 0 && stored != 0) neg = br.get1() != 0;
          }
          cc[c].hp[base + i - 1] =
              merge_hilo(his[c][b][i], stored << cfg.trim, bits_hp[c], neg);
        }
      }
    }
    if (br.fail()) return false;
  } else {
    for (int c = 0; c < nc; ++c) {
      const PlaneGeom& g = cc[c].g;
      const size_t base = (size_t)at.m * g.nblk * 15;
      for (int i = 0; i < g.nblk * 15; ++i) cc[c].hp[base + i] = 0;
    }
  }

  ctx.model_dc.update(0, dc_hi_sum[0], 1);
  if (nc == 3) ctx.model_dc.update(1, dc_hi_sum[1], 2);
  if (cfg.bands <= 2) {
    ctx.model_lp.update(0, lp_hi_sum[0], cc[0].g.nlp);
    if (nc == 3) ctx.model_lp.update(1, lp_hi_sum[1], 2 * cc[1].g.nlp);
  }
  if (cfg.bands <= 1) {
    ctx.model_hp.update(0, hp_hi_sum[0], cc[0].g.nblk * 15);
    if (nc == 3) ctx.model_hp.update(1, hp_hi_sum[1], 2 * cc[1].g.nblk * 15);
  }
  return true;
}

// ===========================================================================
// Whole-plane transform pipeline (both directions).
// ===========================================================================

template <typename F>
inline void apply_4x4_region(vector<I32>& p, int w, int x0, int y0, F f) {
  I32 t[16];
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) t[r * 4 + c] = p[(size_t)(y0 + r) * w + x0 + c];
  f(t);
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) p[(size_t)(y0 + r) * w + x0 + c] = t[r * 4 + c];
}

// Overlap filter stage over a plane whose transform blocks are 4x4 units:
// 4x4 operators on interior block junctions (offset 2,2), 1-D 4-point
// filters along the plane edges, 2x2 operators in the corners.  All
// regions are disjoint, so the inverse replays the same traversal with the
// mirrored operators.
void overlap_stage4(vector<I32>& p, int w, int h, bool fwd) {
  for (int y0 = 2; y0 + 4 <= h - 2; y0 += 4)
    for (int x0 = 2; x0 + 4 <= w - 2; x0 += 4)
      apply_4x4_region(p, w, x0, y0, fwd ? fwd_olp4x4 : inv_olp4x4);
  const int edge_rows[4] = {0, 1, h - 2, h - 1};
  for (int e = 0; e < 4; ++e) {
    const int y = edge_rows[e];
    for (int x0 = 2; x0 + 4 <= w - 2; x0 += 4) {
      I32* q = &p[(size_t)y * w + x0];
      fwd ? fwd_olp4(q[0], q[1], q[2], q[3]) : inv_olp4(q[0], q[1], q[2], q[3]);
    }
  }
  const int edge_cols[4] = {0, 1, w - 2, w - 1};
  for (int e = 0; e < 4; ++e) {
    const int x = edge_cols[e];
    for (int y0 = 2; y0 + 4 <= h - 2; y0 += 4) {
      I32 a = p[(size_t)y0 * w + x], b = p[(size_t)(y0 + 1) * w + x],
          c = p[(size_t)(y0 + 2) * w + x], d = p[(size_t)(y0 + 3) * w + x];
      fwd ? fwd_olp4(a, b, c, d) : inv_olp4(a, b, c, d);
      p[(size_t)y0 * w + x] = a;
      p[(size_t)(y0 + 1) * w + x] = b;
      p[(size_t)(y0 + 2) * w + x] = c;
      p[(size_t)(y0 + 3) * w + x] = d;
    }
  }
  const int cx[4] = {0, w - 2, 0, w - 2}, cy[4] = {0, 0, h - 2, h - 2};
  for (int k = 0; k < 4; ++k) {
    I32& a = p[(size_t)cy[k] * w + cx[k]];
    I32& b = p[(size_t)cy[k] * w + cx[k] + 1];
    I32& c = p[(size_t)(cy[k] + 1) * w + cx[k]];
    I32& d = p[(size_t)(cy[k] + 1) * w + cx[k] + 1];
    if (fwd) {
      fwd_olp2(a, d);
      fwd_olp2(b, c);
    } else {
      inv_olp2(b, c);
      inv_olp2(a, d);
    }
  }
}

// Second-level overlap for 2x2-block DC grids (YUV420 chroma): 2x2
// operators on interior MB junctions only.
void overlap_stage2(vector<I32>& p, int w, int h, bool fwd) {
  for (int y0 = 1; y0 + 2 <= h; y0 += 2)
    for (int x0 = 1; x0 + 2 <= w; x0 += 2) {
      I32& a = p[(size_t)y0 * w + x0];
      I32& b = p[(size_t)y0 * w + x0 + 1];
      I32& c = p[(size_t)(y0 + 1) * w + x0];
      I32& d = p[(size_t)(y0 + 1) * w + x0 + 1];
      if (fwd) {
        fwd_olp2(a, d);
        fwd_olp2(b, c);
      } else {
        inv_olp2(b, c);
        inv_olp2(a, d);
      }
    }
}

void analyze_plane(vector<I32>& px, CompCoef& cc, int overlap, I32 qdc,
                   I32 qlp, I32 qhp, int mb_w, int mb_h) {
  const PlaneGeom& g = cc.g;
  const int w = g.pw, h = g.ph;
  if (overlap >= 1) overlap_stage4(px, w, h, true);
  for (int y0 = 0; y0 < h; y0 += 4)
    for (int x0 = 0; x0 < w; x0 += 4) apply_4x4_region(px, w, x0, y0, fwd_pct4x4);
  const int w2 = w / 4, h2 = h / 4;
  vector<I32> dg((size_t)w2 * h2);
  for (int by = 0; by < h2; ++by)
    for (int bx = 0; bx < w2; ++bx)
      dg[(size_t)by * w2 + bx] = px[(size_t)(4 * by) * w + 4 * bx];
  if (overlap == 2) {
    if (g.blk_w == 4) overlap_stage4(dg, w2, h2, true);
    else if (g.blk_w == 2 && g.blk_h == 2) overlap_stage2(dg, w2, h2, true);
    // 422 chroma (2x4 MB DC grid): second-level overlap intentionally
    // skipped — mirrored on the decode side.
  }
  cc.dc.assign((size_t)mb_w * mb_h, 0);
  cc.lp.assign((size_t)mb_w * mb_h * g.nlp, 0);
  cc.hp.assign((size_t)mb_w * mb_h * g.nblk * 15, 0);
  for (int mby = 0; mby < mb_h; ++mby) {
    for (int mbx = 0; mbx < mb_w; ++mbx) {
      const int m = mby * mb_w + mbx;
      I32 arr[16];
      for (int r = 0; r < g.blk_h; ++r)
        for (int c = 0; c < g.blk_w; ++c)
          arr[r * g.blk_w + c] =
              dg[(size_t)(mby * g.blk_h + r) * w2 + mbx * g.blk_w + c];
      if (g.nblk == 16) fwd_pct4x4(arr);
      else if (g.nblk == 4) fwd_pct2x2(arr);
      else fwd_pct2x4(arr);
      cc.dc[m] = quantize(arr[0], qdc);
      for (int i = 1; i <= g.nlp; ++i)
        cc.lp[(size_t)m * g.nlp + i - 1] = quantize(arr[i], qlp);
      for (int b = 0; b < g.nblk; ++b) {
        const int ox = (mbx * g.blk_w + b % g.blk_w) * 4;
        const int oy = (mby * g.blk_h + b / g.blk_w) * 4;
        const size_t base = ((size_t)m * g.nblk + b) * 15;
        for (int i = 1; i <= 15; ++i)
          cc.hp[base + i - 1] =
              quantize(px[(size_t)(oy + i / 4) * w + ox + i % 4], qhp);
      }
    }
  }
}

void synthesize_plane(CompCoef& cc, vector<I32>& px, int overlap, I32 qdc,
                      I32 qlp, I32 qhp, int mb_w, int mb_h) {
  const PlaneGeom& g = cc.g;
  const int w = g.pw, h = g.ph;
  const int w2 = w / 4, h2 = h / 4;
  px.assign((size_t)w * h, 0);
  vector<I32> dg((size_t)w2 * h2, 0);
  for (int mby = 0; mby < mb_h; ++mby) {
    for (int mbx = 0; mbx < mb_w; ++mbx) {
      const int m = mby * mb_w + mbx;
      I32 arr[16];
      arr[0] = dequantize(cc.dc[m], qdc);
      for (int i = 1; i <= g.nlp; ++i)
        arr[i] = dequantize(cc.lp[(size_t)m * g.nlp + i - 1], qlp);
      if (g.nblk == 16) inv_pct4x4(arr);
      else if (g.nblk == 4) inv_pct2x2(arr);
      else inv_pct2x4(arr);
      for (int r = 0; r < g.blk_h; ++r)
        for (int c = 0; c < g.blk_w; ++c)
          dg[(size_t)(mby * g.blk_h + r) * w2 + mbx * g.blk_w + c] =
              arr[r * g.blk_w + c];
      for (int b = 0; b < g.nblk; ++b) {
        const int ox = (mbx * g.blk_w + b % g.blk_w) * 4;
        const int oy = (mby * g.blk_h + b / g.blk_w) * 4;
        const size_t base = ((size_t)m * g.nblk + b) * 15;
        for (int i = 1; i <= 15; ++i)
          px[(size_t)(oy + i / 4) * w + ox + i % 4] =
              dequantize(cc.hp[base + i - 1], qhp);
      }
    }
  }
  if (overlap == 2) {
    if (g.blk_w == 4) overlap_stage4(dg, w2, h2, false);
    else if (g.blk_w == 2 && g.blk_h == 2) overlap_stage2(dg, w2, h2, false);
  }
  for (int by = 0; by < h2; ++by)
    for (int bx = 0; bx < w2; ++bx)
      px[(size_t)(4 * by) * w + 4 * bx] = dg[(size_t)by * w2 + bx];
  for (int y0 = 0; y0 < h; y0 += 4)
    for (int x0 = 0; x0 < w; x0 += 4) apply_4x4_region(px, w, x0, y0, inv_pct4x4);
  if (overlap >= 1) overlap_stage4(px, w, h, false);
}

// ===========================================================================
// Headers, index table, container.
// ===========================================================================

struct ImageHeader {
  bool hard_tiling = false, tiling = false, frequency = false;
  bool index_present = true;
  int spatial_xfrm = 0, overlap = 1;
  bool short_header = true, long_word = false, windowing = false;
  bool trim_flag = false;
  bool red_blue_not_swapped = true, premult_alpha = false, alpha_plane = false;
  int out_clr = 6, out_bd = 1;  // RGB, BD8
  uint32_t width = 0, height = 0;
  vector<int> tile_w_mb, tile_h_mb;  // per-tile sizes, all entries
  int top = 0, left = 0, bottom = 0, right = 0;
};

struct PlaneHeader {
  int clr = 3;  // internal color format
  bool scaled = true;
  int bands = 0;
  int chroma_cx = 0, chroma_cy = 0;
  int shift_bits = 0;
  int qp_dc[3] = {0, 0, 0}, qp_lp[3] = {0, 0, 0}, qp_hp[3] = {0, 0, 0};
};

const uint8_t kGdiSig[8] = {'W', 'M', 'P', 'H', 'O', 'T', 'O', 0};

void write_image_header(BitWriter& bw, const ImageHeader& ih, int mb_w,
                        int mb_h) {
  for (int i = 0; i < 8; ++i) bw.put(kGdiSig[i], 8);
  bw.put(1, 4);  // RESERVED_B (codestream version)
  bw.put1(ih.hard_tiling);
  bw.put(1, 3);  // RESERVED_C
  bw.put1(ih.tiling);
  bw.put1(ih.frequency);
  bw.put((uint32_t)ih.spatial_xfrm, 3);
  bw.put1(ih.index_present);
  bw.put((uint32_t)ih.overlap, 2);
  bw.put1(ih.short_header);
  bw.put1(ih.long_word);
  bw.put1(ih.windowing);
  bw.put1(ih.trim_flag);
  bw.put1(0);  // RESERVED_D
  bw.put1(ih.red_blue_not_swapped);
  bw.put1(ih.premult_alpha);
  bw.put1(ih.alpha_plane);
  bw.put((uint32_t)ih.out_clr, 4);
  bw.put((uint32_t)ih.out_bd, 4);
  const int dim_bits = ih.short_header ? 16 : 32;
  bw.put(ih.width - 1, dim_bits);
  bw.put(ih.height - 1, dim_bits);
  if (ih.tiling) {
    bw.put((uint32_t)(ih.tile_w_mb.size() - 1), 12);
    bw.put((uint32_t)(ih.tile_h_mb.size() - 1), 12);
  }
  const int mb_bits = ih.short_header ? 8 : 16;
  for (size_t i = 0; i + 1 < ih.tile_w_mb.size(); ++i)
    bw.put((uint32_t)ih.tile_w_mb[i], mb_bits);
  for (size_t i = 0; i + 1 < ih.tile_h_mb.size(); ++i)
    bw.put((uint32_t)ih.tile_h_mb[i], mb_bits);
  if (ih.windowing) {
    bw.put((uint32_t)ih.top, 6);
    bw.put((uint32_t)ih.left, 6);
    bw.put((uint32_t)ih.bottom, 6);
    bw.put((uint32_t)ih.right, 6);
  }
  (void)mb_w;
  (void)mb_h;
}

bool read_image_header(BitReader& br, ImageHeader* ih, int* mb_w, int* mb_h,
                       string* err) {
  for (int i = 0; i < 8; ++i) {
    if (br.get(8) != kGdiSig[i]) {
      *err = "not a WMPHOTO codestream";
      return false;
    }
  }
  br.get(4);  // RESERVED_B
  ih->hard_tiling = br.get1();
  br.get(3);  // RESERVED_C
  ih->tiling = br.get1();
  ih->frequency = br.get1();
  ih->spatial_xfrm = (int)br.get(3);
  ih->index_present = br.get1();
  ih->overlap = (int)br.get(2);
  ih->short_header = br.get1();
  ih->long_word = br.get1();
  ih->windowing = br.get1();
  ih->trim_flag = br.get1();
  br.get1();  // RESERVED_D
  ih->red_blue_not_swapped = br.get1();
  ih->premult_alpha = br.get1();
  ih->alpha_plane = br.get1();
  ih->out_clr = (int)br.get(4);
  ih->out_bd = (int)br.get(4);
  const int dim_bits = ih->short_header ? 16 : 32;
  ih->width = br.get(dim_bits) + 1;
  ih->height = br.get(dim_bits) + 1;
  int cols = 1, rows = 1;
  if (ih->tiling) {
    cols = (int)br.get(12) + 1;
    rows = (int)br.get(12) + 1;
  }
  if (cols * rows > 4096) {
    *err = "JPEG-XR: implausible tile count";
    return false;
  }
  if (ih->frequency) {
    *err = "JPEG-XR: frequency-mode codestream not supported";
    return false;
  }
  if (ih->alpha_plane) {
    *err = "JPEG-XR: alpha image plane not supported";
    return false;
  }
  if (ih->overlap == 3) {
    *err = "JPEG-XR: reserved overlap mode";
    return false;
  }
  // Cap the decoded size: the per-MB coefficient stores are ~14x the
  // pixel count in bytes, so a crafted header must not be able to demand
  // multi-GiB allocations (CZI subblocks are typically <= 4 MP).
  if (ih->width > 32768 || ih->height > 32768 ||
      (uint64_t)ih->width * ih->height > (1u << 24)) {
    *err = "JPEG-XR: image too large";
    return false;
  }
  // tile-size lists (the last entry of each is implied by the image size),
  // then the windowing margins — the writer's field order.
  const int mb_bits = ih->short_header ? 8 : 16;
  ih->tile_w_mb.assign((size_t)cols, 0);
  ih->tile_h_mb.assign((size_t)rows, 0);
  int acc_w = 0, acc_h = 0;
  for (int i = 0; i + 1 < cols; ++i) {
    ih->tile_w_mb[i] = (int)br.get(mb_bits);
    acc_w += ih->tile_w_mb[i];
  }
  for (int i = 0; i + 1 < rows; ++i) {
    ih->tile_h_mb[i] = (int)br.get(mb_bits);
    acc_h += ih->tile_h_mb[i];
  }
  if (ih->windowing) {
    ih->top = (int)br.get(6);
    ih->left = (int)br.get(6);
    ih->bottom = (int)br.get(6);
    ih->right = (int)br.get(6);
  }
  const int ext_w = ih->left + (int)ih->width + ih->right;
  const int ext_h = ih->top + (int)ih->height + ih->bottom;
  *mb_w = (ext_w + 15) / 16;
  *mb_h = (ext_h + 15) / 16;
  ih->tile_w_mb[cols - 1] = *mb_w - acc_w;
  ih->tile_h_mb[rows - 1] = *mb_h - acc_h;
  if (ih->tile_w_mb[cols - 1] <= 0 || ih->tile_h_mb[rows - 1] <= 0) {
    *err = "JPEG-XR: tile sizes exceed the image";
    return false;
  }
  for (int i = 0; i + 1 < cols; ++i)
    if (ih->tile_w_mb[i] <= 0) {
      *err = "JPEG-XR: empty tile column";
      return false;
    }
  for (int i = 0; i + 1 < rows; ++i)
    if (ih->tile_h_mb[i] <= 0) {
      *err = "JPEG-XR: empty tile row";
      return false;
    }
  if (br.fail()) {
    *err = "JPEG-XR: truncated image header";
    return false;
  }
  return true;
}

void write_qp_set(BitWriter& bw, int ncomp, const int* qp) {
  if (ncomp == 1) {
    bw.put((uint32_t)qp[0], 8);
    return;
  }
  bw.put(0, 2);  // COMPONENT_MODE: uniform
  bw.put((uint32_t)qp[0], 8);
}
bool read_qp_set(BitReader& br, int ncomp, int* qp, string* err) {
  if (ncomp == 1) {
    qp[0] = (int)br.get(8);
    return true;
  }
  const int mode = (int)br.get(2);
  switch (mode) {
    case 0:
      qp[0] = qp[1] = qp[2] = (int)br.get(8);
      return true;
    case 1:
      qp[0] = (int)br.get(8);
      qp[1] = qp[2] = (int)br.get(8);
      return true;
    case 2:
      for (int c = 0; c < ncomp; ++c) qp[c] = (int)br.get(8);
      return true;
    default:
      *err = "JPEG-XR: reserved QP component mode";
      return false;
  }
}

void write_plane_header(BitWriter& bw, const ImageHeader& ih,
                        const PlaneHeader& ph, int ncomp) {
  bw.put((uint32_t)ph.clr, 3);
  bw.put1(ph.scaled);
  bw.put((uint32_t)ph.bands, 4);
  if (ph.clr == 1) {  // YUV420
    bw.put1(0);
    bw.put((uint32_t)ph.chroma_cx, 3);
    bw.put1(0);
    bw.put((uint32_t)ph.chroma_cy, 3);
  } else if (ph.clr == 2) {  // YUV422
    bw.put1(0);
    bw.put((uint32_t)ph.chroma_cx, 3);
  }
  if (ih.out_bd == 2 || ih.out_bd == 3 || ih.out_bd == 6)
    bw.put((uint32_t)ph.shift_bits, 8);
  bw.put1(1);  // DC_IMAGE_PLANE_UNIFORM_FLAG
  write_qp_set(bw, ncomp, ph.qp_dc);
  if (ph.bands != 3) {
    bw.put1(0);  // USE_DC_QP_FLAG
    bw.put1(1);  // LP_IMAGE_PLANE_UNIFORM_FLAG
    write_qp_set(bw, ncomp, ph.qp_lp);
    if (ph.bands != 2) {
      bw.put1(0);  // USE_LP_QP_FLAG
      bw.put1(1);  // HP_IMAGE_PLANE_UNIFORM_FLAG
      write_qp_set(bw, ncomp, ph.qp_hp);
    }
  }
  bw.byte_align();
}

bool read_plane_header(BitReader& br, const ImageHeader& ih, PlaneHeader* ph,
                       int* ncomp, string* err) {
  ph->clr = (int)br.get(3);
  ph->scaled = br.get1();
  ph->bands = (int)br.get(4);
  if (ph->bands > 3) {
    *err = "JPEG-XR: reserved BANDS_PRESENT";
    return false;
  }
  switch (ph->clr) {
    case 0:
      *ncomp = 1;
      break;
    case 1:
      br.get1();
      ph->chroma_cx = (int)br.get(3);
      br.get1();
      ph->chroma_cy = (int)br.get(3);
      *ncomp = 3;
      break;
    case 2:
      br.get1();
      ph->chroma_cx = (int)br.get(3);
      *ncomp = 3;
      break;
    case 3:
      *ncomp = 3;
      break;
    default:
      *err = "JPEG-XR: unsupported internal color format " +
             std::to_string(ph->clr);
      return false;
  }
  if (ih.out_bd == 2 || ih.out_bd == 3 || ih.out_bd == 6)
    ph->shift_bits = (int)br.get(8);
  if (!br.get1()) {
    *err = "JPEG-XR: per-tile DC quantization not supported";
    return false;
  }
  if (!read_qp_set(br, *ncomp, ph->qp_dc, err)) return false;
  if (ph->bands != 3) {
    const bool use_dc = br.get1();
    if (use_dc) {
      for (int c = 0; c < 3; ++c) ph->qp_lp[c] = ph->qp_dc[c];
    } else {
      if (!br.get1()) {
        *err = "JPEG-XR: per-tile LP quantization not supported";
        return false;
      }
      if (!read_qp_set(br, *ncomp, ph->qp_lp, err)) return false;
    }
    if (ph->bands != 2) {
      const bool use_lp = br.get1();
      if (use_lp) {
        for (int c = 0; c < 3; ++c) ph->qp_hp[c] = ph->qp_lp[c];
      } else {
        if (!br.get1()) {
          *err = "JPEG-XR: per-tile HP quantization not supported";
          return false;
        }
        if (!read_qp_set(br, *ncomp, ph->qp_hp, err)) return false;
      }
    }
  }
  br.byte_align();
  if (br.fail()) {
    *err = "JPEG-XR: truncated plane header";
    return false;
  }
  return true;
}

// --- VLW_ESC (byte-oriented variable-length words, index table) ------------

uint64_t read_vlw_esc(BitReader& br) {
  const uint32_t b0 = br.get(8);
  if (b0 < 0xFB) return ((uint64_t)b0 << 8) | br.get(8);
  if (b0 == 0xFB) return br.get(32);
  if (b0 == 0xFC) {
    const uint64_t hi = br.get(32);  // sequenced: | would leave the two
    const uint64_t lo = br.get(32);  // get() side effects unordered
    return (hi << 32) | lo;
  }
  return 0;  // 0xFD-0xFF: escape/reserved
}
void write_vlw_esc(BitWriter& bw, uint64_t v) {
  if (v < ((uint64_t)0xFB << 8)) {
    bw.put((uint32_t)v, 16);
  } else if (v <= 0xFFFFFFFFull) {
    bw.put(0xFB, 8);
    bw.put((uint32_t)v, 32);
  } else {
    bw.put(0xFC, 8);
    bw.put((uint32_t)(v >> 32), 32);
    bw.put((uint32_t)v, 32);
  }
}

// ===========================================================================
// Tile drivers.
// ===========================================================================

void encode_tile(BitWriter& bw, CodecConfig cfg, vector<CompCoef>& cc,
                 int tx0, int ty0, int tw, int th) {
  bw.put(1, 24);  // TILE_STARTCODE
  bw.put(0, 8);
  if (cfg.trim > 0) bw.put((uint32_t)cfg.trim, 4);
  EntroCtx ctx;
  ctx.reset();
  if (cfg.ncomp > 1 && cc[1].g.nlp < 15)
    reset_short_scan(ctx.scan_lp_chroma, cc[1].g.nlp);
  for (int my = ty0; my < ty0 + th; ++my)
    for (int mx = tx0; mx < tx0 + tw; ++mx) {
      MbPos at{mx, my, my * cfg.mb_w + mx, tx0, ty0};
      encode_mb(bw, ctx, cfg, cc, at);
    }
  bw.byte_align();
}

bool decode_tile(BitReader& br, CodecConfig cfg, bool trim_flag,
                 vector<CompCoef>& cc, int tx0, int ty0, int tw, int th,
                 string* err) {
  if (br.get(24) != 1) {
    *err = "JPEG-XR: bad tile startcode";
    return false;
  }
  br.get(8);
  cfg.trim = trim_flag ? (int)br.get(4) : 0;
  EntroCtx ctx;
  ctx.reset();
  if (cfg.ncomp > 1 && cc[1].g.nlp < 15)
    reset_short_scan(ctx.scan_lp_chroma, cc[1].g.nlp);
  for (int my = ty0; my < ty0 + th; ++my)
    for (int mx = tx0; mx < tx0 + tw; ++mx) {
      MbPos at{mx, my, my * cfg.mb_w + mx, tx0, ty0};
      if (!decode_mb(br, ctx, cfg, cc, at)) {
        *err = "JPEG-XR: corrupt macroblock data";
        return false;
      }
    }
  return true;
}

// ===========================================================================
// Top-level encode.
// ===========================================================================

struct InPlane {
  vector<I32> v;
  int w = 0, h = 0;
};

bool encode_core(vector<InPlane>& in, int w, int h, int clr, int out_clr,
                 int out_bd, const EncodeParams& p, vector<uint8_t>* out,
                 string* err) {
  const int ncomp = (clr == 0) ? 1 : 3;
  const int mb_w = (w + 15) / 16, mb_h = (h + 15) / 16;
  if (mb_w <= 0 || mb_h <= 0 || w > 32768 || h > 32768) {
    *err = "JPEG-XR: unsupported image size";
    return false;
  }
  CodecConfig cfg;
  cfg.ncomp = ncomp;
  cfg.clr = clr;
  cfg.bands = p.bands;
  cfg.trim = p.trim_flexbits;
  cfg.mb_w = mb_w;
  cfg.mb_h = mb_h;

  vector<CompCoef> cc(ncomp);
  for (int c = 0; c < ncomp; ++c) {
    cc[c].g = plane_geom(clr, c, mb_w, mb_h);
    const PlaneGeom& g = cc[c].g;
    // extend by edge replication to the coded plane size
    vector<I32> px((size_t)g.pw * g.ph);
    for (int y = 0; y < g.ph; ++y) {
      const int sy = std::min(y, in[c].h - 1);
      for (int x = 0; x < g.pw; ++x) {
        const int sx = std::min(x, in[c].w - 1);
        px[(size_t)y * g.pw + x] = in[c].v[(size_t)sy * in[c].w + sx];
      }
    }
    analyze_plane(px, cc[c], p.overlap, qp_to_quant(p.qp_dc),
                  qp_to_quant(p.qp_lp), qp_to_quant(p.qp_hp), mb_w, mb_h);
  }

  BitWriter tbw;
  encode_tile(tbw, cfg, cc, 0, 0, mb_w, mb_h);
  vector<uint8_t> tile_bytes = tbw.take();

  ImageHeader ih;
  ih.overlap = p.overlap;
  ih.out_clr = out_clr;
  ih.out_bd = out_bd;
  ih.width = (uint32_t)w;
  ih.height = (uint32_t)h;
  ih.short_header = true;
  ih.trim_flag = p.trim_flexbits > 0;
  ih.right = mb_w * 16 - w;
  ih.bottom = mb_h * 16 - h;
  ih.windowing = (ih.right != 0 || ih.bottom != 0);
  ih.tile_w_mb = {mb_w};
  ih.tile_h_mb = {mb_h};

  PlaneHeader ph;
  ph.clr = clr;
  ph.bands = p.bands;
  ph.qp_dc[0] = ph.qp_dc[1] = ph.qp_dc[2] = p.qp_dc;
  ph.qp_lp[0] = ph.qp_lp[1] = ph.qp_lp[2] = p.qp_lp;
  ph.qp_hp[0] = ph.qp_hp[1] = ph.qp_hp[2] = p.qp_hp;

  BitWriter hbw;
  write_image_header(hbw, ih, mb_w, mb_h);
  write_plane_header(hbw, ih, ph, ncomp);
  hbw.put(1, 16);  // INDEX_TABLE_STARTCODE
  write_vlw_esc(hbw, 0);  // single tile at offset 0
  write_vlw_esc(hbw, 0);  // no subsequent (profile/level) bytes
  vector<uint8_t> head = hbw.take();

  out->clear();
  out->reserve(head.size() + tile_bytes.size());
  out->insert(out->end(), head.begin(), head.end());
  out->insert(out->end(), tile_bytes.begin(), tile_bytes.end());
  return true;
}

// ===========================================================================
// Top-level decode.
// ===========================================================================

bool decode_core(const uint8_t* cs, size_t len, vector<uint8_t>* rgb, int* W,
                 int* H, string* err) {
  BitReader br(cs, len);
  ImageHeader ih;
  int mb_w = 0, mb_h = 0;
  if (!read_image_header(br, &ih, &mb_w, &mb_h, err)) return false;
  if (ih.out_bd != 1 && ih.out_bd != 2) {
    *err = "JPEG-XR: unsupported output bit depth " + std::to_string(ih.out_bd);
    return false;
  }
  PlaneHeader ph;
  int ncomp = 0;
  if (!read_plane_header(br, ih, &ph, &ncomp, err)) return false;
  if (!((ih.out_clr == 6 && ncomp == 3) || (ih.out_clr == 0 && ncomp == 1))) {
    *err = "JPEG-XR: unsupported output color format " +
           std::to_string(ih.out_clr);
    return false;
  }

  const int cols = (int)ih.tile_w_mb.size(), rows = (int)ih.tile_h_mb.size();
  const int n_tiles = cols * rows;
  vector<uint64_t> offs((size_t)n_tiles, 0);
  if (ih.index_present) {
    if (br.get(16) != 1) {
      *err = "JPEG-XR: bad index-table startcode";
      return false;
    }
    for (int t = 0; t < n_tiles; ++t) offs[t] = read_vlw_esc(br);
  } else if (n_tiles > 1) {
    *err = "JPEG-XR: multi-tile codestream without an index table";
    return false;
  }
  const uint64_t subseq = read_vlw_esc(br);
  if (br.fail()) {
    *err = "JPEG-XR: truncated header";
    return false;
  }
  br.byte_align();
  const uint64_t origin = br.byte_pos() + subseq;
  if (origin > len) {
    *err = "JPEG-XR: header overruns the codestream";
    return false;
  }

  CodecConfig cfg;
  cfg.ncomp = ncomp;
  cfg.clr = ph.clr;
  cfg.bands = ph.bands;
  cfg.mb_w = mb_w;
  cfg.mb_h = mb_h;
  vector<CompCoef> cc(ncomp);
  for (int c = 0; c < ncomp; ++c) {
    cc[c].g = plane_geom(ph.clr, c, mb_w, mb_h);
    cc[c].dc.assign((size_t)mb_w * mb_h, 0);
    cc[c].lp.assign((size_t)mb_w * mb_h * cc[c].g.nlp, 0);
    cc[c].hp.assign((size_t)mb_w * mb_h * cc[c].g.nblk * 15, 0);
  }

  int ty0 = 0, t = 0;
  for (int r = 0; r < rows; ++r) {
    int tx0 = 0;
    for (int cix = 0; cix < cols; ++cix, ++t) {
      // offs is attacker-controlled: bound it before the addition so the
      // sum cannot wrap around
      if (offs[t] >= len || origin + offs[t] >= len) {
        *err = "JPEG-XR: tile offset outside the codestream";
        return false;
      }
      BitReader tbr(cs, len);
      tbr.seek_byte((size_t)(origin + offs[t]));
      if (!decode_tile(tbr, cfg, ih.trim_flag, cc, tx0, ty0,
                       ih.tile_w_mb[cix], ih.tile_h_mb[r], err))
        return false;
      tx0 += ih.tile_w_mb[cix];
    }
    ty0 += ih.tile_h_mb[r];
  }

  vector<vector<I32>> px(ncomp);
  for (int c = 0; c < ncomp; ++c)
    synthesize_plane(cc[c], px[c], ih.overlap, qp_to_quant(ph.qp_dc[c]),
                     qp_to_quant(ph.qp_lp[c]), qp_to_quant(ph.qp_hp[c]), mb_w,
                     mb_h);

  const int w = (int)ih.width, h = (int)ih.height;
  const int shift = ph.scaled ? 3 : 0;
  const I32 round = ph.scaled ? 4 : 0;
  const I32 bias = (ih.out_bd == 2) ? 32768 : 128;
  const I32 maxv = (ih.out_bd == 2) ? 65535 : 255;
  const int ssx = (ph.clr == 1 || ph.clr == 2) ? 2 : 1;
  const int ssy = (ph.clr == 1) ? 2 : 1;
  const int lw = cc[0].g.pw;
  rgb->assign((size_t)w * h * 3, 0);
  for (int y = 0; y < h; ++y) {
    const int py = ih.top + y;
    for (int x = 0; x < w; ++x) {
      const int pxx = ih.left + x;
      I32 c0 = px[0][(size_t)py * lw + pxx];
      uint8_t r8, g8, b8;
      if (ncomp == 3) {
        const int cw = cc[1].g.pw;
        I32 c1 = px[1][(size_t)(py / ssy) * cw + pxx / ssx];
        I32 c2 = px[2][(size_t)(py / ssy) * cw + pxx / ssx];
        inv_yuv2rgb(c0, c1, c2);  // (y,u,v) → (r,g,b) in place
        I32 rr = ((c0 + round) >> shift) + bias;
        I32 gg = ((c1 + round) >> shift) + bias;
        I32 bb = ((c2 + round) >> shift) + bias;
        rr = std::clamp(rr, (I32)0, maxv);
        gg = std::clamp(gg, (I32)0, maxv);
        bb = std::clamp(bb, (I32)0, maxv);
        if (ih.out_bd == 2) {
          rr >>= 8;
          gg >>= 8;
          bb >>= 8;
        }
        if (!ih.red_blue_not_swapped) std::swap(rr, bb);
        r8 = (uint8_t)rr;
        g8 = (uint8_t)gg;
        b8 = (uint8_t)bb;
      } else {
        I32 vv = ((c0 + round) >> shift) + bias;
        vv = std::clamp(vv, (I32)0, maxv);
        if (ih.out_bd == 2) vv >>= 8;
        r8 = g8 = b8 = (uint8_t)vv;
      }
      const size_t o = ((size_t)y * w + x) * 3;
      (*rgb)[o] = r8;
      (*rgb)[o + 1] = g8;
      (*rgb)[o + 2] = b8;
    }
  }
  *W = w;
  *H = h;
  return true;
}

// ===========================================================================
// II-BC container.
// ===========================================================================

inline uint32_t le32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
inline uint16_t le16(const uint8_t* p) {
  return (uint16_t)(p[0] | (p[1] << 8));
}

bool parse_container(const uint8_t* d, size_t len, size_t* cs_off,
                     size_t* cs_len, string* err) {
  if (len < 16 || d[0] != 'I' || d[1] != 'I' || d[2] != 0xBC) {
    *err = "JPEG-XR: not an II-BC container";
    return false;
  }
  const uint32_t ifd = le32(d + 4);
  if ((size_t)ifd + 2 > len) {
    *err = "JPEG-XR: IFD outside the file";
    return false;
  }
  const int count = le16(d + ifd);
  if (count <= 0 || count > 256 || (size_t)ifd + 2 + 12 * count > len) {
    *err = "JPEG-XR: implausible IFD";
    return false;
  }
  uint64_t off = 0, cnt = 0;
  for (int i = 0; i < count; ++i) {
    const uint8_t* e = d + ifd + 2 + 12 * i;
    const uint16_t tag = le16(e);
    const uint32_t val = le32(e + 8);
    if (tag == 0xBCC0) off = val;
    if (tag == 0xBCC1) cnt = val;
  }
  if (off == 0 || cnt == 0 || off + cnt > len) {
    *err = "JPEG-XR: missing or out-of-range image stream";
    return false;
  }
  *cs_off = (size_t)off;
  *cs_len = (size_t)cnt;
  return true;
}

void push_le16(vector<uint8_t>* v, uint16_t x) {
  v->push_back((uint8_t)x);
  v->push_back((uint8_t)(x >> 8));
}
void push_le32(vector<uint8_t>* v, uint32_t x) {
  for (int i = 0; i < 4; ++i) v->push_back((uint8_t)(x >> (8 * i)));
}
void push_entry(vector<uint8_t>* v, uint16_t tag, uint16_t type, uint32_t cnt,
                uint32_t val) {
  push_le16(v, tag);
  push_le16(v, type);
  push_le32(v, cnt);
  push_le32(v, val);
}

void wrap_container(const vector<uint8_t>& cs, int w, int h, int guid_last,
                    vector<uint8_t>* out) {
  // layout: 8-byte header, IFD (count + 5 entries + next), GUID, codestream
  const uint32_t guid_off = 8 + 2 + 5 * 12 + 4;
  const uint32_t cs_off = guid_off + 16;
  out->clear();
  out->push_back('I');
  out->push_back('I');
  out->push_back(0xBC);
  out->push_back(0x01);
  push_le32(out, 8);
  push_le16(out, 5);
  push_entry(out, 0xBC01, 1, 16, guid_off);       // PIXEL_FORMAT GUID
  push_entry(out, 0xBC80, 4, 1, (uint32_t)w);     // IMAGE_WIDTH
  push_entry(out, 0xBC81, 4, 1, (uint32_t)h);     // IMAGE_HEIGHT
  push_entry(out, 0xBCC0, 4, 1, cs_off);          // IMAGE_OFFSET
  push_entry(out, 0xBCC1, 4, 1, (uint32_t)cs.size());  // IMAGE_BYTE_COUNT
  push_le32(out, 0);  // next IFD
  // WIC pixel-format GUID family 6FDDC324-4E03-4BFE-B185-3D77768DC9xx
  const uint8_t guid[16] = {0x24, 0xC3, 0xDD, 0x6F, 0x03, 0x4E, 0xFE, 0x4B,
                            0xB1, 0x85, 0x3D, 0x77, 0x76, 0x8D, 0xC9,
                            (uint8_t)guid_last};
  out->insert(out->end(), guid, guid + 16);
  out->insert(out->end(), cs.begin(), cs.end());
}

}  // namespace

// ===========================================================================
// Public API.
// ===========================================================================

bool decode(const uint8_t* data, size_t len, vector<uint8_t>* rgb, int* width,
            int* height, string* err) {
  if (len >= 8 && std::memcmp(data, kGdiSig, 8) == 0)
    return decode_core(data, len, rgb, width, height, err);
  size_t off = 0, cl = 0;
  if (!parse_container(data, len, &off, &cl, err)) return false;
  return decode_core(data + off, cl, rgb, width, height, err);
}

bool encode_rgb8(const uint8_t* rgb, int w, int h, const EncodeParams& p,
                 vector<uint8_t>* out, string* err) {
  if (p.internal_clr < 1 || p.internal_clr > 3) {
    *err = "JPEG-XR: RGB input needs internal YUV420/422/444";
    return false;
  }
  // center, scale, forward color transform at full resolution
  vector<InPlane> planes(3);
  planes[0].w = w;
  planes[0].h = h;
  planes[0].v.resize((size_t)w * h);
  vector<I32> fu((size_t)w * h), fv((size_t)w * h);
  for (size_t i = 0; i < (size_t)w * h; ++i) {
    I32 r = ((I32)rgb[3 * i] - 128) * 8;
    I32 g = ((I32)rgb[3 * i + 1] - 128) * 8;
    I32 b = ((I32)rgb[3 * i + 2] - 128) * 8;
    fwd_rgb2yuv(r, g, b);  // → (y, u, v)
    planes[0].v[i] = r;
    fu[i] = g;
    fv[i] = b;
  }
  const int ssx = (p.internal_clr <= 2) ? 2 : 1;
  const int ssy = (p.internal_clr == 1) ? 2 : 1;
  const int cw = (w + ssx - 1) / ssx, ch = (h + ssy - 1) / ssy;
  for (int c = 1; c < 3; ++c) {
    planes[c].w = cw;
    planes[c].h = ch;
    planes[c].v.resize((size_t)cw * ch);
  }
  for (int cy = 0; cy < ch; ++cy) {
    for (int cx = 0; cx < cw; ++cx) {
      int64_t su = 0, sv = 0, n = 0;
      for (int dy = 0; dy < ssy; ++dy) {
        for (int dx = 0; dx < ssx; ++dx) {
          const int x = cx * ssx + dx, y = cy * ssy + dy;
          if (x < w && y < h) {
            su += fu[(size_t)y * w + x];
            sv += fv[(size_t)y * w + x];
            ++n;
          }
        }
      }
      planes[1].v[(size_t)cy * cw + cx] = (I32)(su / n);
      planes[2].v[(size_t)cy * cw + cx] = (I32)(sv / n);
    }
  }
  vector<uint8_t> cs;
  if (!encode_core(planes, w, h, p.internal_clr, 6 /*RGB*/, 1 /*BD8*/, p, &cs,
                   err))
    return false;
  if (!p.container) {
    *out = std::move(cs);
    return true;
  }
  wrap_container(cs, w, h, 0x0D /*24bppRGB*/, out);
  return true;
}

bool encode_gray8(const uint8_t* g, int w, int h, const EncodeParams& p,
                  vector<uint8_t>* out, string* err) {
  vector<InPlane> planes(1);
  planes[0].w = w;
  planes[0].h = h;
  planes[0].v.resize((size_t)w * h);
  for (size_t i = 0; i < (size_t)w * h; ++i)
    planes[0].v[i] = ((I32)g[i] - 128) * 8;
  vector<uint8_t> cs;
  if (!encode_core(planes, w, h, 0 /*YONLY*/, 0 /*YONLY*/, 1 /*BD8*/, p, &cs,
                   err))
    return false;
  if (!p.container) {
    *out = std::move(cs);
    return true;
  }
  wrap_container(cs, w, h, 0x08 /*8bppGray*/, out);
  return true;
}

bool encode_gray16(const uint16_t* g, int w, int h, const EncodeParams& p,
                   vector<uint8_t>* out, string* err) {
  vector<InPlane> planes(1);
  planes[0].w = w;
  planes[0].h = h;
  planes[0].v.resize((size_t)w * h);
  for (size_t i = 0; i < (size_t)w * h; ++i)
    planes[0].v[i] = ((I32)g[i] - 32768) * 8;
  vector<uint8_t> cs;
  if (!encode_core(planes, w, h, 0 /*YONLY*/, 0 /*YONLY*/, 2 /*BD16*/, p, &cs,
                   err))
    return false;
  if (!p.container) {
    *out = std::move(cs);
    return true;
  }
  wrap_container(cs, w, h, 0x0B /*16bppGray*/, out);
  return true;
}

}  // namespace jxr

// ===========================================================================
// Self-test: exercises the invariants the codec's correctness rests on.
// Returns 0 on success, else the 1-based stage that failed.
// ===========================================================================

namespace jxr {
namespace {

struct Lcg {
  uint64_t s;
  explicit Lcg(uint64_t seed) : s(seed) {}
  uint32_t next() {
    s = s * 6364136223846793005ull + 1442695040888963407ull;
    return (uint32_t)(s >> 33);
  }
  I32 coef(int mag) { return (I32)(next() % (2 * mag + 1)) - mag; }
};

bool roundtrip_16(void (*f)(I32*), void (*g)(I32*), Lcg& rng, int n) {
  I32 a[16], b[16];
  for (int i = 0; i < n; ++i) a[i] = rng.coef(1 << 20);
  std::memcpy(b, a, sizeof(a));
  f(b);
  g(b);
  return std::memcmp(a, b, (size_t)n * sizeof(I32)) == 0;
}

bool psnr_ok(const vector<uint8_t>& a, const vector<uint8_t>& b,
             double max_mad) {
  if (a.size() != b.size() || a.empty()) return false;
  double mad = 0;
  for (size_t i = 0; i < a.size(); ++i)
    mad += std::abs((int)a[i] - (int)b[i]);
  return mad / (double)a.size() <= max_mad;
}

vector<uint8_t> smooth_rgb(int w, int h) {
  vector<uint8_t> img((size_t)w * h * 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const size_t o = ((size_t)y * w + x) * 3;
      img[o] = (uint8_t)((x * 255) / std::max(1, w - 1));
      img[o + 1] = (uint8_t)((y * 255) / std::max(1, h - 1));
      img[o + 2] = (uint8_t)(((x + y) * 255) / std::max(1, w + h - 2));
    }
  return img;
}

}  // anonymous namespace

int selftest() {
  Lcg rng(0x5EEDull);
  // 1: transform mirrors
  for (int it = 0; it < 200; ++it) {
    if (!roundtrip_16(fwd_pct4x4, inv_pct4x4, rng, 16)) return 1;
    if (!roundtrip_16(fwd_pct2x2, inv_pct2x2, rng, 4)) return 1;
    if (!roundtrip_16(fwd_pct2x4, inv_pct2x4, rng, 8)) return 1;
    if (!roundtrip_16(fwd_olp4x4, inv_olp4x4, rng, 16)) return 1;
  }
  // 2: whole-plane overlap stages mirror exactly
  for (int it = 0; it < 8; ++it) {
    const int w = 32, h = 48;
    vector<I32> p((size_t)w * h), q;
    for (auto& v : p) v = rng.coef(1 << 18);
    q = p;
    overlap_stage4(q, w, h, true);
    overlap_stage4(q, w, h, false);
    if (q != p) return 2;
    q = p;
    overlap_stage2(q, w / 4, h / 4, true);
    overlap_stage2(q, w / 4, h / 4, false);
    if (q != p) return 2;
  }
  // 3: color transform mirrors
  for (int it = 0; it < 10000; ++it) {
    I32 r = rng.coef(1 << 20), g = rng.coef(1 << 20), b = rng.coef(1 << 20);
    I32 y = r, u = g, v = b;
    fwd_rgb2yuv(y, u, v);
    inv_yuv2rgb(y, u, v);
    if (y != r || u != g || v != b) return 3;
  }
  // 4: lossless gray8 round trips (odd sizes, every overlap mode)
  for (int overlap = 0; overlap <= 2; ++overlap) {
    const int w = 37 + overlap, h = 23 + 2 * overlap;
    vector<uint8_t> g((size_t)w * h);
    for (auto& v : g) v = (uint8_t)rng.next();
    EncodeParams p;
    p.overlap = overlap;
    vector<uint8_t> enc, rgb;
    string err;
    int W = 0, H = 0;
    if (!encode_gray8(g.data(), w, h, p, &enc, &err)) return 4;
    if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 4;
    if (W != w || H != h) return 4;
    for (size_t i = 0; i < g.size(); ++i)
      if (rgb[3 * i] != g[i] || rgb[3 * i + 1] != g[i]) return 4;
  }
  // 5: lossless RGB/YUV444 round trip is bit-exact
  {
    const int w = 40, h = 24;
    vector<uint8_t> img((size_t)w * h * 3);
    for (auto& v : img) v = (uint8_t)rng.next();
    EncodeParams p;
    p.internal_clr = 3;
    vector<uint8_t> enc, rgb;
    string err;
    int W = 0, H = 0;
    if (!encode_rgb8(img.data(), w, h, p, &enc, &err)) return 5;
    if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 5;
    if (rgb != img) return 5;
  }
  // 6: subsampled internals reconstruct a smooth image closely
  for (int clr = 1; clr <= 2; ++clr) {
    const int w = 48, h = 32;
    vector<uint8_t> img = smooth_rgb(w, h);
    EncodeParams p;
    p.internal_clr = clr;
    vector<uint8_t> enc, rgb;
    string err;
    int W = 0, H = 0;
    if (!encode_rgb8(img.data(), w, h, p, &enc, &err)) return 6;
    if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 6;
    if (!psnr_ok(img, rgb, 6.0)) return 6;
  }
  // 7: reduced bands and trimmed flexbits still decode coherently
  {
    const int w = 32, h = 32;
    vector<uint8_t> img = smooth_rgb(w, h);
    for (int bands = 1; bands <= 3; ++bands) {
      EncodeParams p;
      p.bands = bands;
      vector<uint8_t> enc, rgb;
      string err;
      int W = 0, H = 0;
      if (!encode_rgb8(img.data(), w, h, p, &enc, &err)) return 7;
      if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 7;
      if (!psnr_ok(img, rgb, bands == 3 ? 64.0 : 24.0)) return 7;
    }
    EncodeParams p;
    p.trim_flexbits = 2;
    vector<uint8_t> enc, rgb;
    string err;
    int W = 0, H = 0;
    if (!encode_rgb8(img.data(), w, h, p, &enc, &err)) return 7;
    if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 7;
    if (!psnr_ok(img, rgb, 24.0)) return 7;
  }
  // 8: lossy quantization round trips within tolerance; gray16 high byte
  {
    const int w = 33, h = 31;
    vector<uint8_t> img = smooth_rgb(w, h);
    EncodeParams p;
    p.qp_dc = 20;
    p.qp_lp = 30;
    p.qp_hp = 40;
    vector<uint8_t> enc, rgb;
    string err;
    int W = 0, H = 0;
    if (!encode_rgb8(img.data(), w, h, p, &enc, &err)) return 8;
    if (!decode(enc.data(), enc.size(), &rgb, &W, &H, &err)) return 8;
    if (!psnr_ok(img, rgb, 16.0)) return 8;
    vector<uint16_t> g16((size_t)w * h);
    for (size_t i = 0; i < g16.size(); ++i)
      g16[i] = (uint16_t)(rng.next() & 0xFFFF);
    EncodeParams pl;  // lossless
    vector<uint8_t> enc16, rgb16;
    if (!encode_gray16(g16.data(), w, h, pl, &enc16, &err)) return 8;
    if (!decode(enc16.data(), enc16.size(), &rgb16, &W, &H, &err)) return 8;
    for (size_t i = 0; i < g16.size(); ++i)
      if (rgb16[3 * i] != (uint8_t)(g16[i] >> 8)) return 8;
  }
  return 0;
}

}  // namespace jxr
