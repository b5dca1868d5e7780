// jxr.h — JPEG XR (ITU-T T.832) codec used by the CZI backend (czi.cpp)
// and exposed to the test suite through the wsireader ctypes ABI.
//
// See jxr.cpp's header comment for the supported profile and the
// zero-egress validation caveat.

#pragma once

#include <cstddef>
#include <cstdint>
#include <string>
#include <vector>

namespace jxr {

// Decode a .jxr file (II-BC container) or a bare WMPHOTO codestream into
// packed RGB8 (gray sources replicated; 16-bit sources keep the high byte,
// matching the CZI Gray16 convention).  Returns false + *err on failure.
bool decode(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
            int* width, int* height, std::string* err);

struct EncodeParams {
  int internal_clr = 3;   // 0 YONLY, 1 YUV420, 2 YUV422, 3 YUV444
  int bands = 0;          // 0 ALL, 1 NOFLEXBITS, 2 NOHIGHPASS, 3 DCONLY
  int overlap = 1;        // 0, 1, 2
  int qp_dc = 0, qp_lp = 0, qp_hp = 0;  // 0 → lossless quantization
  int trim_flexbits = 0;  // 0..15
  bool container = true;  // emit the II-BC container around the codestream
};

bool encode_rgb8(const uint8_t* rgb, int w, int h, const EncodeParams& p,
                 std::vector<uint8_t>* out, std::string* err);
bool encode_gray8(const uint8_t* g, int w, int h, const EncodeParams& p,
                  std::vector<uint8_t>* out, std::string* err);
bool encode_gray16(const uint16_t* g, int w, int h, const EncodeParams& p,
                   std::vector<uint8_t>* out, std::string* err);

// Internal-invariant self-test (transform mirrors, entropy round-trips,
// full lossless encode→decode).  Returns 0 on success, a nonzero stage id
// on the first failure.  Driven by tests/test_jxr.py.
int selftest();

}  // namespace jxr
