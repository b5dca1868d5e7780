"""JPEG XR codec tests (native/jxr.cpp).

CZI subblocks are JPEG-XR-compressed by default in Zeiss ZEN; the
reference decodes them through OpenSlide+jxrlib (reference
src/stamp/preprocessing/__init__.py:43-56).  No third-party JPEG XR
implementation exists in this zero-egress image, so the executable
evidence is: the codec's own invariants (C++ selftest), Python-level
round trips across the supported profile, named errors on corrupt
payloads, and the ASan/UBSan fuzz pass (test_native_sanitize.py).
"""

import numpy as np
import pytest

from jxr_util import jxr_decode, jxr_decode_error, jxr_encode, load_jxr


@pytest.fixture(scope="module", autouse=True)
def lib():
    lib = load_jxr()
    if lib is None:
        pytest.skip("native reader not built")
    return lib


def _rng_rgb(w, h, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def test_cpp_selftest(lib):
    """Transform mirrors, entropy round trips, lossless encode→decode."""
    assert lib.wsi_jxr_selftest() == 0


@pytest.mark.parametrize("overlap", [0, 1, 2])
def test_lossless_rgb_roundtrip_bit_exact(overlap):
    img = _rng_rgb(53, 38, seed=overlap)  # non-multiple-of-16 dims
    enc = jxr_encode(img, internal_clr=3, overlap=overlap, qp=0)
    np.testing.assert_array_equal(jxr_decode(enc), img)


def test_lossless_gray_roundtrip_bit_exact():
    g = np.random.default_rng(1).integers(0, 256, (31, 47), np.uint8)
    out = jxr_decode(jxr_encode(g, qp=0))
    np.testing.assert_array_equal(out[:, :, 0], g)
    np.testing.assert_array_equal(out[:, :, 1], g)


def test_gray16_high_byte_convention():
    """16-bit sources keep the high byte — the CZI Gray16 convention."""
    g16 = np.random.default_rng(2).integers(0, 1 << 16, (24, 40), np.uint16)
    out = jxr_decode(jxr_encode(g16, qp=0))
    np.testing.assert_array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))


def _smooth(w, h):
    x = np.linspace(0, 255, w, dtype=np.uint8)
    y = np.linspace(0, 255, h, dtype=np.uint8)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = x
    img[:, :, 1] = y[:, None]
    img[:, :, 2] = ((x[None, :].astype(int) + y[:, None]) // 2).astype(np.uint8)
    return img


@pytest.mark.parametrize("clr", [1, 2])  # YUV420, YUV422
def test_subsampled_internals_close_on_smooth_content(clr):
    img = _smooth(64, 48)
    out = jxr_decode(jxr_encode(img, internal_clr=clr, qp=0))
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 6.0


def test_lossy_quantization_degrades_gracefully():
    img = _smooth(48, 48)
    sizes, mads = [], []
    for qp in (0, 16, 48):
        enc = jxr_encode(img, qp=qp)
        out = jxr_decode(enc)
        sizes.append(len(enc))
        mads.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
    assert sizes[0] > sizes[1] > sizes[2]  # rate drops with qp
    assert mads[0] == 0.0 and mads[2] < 24.0


def test_reduced_bands_decode():
    img = _smooth(32, 32)
    for bands, bound in [(1, 8.0), (2, 20.0), (3, 48.0)]:
        out = jxr_decode(jxr_encode(img, bands=bands, qp=0))
        assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < bound


def test_corrupt_payloads_fail_with_named_errors():
    img = _rng_rgb(32, 32)
    enc = bytearray(jxr_encode(img, qp=0))
    assert jxr_decode_error(bytes(64)) != ""  # not a container at all
    assert jxr_decode_error(bytes(enc[: len(enc) // 4])) != ""  # truncated IFD target
    # flip bytes across the payload: decode must either succeed or fail
    # with a named error — never crash (the sanitizer build re-checks this)
    rng = np.random.default_rng(3)
    for _ in range(32):
        mut = bytearray(enc)
        for _ in range(3):
            mut[int(rng.integers(0, len(mut)))] ^= int(rng.integers(1, 256))
        try:
            jxr_decode(bytes(mut))
        except ValueError as e:
            assert "JPEG-XR" in str(e) or "jxr" in str(e).lower() or str(e)


def test_trim_flexbits_roundtrip():
    img = _smooth(40, 24)
    out = jxr_decode(jxr_encode(img, qp=0, trim=3))
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 4.0
