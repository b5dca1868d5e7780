"""Zeiss CZI backend tests (native/czi.cpp).

Fixture: tests/czi_util.py writes a spec-conformant ZISRAW container
covering the full decode matrix (uncompressed / zstd0 / zstd1+hilo /
JPEG subblocks, Bgr24 + Gray16 pixel types, a 2× pyramid block, an
extra-channel block, optional JPEG-XR).  The reference opens .czi via
OpenSlide (reference src/stamp/preprocessing/__init__.py:43-56).
"""

import numpy as np
import pytest

from czi_util import BLOCK_H, BLOCK_W, write_czi


@pytest.fixture(scope="module")
def czi(tmp_path_factory):
    from stamp_tpu.preprocessing.wsi import _load_native

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path_factory.mktemp("czi") / "slide.czi"
    expected, mpp = write_czi(path)
    return path, expected, mpp


def test_czi_opens_with_dimensions_and_mpp(czi):
    from stamp_tpu.preprocessing.wsi import CTiffSlide, open_slide

    path, expected, mpp = czi
    slide = open_slide(path)
    assert isinstance(slide, CTiffSlide)
    assert slide.dimensions == (expected.shape[1], expected.shape[0])
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(mpp)


def test_czi_decode_matrix_pixels(czi):
    """Every compression/pixel-type combination must reproduce its tile:
    lossless paths exactly, the JPEG tile to encoder round-trip tolerance
    (already folded into `expected`), across seams and mosaic origin
    normalization (starts are negative in the fixture)."""
    from stamp_tpu.preprocessing.wsi import open_slide

    path, expected, _ = czi
    slide = open_slide(path)
    h, w = expected.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    np.testing.assert_array_equal(full, expected)

    # window straddling all four blocks
    win = np.asarray(
        slide.read_region(
            (BLOCK_W - 16, BLOCK_H - 8), 0, (32, 16)
        ).convert("RGB")
    )
    np.testing.assert_array_equal(
        win, expected[BLOCK_H - 8 : BLOCK_H + 8, BLOCK_W - 16 : BLOCK_W + 16]
    )

    # out-of-bounds → white fill
    edge = np.asarray(slide.read_region((w - 10, h - 5), 0, (20, 10)).convert("RGB"))
    np.testing.assert_array_equal(edge[:5, :10], expected[h - 5 :, w - 10 :])
    assert np.all(edge[5:] == 255) and np.all(edge[:, 10:] == 255)


def test_czi_pyramid_level(czi):
    from stamp_tpu.preprocessing.wsi import open_slide

    path, expected, _ = czi
    slide = open_slide(path)
    h, w = expected.shape[:2]
    assert int(slide._lib.wsi_level_count(slide._handle)) == 2
    assert int(slide._lib.wsi_level_width(slide._handle, 1)) == w // 2
    assert int(slide._lib.wsi_level_height(slide._handle, 1)) == h // 2
    thumb = np.asarray(slide.get_thumbnail((w // 2, h // 2)).convert("RGB"))
    # pyramid content is a bilinear downsample of level 0 (zstd0, lossless
    # container round trip) — thumbnail resampling adds a little smear
    ref = expected[::2, ::2]
    assert np.mean(np.abs(thumb.astype(int) - ref.astype(int))) < 16


def test_czi_corrupt_zstd_payload_is_resilient(tmp_path):
    """Flipping bytes inside a zstd frame must not abort the slide: the
    block renders as background, the error counter increments, every other
    block stays intact."""
    from stamp_tpu.preprocessing.wsi import _load_native, open_slide

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path / "corrupt.czi"
    expected, _ = write_czi(path)
    data = bytearray(path.read_bytes())
    # the zstd0 block is the second subblock segment; find its frame magic
    at = data.find(b"\x28\xb5\x2f\xfd")  # zstd frame magic
    assert at > 0
    data[at : at + 4] = b"\xde\xad\xbe\xef"  # kill the frame magic
    path.write_bytes(bytes(data))

    slide = open_slide(path)
    h, w = expected.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    # the uncompressed block (top-left) still decodes exactly
    np.testing.assert_array_equal(
        full[:BLOCK_H, :BLOCK_W], expected[:BLOCK_H, :BLOCK_W]
    )
    # the corrupted zstd0 block (top-right) is white background
    assert np.all(full[:BLOCK_H, BLOCK_W:] == 255)
    assert int(slide._lib.wsi_decode_errors(slide._handle)) >= 1


def test_czi_truncated_file_fails_with_named_error(tmp_path):
    from stamp_tpu.preprocessing.wsi import (
        UnsupportedFormatError,
        _load_native,
        open_slide,
    )

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path / "trunc.czi"
    write_czi(path)
    full = path.read_bytes()
    path.write_bytes(full[: len(full) // 3])  # cut before the directory
    with pytest.raises(UnsupportedFormatError, match="(?i)czi"):
        open_slide(path)


def test_czi_corrupt_jpegxr_block_renders_background_and_counts(tmp_path):
    from stamp_tpu.preprocessing.wsi import _load_native, open_slide

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path / "jxr.czi"
    expected, _ = write_czi(path, jpegxr_corrupt=True)
    slide = open_slide(path)
    h, w = expected.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    # blocks outside the JPEG-XR overlay must still be intact
    np.testing.assert_array_equal(
        full[:, BLOCK_W:], expected[:, BLOCK_W:]
    )
    np.testing.assert_array_equal(full[BLOCK_H:], expected[BLOCK_H:])
    assert int(slide._lib.wsi_decode_errors(slide._handle)) >= 1


def test_czi_jpegxr_block_decodes_exactly(tmp_path):
    """A real JPEG-XR subblock (in-repo T.832 codec, lossless YUV444)
    decodes bit-exactly through the CZI render path."""
    from stamp_tpu.preprocessing.wsi import _load_native, open_slide

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path / "jxr_real.czi"
    expected, _ = write_czi(path, with_jpegxr=True)
    slide = open_slide(path)
    h, w = expected.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    np.testing.assert_array_equal(full, expected)
    assert int(slide._lib.wsi_decode_errors(slide._handle)) == 0
