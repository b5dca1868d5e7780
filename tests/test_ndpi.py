"""NDPI ≥4 GiB offset-reconstruction tests (native/ndpi.cpp).

The fixture (tests/ndpi_util.py) is a sparse classic TIFF whose directory
chain and strip data cross the 4 GiB boundary with wrapped 32-bit offsets
— the exact convention real >4 GiB Hamamatsu scanner files use (reference
reads them via OpenSlide, src/stamp/preprocessing/__init__.py:43-56).
"""

import numpy as np
import pytest

from ndpi_util import write_big_ndpi


@pytest.fixture(scope="module")
def big_ndpi(tmp_path_factory):
    from stamp_tpu.preprocessing.wsi import _load_native

    if _load_native() is None:
        pytest.skip("native reader not built")
    path = tmp_path_factory.mktemp("ndpi") / "big.ndpi"
    expected = write_big_ndpi(path)
    assert path.stat().st_size >= 2**32  # sparse, but legally >4 GiB
    return path, expected


def test_big_ndpi_routes_to_native_reader(big_ndpi):
    from stamp_tpu.preprocessing.wsi import CTiffSlide, open_slide

    path, expected = big_ndpi
    slide = open_slide(path)
    assert isinstance(slide, CTiffSlide)
    assert slide.dimensions == (expected.shape[1], expected.shape[0])
    # 10000 px/cm resolution → 1 µm/px
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(1.0)


def test_big_ndpi_level0_pixels_exact(big_ndpi):
    """Both fixup branches: the level-0 directory sits above 4 GiB (reached
    through a wrapped next-IFD pointer) and its strips' offsets are wrapped
    low bits.  Uncompressed strips must read back bit-exactly."""
    from stamp_tpu.preprocessing.wsi import open_slide

    path, expected = big_ndpi
    slide = open_slide(path)
    h, w = expected.shape[:2]
    full = np.asarray(slide.read_region((0, 0), 0, (w, h)).convert("RGB"))
    np.testing.assert_array_equal(full, expected)

    # a window crossing the two-strip boundary (rows_per_strip = h/2)
    sub = np.asarray(slide.read_region((10, 40), 0, (50, 20)).convert("RGB"))
    np.testing.assert_array_equal(sub, expected[40:60, 10:60])


def test_big_ndpi_jpeg_level_thumbnail(big_ndpi):
    """The smaller pyramid level is a JPEG strip in the first 4 GiB window;
    thumbnails decode it through the shared libjpeg path."""
    from stamp_tpu.preprocessing.wsi import open_slide

    path, _expected = big_ndpi
    slide = open_slide(path)
    thumb = np.asarray(slide.get_thumbnail((32, 24)).convert("RGB"))
    assert thumb.shape[2] == 3
    # solid (120, 130, 140) fill, JPEG-lossy
    assert np.all(np.abs(thumb.astype(int) - [120, 130, 140]) < 12)


# ---------------------------------------------------------------------------
# Levels beyond JPEG's 65535-px SOF limit (native/ndpihuge.cpp + jpegrt.cpp)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def huge_ndpi(tmp_path_factory):
    from stamp_tpu.preprocessing.wsi import _load_native

    if _load_native() is None:
        pytest.skip("native reader not built")
    from ndpi_huge_util import write_huge_ndpi

    path = tmp_path_factory.mktemp("ndpi_huge") / "huge.ndpi"
    expected = write_huge_ndpi(path)
    return path, expected


def test_huge_ndpi_opens_with_true_dimensions(huge_ndpi):
    """The SOF stores zeros; dimensions must come from the TIFF tags."""
    from stamp_tpu.preprocessing.wsi import CTiffSlide, open_slide

    path, expected = huge_ndpi
    slide = open_slide(path)
    assert isinstance(slide, CTiffSlide)
    assert slide.dimensions == (expected.shape[1], expected.shape[0])
    assert slide.dimensions[0] > 65535  # genuinely past the SOF limit
    # 20000 px/cm → 0.5 µm/px
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(0.5)


def test_huge_ndpi_restart_chunks_decode(huge_ndpi):
    """Chunk decodes must match the per-chunk stock-encoder round trip;
    windows are checked across chunk seams and at the far right edge,
    which only exists past x=65535."""
    from stamp_tpu.preprocessing.wsi import open_slide

    path, expected = huge_ndpi
    slide = open_slide(path)
    h, w = expected.shape[:2]
    for x, y, rw, rh in [
        (0, 0, 300, 20),          # crosses the x=256 chunk seam
        (65400, 4, 400, 16),      # straddles the 65535 boundary
        (w - 256, h - 8, 256, 8),  # last chunk exactly
        (w - 100, h - 5, 200, 10),  # past both edges → white fill
    ]:
        win = np.asarray(
            slide.read_region((x, y), 0, (rw, rh)).convert("RGB")
        ).astype(int)
        vis_w, vis_h = min(rw, w - x), min(rh, h - y)
        ref = expected[y : y + vis_h, x : x + vis_w].astype(int)
        assert np.abs(win[:vis_h, :vis_w] - ref).max() <= 3, (x, y)
        assert np.all(win[vis_h:] == 255) and np.all(win[:, vis_w:] == 255)


def test_huge_ndpi_subregion_consistency(huge_ndpi):
    """Two reads of overlapping windows agree bit-exactly (chunk indexing
    is deterministic through the LRU)."""
    from stamp_tpu.preprocessing.wsi import open_slide

    path, expected = huge_ndpi
    slide = open_slide(path)
    a = np.asarray(slide.read_region((1000, 0), 0, (600, 32)).convert("RGB"))
    b = np.asarray(slide.read_region((1200, 8), 0, (200, 16)).convert("RGB"))
    np.testing.assert_array_equal(a[8:24, 200:400], b)


def test_big_huge_ndpi_wrapped_offsets_plus_restart_chunks(tmp_path):
    """The real-world combination: a ≥4 GiB file (wrapped 32-bit offsets,
    native/ndpi.cpp) whose level 0 also exceeds the SOF dimension limit
    (restart-marker reconstruction).  The huge strip itself sits above the
    4 GiB boundary."""
    from stamp_tpu.preprocessing.wsi import _load_native, open_slide

    if _load_native() is None:
        pytest.skip("native reader not built")
    from ndpi_huge_util import write_big_huge_ndpi

    path = tmp_path / "bighuge.ndpi"
    expected = write_big_huge_ndpi(path)
    assert path.stat().st_size >= 2**32
    slide = open_slide(path)
    h, w = expected.shape[:2]
    assert slide.dimensions == (w, h)
    assert float(slide.properties["openslide.mpp-x"]) == pytest.approx(0.5)
    for x, y, rw, rh in [
        (0, 0, 512, 16),          # first chunks, full height
        (65280, 0, 768, 8),       # straddles the 65535 boundary
        (w - 256, h - 8, 256, 8),  # last chunk exactly
    ]:
        win = np.asarray(
            slide.read_region((x, y), 0, (rw, rh)).convert("RGB")
        ).astype(int)
        ref = expected[y : y + rh, x : x + rw].astype(int)
        assert np.abs(win - ref).max() <= 3, (x, y)
    # thumbnail comes from the ordinary sub-4GiB level
    thumb = np.asarray(slide.get_thumbnail((512, 16)).convert("RGB"))
    assert np.all(np.abs(thumb.astype(int) - [60, 170, 110]) < 12)


def test_huge_ndpi_truncated_stream_fails_loudly(tmp_path):
    """A stream cut mid-entropy yields fewer restart chunks than the MCU
    geometry demands; the scan must reject the level (read error), not
    return misindexed pixels."""
    from stamp_tpu.preprocessing.wsi import _load_native, open_slide

    if _load_native() is None:
        pytest.skip("native reader not built")
    from ndpi_huge_util import write_huge_ndpi

    path = tmp_path / "trunc.ndpi"
    write_huge_ndpi(path)
    data = bytearray(path.read_bytes())
    # zero a wide window in the middle of the huge stream's entropy bytes:
    # every restart marker inside it disappears, so the scan comes up short
    soi = bytes(data).find(b"\xff\xd8\xff")
    assert soi > 0
    mid = soi + (len(data) - soi) // 2
    data[mid : mid + 4096] = bytes(4096)
    path.write_bytes(bytes(data))

    slide = open_slide(path)
    with pytest.raises(RuntimeError):
        slide.read_region((0, 0), 0, (256, 8))


def test_huge_ndpi_thumbnail_uses_ordinary_level(huge_ndpi):
    from stamp_tpu.preprocessing.wsi import open_slide

    path, _ = huge_ndpi
    slide = open_slide(path)
    thumb = np.asarray(slide.get_thumbnail((512, 32)).convert("RGB"))
    # solid (90, 140, 190) thumbnail level, JPEG-lossy
    assert np.all(np.abs(thumb.astype(int) - [90, 140, 190]) < 12)
