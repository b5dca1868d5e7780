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
